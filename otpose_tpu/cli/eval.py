"""Evaluation entry point.

ref: eval.py:19-121.  ``python eval.py --cfg <yaml> [--val|--test]`` — builds
the val/test dataset, resolves the checkpoint list (explicit MODEL_FILE, a
specific checkpoint id, or latest), and runs the poseval evaluation for each.
"""

from __future__ import annotations

import logging
import os.path as osp

import jax
import jax.numpy as jnp

from otpose_tpu.config import default_parse_args
from otpose_tpu.data import make_loader
from otpose_tpu.data.posetrack import PoseTrackDataset
from otpose_tpu.engine import checkpoints as ckpt
from otpose_tpu.engine.base import RunBase
from otpose_tpu.engine.runner import (evaluate_epoch, evaluate_epoch_decoded,
                                      make_flip_eval_step)
from otpose_tpu.engine.trainer import make_decoded_eval_step, make_eval_step
from otpose_tpu.models.otpose import (OTPoseSpec, init_otpose,
                                      prepare_eval_params)
from otpose_tpu.parallel import distributed
from otpose_tpu.parallel.mesh import make_mesh, make_eval_shard_fn, replicate

logger = logging.getLogger(__name__)


class Eval(RunBase):
    def __init__(self, phase: str = "validate", args=None):
        # multi-host: connect before the first backend use (see cli/train.py)
        distributed.maybe_initialize()
        super().__init__(phase, args=args)
        cfg = self.cfg
        distributed.maybe_initialize(cfg)
        self.dataset = PoseTrackDataset(cfg, phase)
        sub = cfg.VAL if phase == "validate" else cfg.TEST
        self.batch = sub.BATCH_SIZE_PER_GPU * len(jax.devices())
        self.loader = make_loader(cfg, self.dataset, self.batch, shuffle=False)
        self.spec = OTPoseSpec.from_cfg(cfg)
        self.model_file = sub.MODEL_FILE
        self.flip = sub.FLIP_VAL if phase == "validate" else sub.FLIP_TEST

        self.mesh = make_mesh(cfg)
        self.seq_axis = "seq" if "seq" in cfg.TPU.MESH_AXES else None
        self._mesh_ctx = jax.sharding.set_mesh(self.mesh)
        self._mesh_ctx.__enter__()
        self.shard_fn = make_eval_shard_fn(self.mesh)

        compute_dtype = jnp.bfloat16 \
            if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        # debug visualization needs heatmaps on host; otherwise decode
        # on device and fetch only keypoints
        self.use_decoded = not (cfg.DEBUG.VIS_SKELETON or cfg.DEBUG.VIS_BBOX)
        if self.use_decoded:
            self.eval_fn = make_decoded_eval_step(
                self.spec, compute_dtype=compute_dtype, flip=self.flip,
                seq_axis=self.seq_axis, mesh=self.mesh)
        elif self.flip:
            self.eval_fn = make_flip_eval_step(self.spec,
                                               compute_dtype=compute_dtype,
                                               seq_axis=self.seq_axis)
        else:
            self.eval_fn = make_eval_step(self.spec, compute_dtype=compute_dtype,
                                          seq_axis=self.seq_axis)

    def list_model_files(self):
        """ref: eval.py:64-83."""
        if self.model_file:
            return [ckpt.resolve_model_file(self.model_file, self.cfg,
                                            self.checkpoints_save_folder)]
        val_from = int(getattr(self.args, "val_from_checkpoint", -1))
        folder = self.checkpoints_save_folder
        if val_from >= 0:
            all_ckpts = ckpt.get_all_checkpoints(folder)
            return [c for c in all_ckpts
                    if ckpt._parse_epoch(osp.basename(c)) >= val_from]
        latest = ckpt.get_latest_checkpoint(folder)
        if latest is None:
            best = ckpt.get_best_checkpoint(folder)
            return [best] if best else []
        return [latest]

    def eval(self):
        results = []
        model_files = self.list_model_files()
        if not model_files:
            raise FileNotFoundError(
                f"no checkpoint found in {self.checkpoints_save_folder} and no "
                f"MODEL_FILE configured")
        for model_file in model_files:
            logger.info("=> evaluating %s", model_file)
            params, model_state = self._load(model_file)
            eval_epoch = evaluate_epoch_decoded if self.use_decoded \
                else evaluate_epoch
            name_values, mean_ap = eval_epoch(
                self.eval_fn, params, model_state, self.loader, self.dataset,
                self.cfg, self.cfg.OUTPUT_DIR, phase=self.phase,
                shard_fn=self.shard_fn)
            results.append((model_file, name_values, mean_ap))
        return results

    def _load(self, model_file: str):
        """Load any checkpoint form (orbax dir / torch .pth)
        (ref: eval.py:97-116)."""
        init_params, init_state = init_otpose(jax.random.PRNGKey(0), self.spec)
        blob = ckpt.restore_checkpoint(model_file)
        if self.pe_name == "MSRA":
            # MSRA checkpoints store the pose net under a
            # 'rough_pose_estimation_net.' prefix (ref: eval.py:109-111)
            strip = "rough_pose_estimation_net."
            for part in ("params", "model_state"):
                blob[part] = {
                    (k[len(strip):] if k.startswith(strip) else k): v
                    for k, v in blob.get(part, {}).items()}
        params, model_state, n = ckpt.merge_checkpoint(blob, init_params,
                                                       init_state)
        logger.info("=> loaded %d/%d tensors", n, len(params))
        if n == 0:
            # the reference's load_state_dict is strict; evaluating a
            # random-init model would silently report garbage mAP
            raise ValueError(
                f"checkpoint {model_file} matched 0 of {len(params)} tensors "
                f"(wrong architecture/width for this config?)")
        # eval fast path (once per checkpoint, outside the step): optional
        # bf16 conv/dense weights — halves param HBM reads; norm statistics
        # still run in f32 inside the kernels (models/otpose.py)
        params = prepare_eval_params(
            params,
            param_dtype=jnp.bfloat16
            if self.cfg.TPU.PARAM_DTYPE == "bfloat16" else None)
        params = replicate(self.mesh, params)
        model_state = replicate(self.mesh, model_state)
        return params, model_state


def main(argv=None):
    args = default_parse_args(argv)
    phase = "test" if getattr(args, "test", False) else "validate"
    Eval(phase, args).eval()


if __name__ == "__main__":
    main()
