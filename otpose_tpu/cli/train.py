"""Training entry point.

ref: train.py:20-124.  ``python train.py --cfg <yaml> [opts...]`` — builds the
dataset/loader, initializes or resumes the model (including torch-pretrained
HRNet import), runs per-epoch training with sigma annealing, saves epoch
checkpoints, validates every epoch and keeps the best-mAP checkpoint.
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
from otpose_tpu.engine.optim import make_optimizer, make_schedule
from otpose_tpu.engine.preempt import make_preemption_guard
from otpose_tpu.engine.runner import evaluate_epoch_decoded, train_epoch
from otpose_tpu.engine.trainer import (init_train_state, make_decoded_eval_step,
                                       make_train_step)
from otpose_tpu.models.otpose import OTPoseSpec, init_otpose
from otpose_tpu.models.torch2jax import filter_pretrained_for_otpose
from otpose_tpu.ops.heatmap import adjust_sigma
from otpose_tpu.parallel import distributed
from otpose_tpu.parallel.mesh import (make_eval_shard_fn, make_mesh, replicate,
                                      shard_batch)

logger = logging.getLogger(__name__)


class Train(RunBase):
    def __init__(self, args=None):
        # multi-host: connect to the job BEFORE the first backend use so
        # jax.devices() is the global device set (parallel/distributed.py)
        distributed.maybe_initialize()
        super().__init__("train", args=args)
        cfg = self.cfg
        distributed.maybe_initialize(cfg)  # cfg.TPU.MULTIHOST pod auto-detect
        seed = cfg.SEED
        self.rng = jax.random.PRNGKey(seed)

        self.train_dataset = PoseTrackDataset(cfg, "train")
        n_dev = len(jax.devices())
        self.batch_size = cfg.TRAIN.BATCH_SIZE_PER_GPU * n_dev
        self.loader = make_loader(cfg, self.train_dataset, self.batch_size,
                                  shuffle=cfg.TRAIN.SHUFFLE, drop_last=True,
                                  seed=seed, process_shard=True)

        self.spec = OTPoseSpec.from_cfg(cfg)
        params, model_state = init_otpose(jax.random.PRNGKey(seed), self.spec)
        params, model_state = self._load_pretrained(params, model_state)

        iters_per_epoch = max(1, len(self.loader))
        self.schedule = make_schedule(cfg, iters_per_epoch)
        self.optimizer = make_optimizer(params, cfg, self.schedule)

        self.mesh = make_mesh(cfg)
        # optional sequence parallelism: a 'seq' mesh axis shards the
        # conv-transformer token dim (models/conv_transformer.py::_seq_shard)
        self.seq_axis = "seq" if "seq" in cfg.TPU.MESH_AXES else None
        self._mesh_ctx = jax.sharding.set_mesh(self.mesh)
        self._mesh_ctx.__enter__()
        params = replicate(self.mesh, params)
        model_state = replicate(self.mesh, model_state)
        self.train_state = init_train_state(params, model_state, self.optimizer)

        compute_dtype = jnp.bfloat16 \
            if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        self.step_fn = make_train_step(self.spec, self.optimizer,
                                       compute_dtype=compute_dtype,
                                       topk=cfg.LOSS.TOPK,
                                       use_target_weight=cfg.LOSS.USE_TARGET_WEIGHT,
                                       donate=cfg.TPU.DONATE_STATE,
                                       remat=cfg.TPU.REMAT,
                                       seq_axis=self.seq_axis,
                                       accum_steps=cfg.TPU.ACCUM_STEPS)
        # per-epoch validation decodes keypoints on device (fetches 17 coords
        # per box, not full heatmaps) — equivalence-tested vs evaluate_epoch
        self.eval_fn = make_decoded_eval_step(self.spec,
                                              compute_dtype=compute_dtype,
                                              seq_axis=self.seq_axis,
                                              mesh=self.mesh)

        self.tb_writer = None
        if distributed.is_primary():
            try:
                from tensorboardX import SummaryWriter

                self.tb_writer = SummaryWriter(self.tb_save_folder)
            except Exception:  # pragma: no cover
                logger.warning("tensorboardX unavailable; skipping TB logging")

    def _load_pretrained(self, params, model_state):
        """Pretrained COCO-HRNet partial load (ref: model/OTPose.py:477-499)."""
        path = self.cfg.MODEL.PRETRAINED
        if path and osp.isfile(path):
            blob = ckpt.restore_checkpoint(path)
            loaded = filter_pretrained_for_otpose(
                blob["params"],
                tuple(self.cfg.MODEL.EXTRA.get("PRETRAINED_LAYERS", ("*",))))
            n = 0
            for k, v in loaded.items():
                if k in params and params[k].shape == v.shape:
                    params[k] = jnp.asarray(v)
                    n += 1
            for k, v in blob.get("model_state", {}).items():
                for cand in (k, f"rough_pose_estimation_net.{k}"):
                    if cand in model_state and model_state[cand].shape == v.shape:
                        model_state[cand] = jnp.asarray(v)
                        break
            logger.info("=> loaded %d pretrained tensors from %s", n, path)
        elif path:
            logger.warning("pretrained model %s not found", path)
        return params, model_state

    def train(self):
        cfg = self.cfg
        self.train_state, begin_epoch, tb_steps, start_it = ckpt.resume(
            self.checkpoints_save_folder, self.train_state)
        if begin_epoch or start_it:
            logger.info("=> resumed from epoch %d (iteration %d)",
                        begin_epoch, start_it)

        # graceful preemption: first SIGTERM checkpoints the exact iteration
        # at the next step boundary and exits 0; multi-process jobs agree on
        # a common stop iteration first (engine/preempt.py)
        guard = make_preemption_guard(start_step=tb_steps)
        sigma_schedule = list(getattr(self.args, "sigma_schedule", []) or [])
        best_map = -1.0
        for epoch in range(begin_epoch, cfg.TRAIN.END_EPOCH):
            if sigma_schedule:
                self.train_dataset.sigma = adjust_sigma(
                    epoch, cfg.MODEL.SIGMA, sigma_schedule)
            self.loader.set_epoch(epoch)
            self.train_state, tb_steps, done_it = train_epoch(
                self.step_fn, self.train_state, self.loader, epoch, cfg,
                rng=jax.random.fold_in(self.rng, epoch),
                tb_writer=self.tb_writer, global_steps=tb_steps,
                shard_fn=lambda b: shard_batch(self.mesh, b),
                start_iteration=start_it if epoch == begin_epoch else 0,
                should_stop=guard.check)
            if guard.requested:
                # iteration=0 when the epoch happened to finish: resume
                # continues at epoch+1 (engine/checkpoints.py semantics)
                it_arg = 0 if done_it >= len(self.loader) else done_it
                ckpt.save_checkpoint(self.checkpoints_save_folder, epoch,
                                     self.train_state,
                                     tensorboard_global_steps=tb_steps,
                                     iteration=it_arg)
                logger.info("=> preempted: checkpointed epoch %d at "
                            "iteration %d/%d; exiting cleanly",
                            epoch, done_it, len(self.loader))
                return self.train_state
            if epoch % cfg.TRAIN.SAVE_MODEL_PER_EPOCH == 0:
                # async: serialization overlaps the validation pass below
                # (single-process only — multihost saves are a collective)
                ckpt.save_checkpoint(self.checkpoints_save_folder, epoch,
                                     self.train_state,
                                     tensorboard_global_steps=tb_steps,
                                     async_save=bool(
                                         cfg.TPU.ASYNC_CHECKPOINT
                                         and jax.process_count() == 1))
            mean_ap = self._validate(tb_steps)
            if mean_ap is not None and mean_ap > best_map:
                best_map = mean_ap
                ckpt.save_best_checkpoint(self.checkpoints_save_folder,
                                          self.train_state, float(mean_ap))
        ckpt.wait_for_saves()
        return self.train_state

    def _validate(self, tb_steps: int):
        cfg = self.cfg
        if not hasattr(self, "_val_dataset"):
            # (the reference rebuilds its whole Eval object every epoch,
            # ref: train.py:92-93; we build the dataset/loader once)
            try:
                self._val_dataset = PoseTrackDataset(cfg, "validate")
            except FileNotFoundError as e:
                # only "val annotations not present" disables validation;
                # any other error (typo'd paths, malformed json) must fail
                # loudly — otherwise best-ckpt selection silently vanishes
                logger.warning("validation dataset unavailable (%s); "
                               "skipping per-epoch validation", e)
                self._val_dataset = None
            self._val_loader = None if self._val_dataset is None else \
                make_loader(cfg, self._val_dataset,
                            cfg.VAL.BATCH_SIZE_PER_GPU * len(jax.devices()),
                            shuffle=False)
        if self._val_dataset is None:
            return None
        _, mean_ap = evaluate_epoch_decoded(
            self.eval_fn, self.train_state.params, self.train_state.model_state,
            self._val_loader, self._val_dataset, cfg, cfg.OUTPUT_DIR,
            phase="validate", tb_writer=self.tb_writer, global_steps=tb_steps,
            shard_fn=make_eval_shard_fn(self.mesh))
        return mean_ap


def main(argv=None):
    args = default_parse_args(argv)
    Train(args).train()


if __name__ == "__main__":
    main()
