"""CLI: export a trained checkpoint to a self-contained serving artifact.

``python export.py --cfg configs/17/model_RSN.yaml [--batch 16] [--out DIR]
[opts ...]`` loads the checkpoint the same way ``eval.py`` does
(``TEST.MODEL_FILE`` / ``VAL.MODEL_FILE`` or the latest in the experiment's
checkpoint folder), bakes the weights into the jitted eval computation and
serializes it with ``jax.export`` (see engine/export.py).  Serving then
only needs jax: ``load_exported(DIR)(inputs, margin)``.

No reference counterpart (the reference ships model code + .pth; its
intended single-clip API, utils/inference.py:84-110, is covered by
cli/inference.py — this is the batch-serving artifact path).
"""

from __future__ import annotations

import logging
import os.path as osp

import jax
import jax.numpy as jnp

from otpose_tpu.config import default_parse_args
from otpose_tpu.engine import checkpoints as ckpt
from otpose_tpu.engine.base import RunBase
from otpose_tpu.engine.export import export_eval, save_exported
from otpose_tpu.models.otpose import OTPoseSpec, init_otpose

logger = logging.getLogger(__name__)


class Export(RunBase):
    def __init__(self, args):
        super().__init__("export", args=args)
        cfg = self.cfg
        self.spec = OTPoseSpec.from_cfg(cfg)
        sub = cfg.TEST if getattr(args, "test", False) else cfg.VAL
        self.model_file = sub.MODEL_FILE
        self.flip = sub.FLIP_TEST if getattr(args, "test", False) \
            else sub.FLIP_VAL

    def model_path(self) -> str:
        if self.model_file:
            return ckpt.resolve_model_file(self.model_file, self.cfg,
                                           self.checkpoints_save_folder)
        latest = ckpt.get_latest_checkpoint(self.checkpoints_save_folder)
        if latest is None:
            latest = ckpt.get_best_checkpoint(self.checkpoints_save_folder)
        if latest is None:
            raise FileNotFoundError(
                f"no checkpoint in {self.checkpoints_save_folder} and no "
                f"MODEL_FILE configured")
        return latest

    def export(self, batch_size: int, out_dir: str | None = None,
               weights: str = "baked") -> str:
        model_file = self.model_path()
        logger.info("=> exporting %s (batch %d)", model_file, batch_size)
        init_params, init_state = init_otpose(jax.random.PRNGKey(0), self.spec)
        blob = ckpt.restore_checkpoint(model_file)
        params, model_state, n = ckpt.merge_checkpoint(blob, init_params,
                                                       init_state)
        logger.info("=> loaded %d/%d tensors", n, len(params))
        if n == 0:
            # an artifact bakes these weights in permanently — refuse to
            # ship a random-init model because the cfg/checkpoint mismatch
            raise ValueError(
                f"checkpoint {model_file} matched 0/{len(params)} tensors "
                f"of the configured model — wrong --cfg for this checkpoint?")

        if weights not in ("baked", "external"):
            raise ValueError(f"--weights must be baked/external, got {weights!r}")
        compute_dtype = jnp.bfloat16 \
            if self.cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        bf16_params = self.cfg.TPU.PARAM_DTYPE == "bfloat16"
        data = export_eval(self.spec, params, model_state,
                           batch_size=batch_size, compute_dtype=compute_dtype,
                           flip=bool(self.flip), decoded=True,
                           bf16_params=bf16_params,
                           bake_weights=(weights == "baked"))
        out = out_dir or osp.join(self.cfg.OUTPUT_DIR, "export")
        save_exported(out, data, self.spec, batch_size=batch_size,
                      compute_dtype=compute_dtype, flip=bool(self.flip),
                      decoded=True)
        logger.info("=> wrote serving artifact to %s (%d module bytes, "
                    "%s weights)", out, len(data), weights)
        return out


def main(argv=None):
    import argparse
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--batch", type=int, default=16)
    extra.add_argument("--out", type=str, default=None)
    extra.add_argument("--weights", choices=("baked", "external"),
                       default="baked",
                       help="baked: weights as StableHLO constants (one "
                            "self-contained file); external: code-only "
                            "module + weights.npz sidecar (small modules, "
                            "shared across checkpoints)")
    ns, rest = extra.parse_known_args(argv)
    args = default_parse_args(rest)
    Export(args).export(ns.batch, ns.out, weights=ns.weights)


if __name__ == "__main__":
    main()
