"""Single-clip inference API.

ref: utils/inference.py:58-110 (``inference_PE``) — the reference file is
broken as-written (imports a nonexistent module, ref: inference.py:5) but
documents the intended serving surface: (5 image paths, bbox) -> 17 keypoints.
This is the fixed, working TPU equivalent.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from otpose_tpu.data.posetrack import IMAGENET_MEAN, IMAGENET_STD
from otpose_tpu.models.core import Ctx
from otpose_tpu.models.otpose import OTPoseSpec, otpose_forward
from otpose_tpu.ops.affine import get_affine_transform, invert_affine, warp_affine
from otpose_tpu.ops.bbox import box2cs
from otpose_tpu.ops.heatmap import get_final_preds


class PoseEstimator:
    """Serving wrapper: load once, call per clip (batched under the hood)."""

    def __init__(self, cfg, params, model_state, compute_dtype=jnp.bfloat16):
        self.cfg = cfg
        self.spec = OTPoseSpec.from_cfg(cfg)
        self.params = params
        self.model_state = model_state
        self.image_size = np.array(cfg.MODEL.IMAGE_SIZE)  # (w, h)
        self.aspect_ratio = self.image_size[0] / self.image_size[1]

        spec = self.spec

        @jax.jit
        def _forward(params, model_state, x, margin):
            ctx = Ctx(params, model_state, train=False,
                      compute_dtype=compute_dtype)
            return otpose_forward(ctx, x, margin, spec)[0]

        self._forward = _forward

    def preprocess(self, images: Sequence[np.ndarray], bbox) -> tuple:
        """5 frames (in the checkpoint's training channel order, see
        DATASET.COLOR_RGB) + xywh bbox -> (1, H, W, 15) tensor + center/scale
        (ref: utils/inference.py:58-82, warp on device)."""
        center, scale = box2cs(bbox, self.aspect_ratio)
        trans = get_affine_transform(center, scale, 0, self.image_size)
        inv = invert_affine(trans)
        stack = np.stack([im.astype(np.float32) for im in images])  # (5, H, W, 3)
        crops = warp_affine(jnp.asarray(stack),
                            jnp.asarray(np.repeat(inv[None], 5, 0)),
                            int(self.image_size[1]), int(self.image_size[0]))
        crops = (crops / 255.0 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        x = jnp.transpose(crops, (1, 2, 0, 3)).reshape(
            1, int(self.image_size[1]), int(self.image_size[0]), 15)
        return x, center, scale

    def __call__(self, image_paths: Sequence[str], bbox,
                 margin=(1, 1, 2, 2)) -> np.ndarray:
        """(5 image paths ordered cur/prev/next/pprev/nnext, xywh box) ->
        (17, 3) keypoints in original image coords (ref: inference.py:84-110)."""
        import cv2

        images = []
        for p in image_paths:
            im = cv2.imread(p)
            if im is None:
                raise ValueError(f"Fail to read {p}")
            # channel order must match what the checkpoint was TRAINED on:
            # the data pipeline gates the identical conversion on
            # DATASET.COLOR_RGB (data/posetrack.py), and its default is
            # False (BGR crops) — an unconditional swap here would silently
            # degrade keypoints for BGR-trained checkpoints
            if self.cfg.DATASET.COLOR_RGB:
                im = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
            images.append(im)
        return self.infer_images(images, bbox, margin)

    def infer_images(self, images: Sequence[np.ndarray], bbox,
                     margin=(1, 1, 2, 2)) -> np.ndarray:
        x, center, scale = self.preprocess(images, bbox)
        m = jnp.asarray([list(margin)], jnp.float32)
        heat = self._forward(self.params, self.model_state, x, m)
        preds, maxvals = get_final_preds(
            np.asarray(heat).transpose(0, 3, 1, 2), center[None], scale[None])
        return np.concatenate([preds[0], maxvals[0]], axis=1)  # (17, 3)


def inference_PE(model: PoseEstimator, image_path: str, prev_image_path: str,
                 next_image_path: str, pprev_image_path: str,
                 nnext_image_path: str, bbox) -> np.ndarray:
    """Functional form matching the reference name (ref: inference.py:84)."""
    return model([image_path, prev_image_path, next_image_path,
                  pprev_image_path, nnext_image_path], bbox)
