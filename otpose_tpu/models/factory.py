"""Model/dataset factories over populated registries.

The reference declares detectron2-style registries but never populates them
(ref: utils/registry.py:9-74, SURVEY.md §2.3); here they are wired up so
``build_model(cfg)`` / ``build_dataset(cfg, phase)`` dispatch on
``cfg.MODEL.NAME`` / ``cfg.DATASET.NAME``.
"""

from __future__ import annotations

import jax

from otpose_tpu.utils.io import DATASET_REGISTRY, MODEL_REGISTRY


@MODEL_REGISTRY.register(name="OTPose")
def _build_otpose(cfg, seed: int = 0):
    from otpose_tpu.models.otpose import OTPoseSpec, init_otpose

    spec = OTPoseSpec.from_cfg(cfg)
    params, state = init_otpose(jax.random.PRNGKey(seed), spec)
    return spec, params, state


@MODEL_REGISTRY.register(name="pose_hrnet")
def _build_hrnet(cfg, seed: int = 0):
    from otpose_tpu.models.hrnet import HRNetSpec, init_hrnet

    spec = HRNetSpec.from_cfg(cfg)
    params, state = init_hrnet(jax.random.PRNGKey(seed), spec)
    return spec, params, state


@DATASET_REGISTRY.register(name="PoseTrack")
def _build_posetrack(cfg, phase: str):
    from otpose_tpu.data.posetrack import PoseTrackDataset

    return PoseTrackDataset(cfg, phase)


def build_model(cfg, seed: int = 0):
    return MODEL_REGISTRY.get(cfg.MODEL.NAME)(cfg, seed)


def build_dataset(cfg, phase: str):
    return DATASET_REGISTRY.get(cfg.DATASET.NAME)(cfg, phase)
