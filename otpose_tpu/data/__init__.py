"""Data pipeline package.

``make_loader`` is the production entry point: it selects the
device-preprocessing ``DeviceLoader`` (host decodes JPEGs, TPU does the
5-frame warp/normalize/target generation in one jit program) or the host-path
``Loader`` (the reference's per-box CPU pipeline, ref:
PoseTrackDataset.py:388-425) based on ``cfg.TPU.DEVICE_PREPROCESS``.
"""

from __future__ import annotations


def device_preprocess_enabled(cfg) -> bool:
    """Resolve cfg.TPU.DEVICE_PREPROCESS: "auto" | "on" | "off".

    "auto" turns device preprocessing on whenever the default jax backend is
    an accelerator (TPU/GPU) — on CPU the extra staging copy has no compute
    to hide behind, and the host path is the parity oracle anyway.
    """
    mode = str(cfg.TPU.DEVICE_PREPROCESS).lower()
    if mode in ("on", "true", "1"):
        return True
    if mode in ("off", "false", "0"):
        return False
    if mode != "auto":
        raise ValueError(f"TPU.DEVICE_PREPROCESS must be auto/on/off, "
                         f"got {cfg.TPU.DEVICE_PREPROCESS!r}")
    import jax

    return jax.default_backend() != "cpu"


def make_loader(cfg, dataset, batch_size: int, *, shuffle: bool,
                drop_last: bool = False, seed: int | None = None):
    """Build the configured loader (device-preprocessing or host path)."""
    from otpose_tpu.data.loader import Loader

    kwargs = dict(shuffle=shuffle, num_workers=cfg.WORKERS,
                  seed=cfg.SEED if seed is None else seed,
                  drop_last=drop_last, prefetch=cfg.TPU.PREFETCH_DEPTH)
    if device_preprocess_enabled(cfg):
        from otpose_tpu.data.device_loader import DeviceLoader

        return DeviceLoader(dataset, batch_size,
                            max_frame_hw=tuple(cfg.TPU.MAX_FRAME_HW), **kwargs)
    return Loader(dataset, batch_size, **kwargs)
