"""Data pipeline package.

``make_loader`` is the production entry point: it selects the
device-preprocessing ``DeviceLoader`` (host decodes JPEGs, TPU does the
5-frame warp/normalize/target generation in one jit program) or the host-path
``Loader`` (the reference's per-box CPU pipeline, ref:
PoseTrackDataset.py:388-425) based on ``cfg.TPU.DEVICE_PREPROCESS``.
"""

from __future__ import annotations


def resolve_device_preprocess(cfg) -> str:
    """Resolve cfg.TPU.DEVICE_PREPROCESS to "off" | "crops" | "full".

    "auto" selects the crops mode whenever the default jax backend is an
    accelerator (TPU/GPU) — crops minimize host->device bytes, the usual
    constraint — and the host path on CPU (no compute to hide the staging
    copy behind; the host path is also the parity oracle).  "on" is accepted
    as an alias for "crops".
    """
    mode = str(cfg.TPU.DEVICE_PREPROCESS).lower()
    if mode in ("on", "true", "1", "crops"):
        return "crops"
    if mode == "full":
        return "full"
    if mode in ("off", "false", "0"):
        return "off"
    if mode != "auto":
        raise ValueError(f"TPU.DEVICE_PREPROCESS must be auto/off/crops/full,"
                         f" got {cfg.TPU.DEVICE_PREPROCESS!r}")
    import jax

    return "crops" if jax.default_backend() != "cpu" else "off"


def device_preprocess_enabled(cfg) -> bool:
    return resolve_device_preprocess(cfg) != "off"


def make_loader(cfg, dataset, batch_size: int, *, shuffle: bool,
                drop_last: bool = False, seed: int | None = None,
                process_shard: bool = False):
    """Build the configured loader (device-preprocessing or host path).

    ``process_shard=True`` (multi-host training): ``batch_size`` is the
    GLOBAL batch and this process loads only its contiguous row block of
    every batch; the global array is assembled by ``parallel.mesh
    .shard_batch``.  Eval loaders keep full batches on every host (the eval
    shard_fn slices instead) so host-side bookkeeping sees every row.
    """
    from otpose_tpu.data.loader import Loader

    kwargs = dict(shuffle=shuffle, num_workers=cfg.WORKERS,
                  seed=cfg.SEED if seed is None else seed,
                  drop_last=drop_last, prefetch=cfg.TPU.PREFETCH_DEPTH)
    if process_shard:
        from otpose_tpu.parallel.distributed import process_info

        pid, count = process_info()
        if count > 1:
            kwargs.update(process_index=pid, process_count=count)
    mode = resolve_device_preprocess(cfg)
    if mode != "off":
        from otpose_tpu.data.device_loader import DeviceLoader

        return DeviceLoader(dataset, batch_size, mode=mode,
                            max_frame_hw=tuple(cfg.TPU.MAX_FRAME_HW),
                            device_prefetch=cfg.TPU.PREFETCH_DEPTH, **kwargs)
    return Loader(dataset, batch_size, **kwargs)
