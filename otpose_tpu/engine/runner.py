"""Training / evaluation engine loops.

ref: script/Common.py:44-453 (CommonFunction).  The hot loop is fully on
device (one jit step); the host only feeds batches, logs meters, and runs the
final decode -> poseval stage.  Implements flip-test averaging behind the
reference's VAL.FLIP_VAL / TEST.FLIP_TEST flags (the reference defines the
flags but never implements flipping — SURVEY.md §7 step 7).
"""

from __future__ import annotations

import logging
import time
from collections import defaultdict
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from tabulate import tabulate

from otpose_tpu.data.posetrack import FLIP_PAIRS
from otpose_tpu.evaluate.pck import accuracy
from otpose_tpu.models.core import Ctx
from otpose_tpu.models.otpose import otpose_forward
from otpose_tpu.ops.heatmap import get_final_preds
from otpose_tpu.utils.profiling import maybe_trace

logger = logging.getLogger(__name__)


class AverageMeter:
    """ref: script/Common.py:22-40."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count if self.count else 0.0


def make_flip_eval_step(spec, *, compute_dtype=jnp.float32,
                        seq_axis=None, fused=None, jit=True):
    """Eval forward with horizontal flip-test averaging.

    Flips the 5-frame input stack, runs the model, unflips the heatmaps and
    swaps left/right joint channels, then averages with the direct pass.
    ``jit=False`` returns the plain function (for nesting inside shard_map,
    see ``trainer.make_decoded_eval_step``).
    """
    pairs = np.asarray(FLIP_PAIRS)
    perm = np.arange(spec.num_joints)
    perm[pairs[:, 0]], perm[pairs[:, 1]] = pairs[:, 1], pairs[:, 0]
    perm = jnp.asarray(perm)

    def step(params, model_state, batch):
        ctx = Ctx(params, model_state, train=False, compute_dtype=compute_dtype,
                  seq_axis=seq_axis, fused=fused)
        out = otpose_forward(ctx, batch["inputs"], batch["margin"], spec)
        heat = out[0]
        ctx2 = Ctx(params, model_state, train=False, compute_dtype=compute_dtype,
                   seq_axis=seq_axis, fused=fused)
        flipped = batch["inputs"][:, :, ::-1, :]
        out_f = otpose_forward(ctx2, flipped, batch["margin"], spec)
        heat_f = out_f[0][:, :, ::-1, :]          # unflip spatially
        heat_f = jnp.take(heat_f, perm, axis=-1)  # swap L/R joints
        # align: flipping shifts the heatmap grid by one pixel (standard
        # simple-baselines shift, cf. VAL.SHIFT_HEATMAP semantics)
        heat_f = jnp.concatenate([heat_f[:, :, :1], heat_f[:, :, :-1]], axis=2)
        bsz = batch["inputs"].shape[0]
        return (heat + heat_f) * 0.5, out[1][:bsz]

    return jax.jit(step) if jit else step


def _pipelined_forward(loader, run_fn, fetch_fn, shard_fn):
    """One-deep pipeline over an eval loader: enqueue batch i+1's forward
    before fetching batch i's results, overlapping device compute with the
    host-side decode/accumulate work (and hiding the fetch RTT).

    ``run_fn(fwd)`` launches the device step; ``fetch_fn(outs)`` brings its
    results to host.  With a ``shard_fn`` the HOST batch goes straight to it
    (direct sharded/replicated placement — no staging hop through device 0,
    and the multihost branch slices numpy instead of reading a device array
    back); without one, ``jnp.asarray`` starts the async H2D transfer."""
    pending = None
    for batch, metas in loader:
        fwd = {k: batch[k] for k in ("inputs", "margin")}
        if shard_fn is not None:
            fwd = shard_fn(fwd)
        else:
            fwd = {k: jnp.asarray(v) for k, v in fwd.items()}
        outs = run_fn(fwd)
        if pending is not None:
            p_outs, p_batch, p_metas = pending
            yield fetch_fn(p_outs), p_batch, p_metas
        pending = (outs, batch, metas)
    if pending is not None:
        p_outs, p_batch, p_metas = pending
        yield fetch_fn(p_outs), p_batch, p_metas


def train_epoch(step_fn, train_state, loader, epoch: int, cfg, *,
                rng: jax.Array, tb_writer=None, global_steps: int = 0,
                shard_fn=None, start_iteration: int = 0,
                should_stop=None) -> tuple:
    """One training epoch (ref: script/Common.py:79-294).
    Returns (train_state, global_steps, completed_iterations).

    ``start_iteration`` resumes mid-epoch (preemption recovery): the loader
    skips the first k batches — exact, since all RNG streams are index-keyed
    — and ``global_steps`` must already account for them.  ``should_stop``
    (e.g. ``lambda: guard.requested``) is checked at iteration boundaries;
    when it fires the epoch returns early and ``completed_iterations`` tells
    the caller what to checkpoint."""
    batch_time = AverageMeter()
    data_time = AverageMeter()
    acc_meter = AverageMeter()
    losses = defaultdict(AverageMeter)

    end = time.time()
    max_iter = len(loader)
    completed = start_iteration
    if start_iteration:
        loader.set_start_iteration(start_iteration)
    for it, (batch, metas) in enumerate(loader, start=start_iteration):
        data_time.update(time.time() - end)
        if shard_fn is not None:
            batch = shard_fn(batch)
        step_rng = jax.random.fold_in(rng, global_steps)
        with maybe_trace(cfg.TPU.PROFILE_DIR, step=global_steps):
            train_state, metrics = step_fn(train_state,
                                           {k: batch[k] for k in
                                            ("inputs", "margin", "target",
                                             "target_weight")},
                                           step_rng)
        batch_time.update(time.time() - end)
        end = time.time()
        global_steps += 1
        completed = it + 1

        if it % cfg.PRINT_FREQ == 0 or it >= max_iter - 1:
            host_metrics = {k: float(v) for k, v in metrics.items()}
            for k, v in host_metrics.items():
                losses[k].update(v)
            if tb_writer is not None:
                for k, v in host_metrics.items():
                    tb_writer.add_scalar(f"train/{k}", v, global_steps)
                if cfg.DEBUG.VIS_TENSORBOARD:
                    _tb_image_grids(tb_writer, batch, global_steps)
            acc_meter.update(host_metrics.get("pck_acc", 0.0))
            bsz = batch["inputs"].shape[0]
            loss_meter = losses["final_loss"]
            # Loss val (avg) like the reference's line (ref: Common.py:212-218);
            # the avg is over PRINT_FREQ samples — fetching metrics every
            # iteration would force a device sync and break async dispatch
            logger.info(
                "Epoch: [%03d][%05d/%05d]\tTime %.3fs (%.3fs)\t"
                "Speed %.1f samples/s\tData %.3fs\tLoss %.5f (%.5f)\tAcc %.3f",
                epoch, it, max_iter, batch_time.val, batch_time.avg,
                bsz / max(batch_time.val, 1e-9), data_time.val,
                loss_meter.val, loss_meter.avg, acc_meter.avg)
        if should_stop is not None and should_stop():
            logger.info("train_epoch: stop requested at epoch %d iteration %d",
                        epoch, completed)
            break
    return train_state, global_steps, completed


def evaluate_epoch(eval_fn, params, model_state, loader, dataset, cfg,
                   output_dir: str, *, phase: str = "validate",
                   tb_writer=None, global_steps: int = 0, shard_fn=None):
    """Full evaluation pass (ref: script/Common.py:296-453).
    Returns (name_values, mean_ap).  ``shard_fn`` places the forward batch
    over the device mesh (multi-chip eval; the reference scales eval batches
    with len(GPUS), ref: eval.py:30-33)."""
    batch_time = AverageMeter()
    acc_meter = AverageMeter()

    num_samples = len(dataset)
    num_joints = cfg.MODEL.NUM_JOINTS
    all_preds = np.zeros((num_samples, num_joints, 3))
    all_boxes = np.zeros((num_samples, 6))
    filenames_map: Dict[str, list] = {}
    filenames_counter = 0
    idx = 0

    end = time.time()

    from otpose_tpu.parallel.distributed import broadcast_scalar, fetch, is_primary

    pipeline = _pipelined_forward(
        loader, lambda fwd: eval_fn(params, model_state, fwd)[0], fetch,
        shard_fn)
    for it, (preds_np, batch, metas) in enumerate(pipeline):
        target_np = np.asarray(batch["target"])

        # PCK meter on NCHW layout
        _, avg_acc, cnt, _ = accuracy(
            preds_np.transpose(0, 3, 1, 2), target_np.transpose(0, 3, 1, 2))
        acc_meter.update(avg_acc, cnt)
        batch_time.update(time.time() - end)
        end = time.time()

        for meta in metas:
            filenames_map.setdefault(meta["image"], []).append(filenames_counter)
            filenames_counter += 1

        center = np.stack([m["center"] for m in metas])
        scale = np.stack([m["scale"] for m in metas])
        score = np.asarray([m["score"] for m in metas])
        n = preds_np.shape[0]
        preds, maxvals = get_final_preds(preds_np.transpose(0, 3, 1, 2),
                                         center, scale)
        all_preds[idx:idx + n, :, 0:2] = preds[:, :, 0:2]
        all_preds[idx:idx + n, :, 2:3] = maxvals
        all_boxes[idx:idx + n, 0:2] = center
        all_boxes[idx:idx + n, 2:4] = scale
        all_boxes[idx:idx + n, 4] = np.prod(scale * 200, 1)
        all_boxes[idx:idx + n, 5] = score
        idx += n

        if (cfg.DEBUG.VIS_SKELETON or cfg.DEBUG.VIS_BBOX) and is_primary():
            _vis_origin_images(cfg, output_dir, phase, metas, preds, maxvals)
        if it % cfg.PRINT_FREQ == 0:
            logger.info("%s: [%d/%d]\tTime %.3f (%.3f)\tAccuracy %.3f (%.3f)",
                        phase, it, len(loader), batch_time.val, batch_time.avg,
                        acc_meter.val, acc_meter.avg)
            if (cfg.DEBUG.VIS_SKELETON or cfg.DEBUG.VIS_BBOX) and is_primary():
                _dump_vis(cfg, output_dir, phase, it, batch, metas, preds_np)

    # multihost: primary writes poseval jsons + computes AP; the scalar is
    # broadcast so best-checkpoint control flow stays in lockstep
    if is_primary():
        name_values, mean_ap = dataset.evaluate(cfg, all_preds, output_dir,
                                                all_boxes, filenames_map)
        _print_name_value(name_values, cfg.MODEL.NAME)
    else:  # pragma: no cover - exercised only in multi-process jobs
        name_values, mean_ap = {}, None
    mean_ap = broadcast_scalar(mean_ap)
    if tb_writer is not None:
        tb_writer.add_scalar(f"{phase}/mAP", mean_ap, global_steps)
    return name_values, mean_ap


def _tb_image_grids(tb_writer, batch, global_steps, max_images: int = 6):
    """Input-frame and GT-heatmap grids for tensorboard
    (ref: script/Common.py:455-589, gated by DEBUG.VIS_TENSORBOARD)."""
    from otpose_tpu.utils.images import tensor2im

    inputs = np.asarray(batch["inputs"])[:max_images]
    imgs = np.stack([tensor2im(x[:, :, :3])[..., ::-1] for x in inputs])  # RGB
    tb_writer.add_images("train/input_images", imgs, global_steps,
                         dataformats="NHWC")
    target = np.asarray(batch["target"])[:max_images]        # (N, Hh, Hw, J)
    heat = target.max(axis=-1, keepdims=True)
    heat = (heat / np.maximum(heat.max(axis=(1, 2, 3), keepdims=True), 1e-6)
            * 255).astype(np.uint8)
    tb_writer.add_images("train/gt_heatmaps", heat, global_steps,
                         dataformats="NHWC")


def _dump_vis(cfg, output_dir, phase, it, batch, metas, preds_heat):
    """Crop-space skeleton/heatmap result dump behind DEBUG.VIS_* flags
    (ref: utils/evaluate.py:244-338)."""
    import os.path as osp

    from otpose_tpu.ops.heatmap import get_max_preds
    from otpose_tpu.utils.images import save_result_images, tensor2im

    out_dir = osp.join(output_dir, f"{phase}_vis")
    pose, conf = get_max_preds(preds_heat.transpose(0, 3, 1, 2))
    img = tensor2im(batch["inputs"][0, :, :, :3])
    stride = batch["inputs"].shape[1] / preds_heat.shape[1]
    path = save_result_images(out_dir, img, pose[0] * stride, conf[0, :, 0],
                              heatmaps=preds_heat[0].transpose(2, 0, 1),
                              name=f"{it}_pred_")
    return path


def _vis_origin_images(cfg, output_dir, phase, metas, preds, maxvals):
    """Accumulated skeleton/bbox overlays on the ORIGINAL frames, every
    eval iteration (ref: script/Common.py:591-602 _after_val_iter +
    utils/images.py:40-88).  ``preds`` are back-projected origin-image
    coords, so boxes and joints land in the same frame."""
    import os.path as osp

    from otpose_tpu.ops.bbox import cs2box
    from otpose_tpu.utils.images import draw_skeleton_in_origin_image

    coords = np.concatenate([preds[:, :, :2], maxvals], axis=-1)
    paths = [m["image"] for m in metas]
    bboxes = [cs2box(m["center"], m["scale"], pattern="xyxy") for m in metas]
    draw_skeleton_in_origin_image(
        paths, coords, bboxes, osp.join(output_dir, f"{phase}_vis"),
        vis_skeleton=cfg.DEBUG.VIS_SKELETON, vis_bbox=cfg.DEBUG.VIS_BBOX)


def _print_name_value(name_value, full_arch_name):
    """ref: script/Common.py:65-77."""
    table = tabulate(
        [[full_arch_name] + ["{:.4f}".format(v) for v in name_value.values()]],
        tablefmt="pipe", headers=["Model"] + list(name_value.keys()),
        numalign="left")
    logger.info("=> Result Table: \n" + table)


def evaluate_epoch_decoded(decoded_fn, params, model_state, loader, dataset,
                           cfg, output_dir: str, *, phase: str = "validate",
                           tb_writer=None, global_steps: int = 0,
                           shard_fn=None):
    """Evaluation with on-device decode: fetches 17 coords per box instead of
    full heatmaps (the reference decodes heatmaps on host per box,
    ref: script/Common.py:419-432).  Functionally equivalent to
    ``evaluate_epoch`` (same PCK meter semantics, same poseval output)."""
    from otpose_tpu.ops.affine import apply_affine_to_points, get_affine_transform
    from otpose_tpu.evaluate.pck import calc_dists, dist_acc
    from otpose_tpu.ops.heatmap import get_max_preds

    batch_time = AverageMeter()
    acc_meter = AverageMeter()
    num_samples = len(dataset)
    num_joints = cfg.MODEL.NUM_JOINTS
    hm_w, hm_h = cfg.MODEL.HEATMAP_SIZE
    all_preds = np.zeros((num_samples, num_joints, 3))
    all_boxes = np.zeros((num_samples, 6))
    filenames_map: Dict[str, list] = {}
    filenames_counter = 0
    idx = 0
    end = time.time()

    # multihost: outputs are globally sharded — fetch() all-gathers the tiny
    # per-box keypoints so every host sees every row (parallel/distributed.py)
    from otpose_tpu.parallel.distributed import broadcast_scalar, fetch, is_primary

    pipeline = _pipelined_forward(
        loader, lambda fwd: decoded_fn(params, model_state, fwd),
        lambda outs: tuple(fetch(o) for o in outs), shard_fn)
    for it, ((coords, maxvals, raw_coords), batch, metas) in \
            enumerate(pipeline):
        # PCK meter: device pred argmax vs host target argmax
        # (ref: utils/evaluate.py:384-415)
        target_np = np.asarray(batch["target"]).transpose(0, 3, 1, 2)
        gt_coords, _ = get_max_preds(target_np)
        norm = np.ones((coords.shape[0], 2)) * np.array([hm_h, hm_w]) / 10
        dists = calc_dists(raw_coords, gt_coords, norm)
        accs = [dist_acc(dists[i]) for i in range(num_joints)]
        valid = [a for a in accs if a >= 0]
        if valid:
            acc_meter.update(float(np.mean(valid)), len(valid))
        batch_time.update(time.time() - end)
        end = time.time()

        for meta in metas:
            filenames_map.setdefault(meta["image"], []).append(filenames_counter)
            filenames_counter += 1

        center = np.stack([m["center"] for m in metas])
        scale = np.stack([m["scale"] for m in metas])
        score = np.asarray([m["score"] for m in metas])
        n = coords.shape[0]
        for i in range(n):
            trans = get_affine_transform(center[i], scale[i], 0, [hm_w, hm_h],
                                         inv=1)
            all_preds[idx + i, :, 0:2] = apply_affine_to_points(coords[i], trans)
        all_preds[idx:idx + n, :, 2:3] = maxvals
        all_boxes[idx:idx + n, 0:2] = center
        all_boxes[idx:idx + n, 2:4] = scale
        all_boxes[idx:idx + n, 4] = np.prod(scale * 200, 1)
        all_boxes[idx:idx + n, 5] = score
        idx += n

        if (cfg.DEBUG.VIS_SKELETON or cfg.DEBUG.VIS_BBOX) and is_primary():
            _vis_origin_images(cfg, output_dir, phase, metas,
                               all_preds[idx - n:idx], maxvals)
        if it % cfg.PRINT_FREQ == 0:
            logger.info("%s: [%d/%d]\tTime %.3f (%.3f)\tAccuracy %.3f (%.3f)",
                        phase, it, len(loader), batch_time.val, batch_time.avg,
                        acc_meter.val, acc_meter.avg)

    # multihost: every process accumulated identical all_preds/all_boxes
    # (fetch() all-gathers), but only the primary writes the poseval jsons
    # and runs AP; the scalar is fanned back out so best-checkpoint control
    # flow stays in lockstep on every process
    if is_primary():
        name_values, mean_ap = dataset.evaluate(cfg, all_preds, output_dir,
                                                all_boxes, filenames_map)
        _print_name_value(name_values, cfg.MODEL.NAME)
    else:  # pragma: no cover - exercised only in multi-process jobs
        name_values, mean_ap = {}, None
    mean_ap = broadcast_scalar(mean_ap)
    if tb_writer is not None:
        tb_writer.add_scalar(f"{phase}/mAP", mean_ap, global_steps)
    return name_values, mean_ap
