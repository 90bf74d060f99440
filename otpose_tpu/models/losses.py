"""Training losses, vectorized JAX implementations.

ref: model/loss.py.  Semantics preserved exactly:

- ``st_ohkw_mse_loss`` (ref: loss.py:5-92): per joint, the labeled/unlabeled
  branch is decided by whether the *batch-global* max of that joint's GT
  heatmap equals 1.0 (gaussian targets peak at exactly 1.0 when visible);
  unlabeled joints add a student-vs-teacher consistency term.  OHKM keeps the
  top-k=8 hardest joints per sample.  final = ohkm + summed per-joint MSE.
- ``joints_mse_ohkm_loss`` (ref: loss.py:95-148)
- ``joint_mse_loss`` (ref: loss.py:151-182)

All heatmaps are NHWC (B, H, W, J); target_weight is (B, J, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flatten(hm: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, J) -> (B, J, HW)."""
    b, h, w, j = hm.shape
    return hm.transpose(0, 3, 1, 2).reshape(b, j, h * w)


def _ohkm(per_joint_loss: jnp.ndarray, topk: int) -> jnp.ndarray:
    """Top-k hardest joints per sample, averaged (ref: loss.py:13-23)."""
    vals, _ = jax.lax.top_k(per_joint_loss, topk)   # (B, topk)
    return jnp.mean(jnp.sum(vals, axis=1) / topk)


def st_ohkw_mse_loss(output_s: jnp.ndarray, output_t: jnp.ndarray,
                     target: jnp.ndarray, target_weight: jnp.ndarray,
                     *, topk: int = 8, use_target_weight: bool = True,
                     effective_num_joints: int | None = None):
    """Student-teacher OHKM MSE (ref: loss.py:25-92)."""
    ps = _flatten(output_s)
    pt = _flatten(output_t)
    gt = _flatten(target)
    b, j, hw = ps.shape
    if effective_num_joints is None:
        effective_num_joints = j

    if use_target_weight:
        w = target_weight[:, :, :1]               # (B, J, 1)
        ps_w, pt_w, gt_w = ps * w, pt * w, gt * w
        labeled = (jnp.max(gt, axis=(0, 2)) == 1.0)   # (J,) batch-global decision
        base = jnp.square(ps_w - gt_w)            # (B, J, HW)
        consist = jnp.square(ps_w - pt_w)
        unl = (~labeled).astype(base.dtype)[None, :, None]
        elem = 0.5 * (base + consist * unl)
        per_joint = jnp.mean(elem, axis=2)        # (B, J)
        ohkm_loss = _ohkm(per_joint, topk)
        mse_per_joint = jnp.mean(base, axis=(0, 2)) + \
            jnp.mean(consist, axis=(0, 2)) * (~labeled).astype(base.dtype)
        mse_loss = jnp.sum(mse_per_joint)
    else:
        # the reference's no-weight branch only accumulates teacher MSE and
        # produces an empty ohkm list; we keep the meaningful part
        base = jnp.square(pt - gt)
        elem = 0.5 * base
        ohkm_loss = _ohkm(jnp.mean(elem, axis=2), topk)
        mse_loss = jnp.sum(jnp.mean(base, axis=(0, 2)))

    final = ohkm_loss + mse_loss
    return {"ohkm_loss_s": ohkm_loss,
            "mse_loss_s": mse_loss / effective_num_joints,
            "final_loss": final}


def joints_mse_ohkm_loss(output: jnp.ndarray, target: jnp.ndarray,
                         target_weight: jnp.ndarray, *, topk: int = 8,
                         use_target_weight: bool = True,
                         effective_num_joints: int | None = None):
    """OHKM + MSE without the student/teacher split (ref: loss.py:95-148)."""
    p = _flatten(output)
    gt = _flatten(target)
    b, j, hw = p.shape
    if effective_num_joints is None:
        effective_num_joints = j
    if use_target_weight:
        w = target_weight[:, :, :1]
        p, gt = p * w, gt * w
    base = jnp.square(p - gt)
    ohkm_loss = _ohkm(jnp.mean(0.5 * base, axis=2), topk)
    mse_loss = jnp.sum(jnp.mean(base, axis=(0, 2)))
    final = ohkm_loss + mse_loss
    return {"ohkm_loss": ohkm_loss,
            "mse_loss": mse_loss / effective_num_joints,
            "final_loss": final}


def joint_mse_loss(output: jnp.ndarray, target: jnp.ndarray,
                   target_weight: jnp.ndarray, *, use_target_weight: bool = True,
                   effective_num_joints: int | None = None):
    """Plain per-joint MSE (ref: loss.py:151-182)."""
    p = _flatten(output)
    gt = _flatten(target)
    b, j, hw = p.shape
    if effective_num_joints is None:
        effective_num_joints = j
    if use_target_weight:
        w = target_weight[:, :, :1]
        p, gt = p * w, gt * w
    loss = jnp.sum(jnp.mean(jnp.square(p - gt), axis=(0, 2)))
    return loss / effective_num_joints


def build_loss(cfg):
    """Loss factory by cfg.LOSS.NAME (ref: loss.py:185-189)."""
    name = cfg.LOSS.NAME
    use_w = cfg.LOSS.USE_TARGET_WEIGHT
    topk = cfg.LOSS.TOPK
    if name == "ST_OHKW_MSELoss":
        def fn(output_s, output_t, target, target_weight):
            return st_ohkw_mse_loss(output_s, output_t, target, target_weight,
                                    topk=topk, use_target_weight=use_w)
        return fn
    if name == "MSELOSS_OHKM":
        def fn(output_s, output_t, target, target_weight):
            return joints_mse_ohkm_loss(output_s, target, target_weight,
                                        topk=topk, use_target_weight=use_w)
        return fn
    raise ValueError(f"Unsupported loss: {name}")
