"""Optimizer and LR schedule.

Replicates the reference's three-param-group AdamW and per-iteration
linear-warmup schedulers (ref: thirdparty/utils/train_utils.py:62-205,
thirdparty/utils/lr_schedulers.py:10-212) as a single optax chain:

  clip_by_global_norm(1.0) -> adam -> (+ wd * param, masked) -> -lr(t) * group_scale

Groups (ref: train_utils.py:68-101), resolved by parameter *name* since our
param tree is flat and torch-keyed:
  - ``pretrained``: HRNet params (``rough_pose_estimation_net.*`` /
    ``teacher*``) — lr/100, weight-decayed
  - ``no_decay``: biases, channel-LayerNorm weights, AffineDropPath scales,
    rel-PE tables
  - ``decay``: everything else (conv kernels incl. the RSB chains' BN weights
    — a reference quirk of the CHAIN_RSB_BLOCKS whitelist entry)
"""

from __future__ import annotations

import math
from typing import Callable, Dict

import jax.numpy as jnp
import optax

_LN_SUFFIXES = ("ln1", "ln2", "query_norm", "key_norm", "value_norm")


def classify_param(name: str) -> str:
    """-> 'pretrained' | 'no_decay' | 'decay' (ref: train_utils.py:77-101)."""
    if name.startswith("rough_pose_estimation_net.") or name.startswith("teacher"):
        return "pretrained"
    if name.endswith(".bias"):
        return "no_decay"
    if name.endswith(".scale") or name.endswith("rel_pe"):
        return "no_decay"
    if name.endswith(".weight"):
        # match the owning LayerNorm module anywhere in the path: ModuleList-
        # held norms look like "temporal_encoder1.embd_norm.0.weight", so the
        # module name is parts[-3], not parts[-2] (ref blacklists every
        # nn.LayerNorm instance, train_utils.py:88-101)
        parts = name.split(".")
        if any(p in _LN_SUFFIXES or p == "embd_norm" for p in parts[:-1]):
            return "no_decay"
    return "decay"


def linear_warmup_cosine_schedule(base_lr: float, warmup_steps: int, max_steps: int,
                                  warmup_start_lr: float = 0.0,
                                  eta_min: float = 1e-8) -> Callable:
    """Closed-form per-iteration schedule (ref: lr_schedulers.py:108-124)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        denom = max(warmup_steps - 1, 1)
        warm = warmup_start_lr + step * (base_lr - warmup_start_lr) / denom
        prog = (step - warmup_steps) / max(max_steps - warmup_steps, 1)
        cos = eta_min + 0.5 * (base_lr - eta_min) * (1 + jnp.cos(math.pi * prog))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def linear_warmup_multistep_schedule(base_lr: float, warmup_steps: int,
                                     milestones, gamma: float,
                                     warmup_start_lr: float = 0.0) -> Callable:
    """ref: lr_schedulers.py:127-212 (note make_scheduler always passes an
    empty milestone list, ref: train_utils.py:169-177)."""
    milestones = sorted(milestones)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        denom = max(warmup_steps - 1, 1)
        warm = warmup_start_lr + step * (base_lr - warmup_start_lr) / denom
        n_passed = jnp.sum(jnp.asarray([step >= m for m in milestones], jnp.float32)) \
            if milestones else 0.0
        decayed = base_lr * (gamma ** n_passed)
        return jnp.where(step < warmup_steps, warm, decayed)

    return schedule


def make_schedule(cfg, num_iters_per_epoch: int) -> Callable:
    """ref: train_utils.py:142-205."""
    if cfg.TRAIN.WARMUP:
        max_steps = (cfg.TRAIN.END_EPOCH + cfg.TRAIN.WARMUP_EPOCHS) * num_iters_per_epoch
        warmup_steps = cfg.TRAIN.WARMUP_EPOCHS * num_iters_per_epoch
        if cfg.TRAIN.LR_SCHEDULER == "CosineAnnealingLR":
            return linear_warmup_cosine_schedule(cfg.TRAIN.LR, warmup_steps, max_steps)
        if cfg.TRAIN.LR_SCHEDULER == "MultiStepLR":
            return linear_warmup_multistep_schedule(cfg.TRAIN.LR, warmup_steps, [],
                                                    cfg.TRAIN.GAMMA)
        raise ValueError(f"Unsupported scheduler {cfg.TRAIN.LR_SCHEDULER}")
    max_steps = cfg.TRAIN.EPOCHS * num_iters_per_epoch
    if cfg.TRAIN.LR_SCHEDULER == "CosineAnnealingLR":
        return linear_warmup_cosine_schedule(cfg.TRAIN.LR, 0, max_steps, eta_min=0.0)
    if cfg.TRAIN.LR_SCHEDULER == "MultiStepLR":
        return linear_warmup_multistep_schedule(cfg.TRAIN.LR, 0, [], cfg.TRAIN.GAMMA)
    raise ValueError(f"Unsupported scheduler {cfg.TRAIN.LR_SCHEDULER}")


def make_optimizer(params: Dict[str, jnp.ndarray], cfg,
                   schedule: Callable, clip_grad_norm: float = 1.0):
    """Build the optax transform (ref: train_utils.py:62-137; grad clip 1.0
    per ref: script/Common.py:138-142)."""
    groups = {k: classify_param(k) for k in params}
    wd_mask = {k: g != "no_decay" for k, g in groups.items()}
    lr_scale = {k: (0.01 if g == "pretrained" else 1.0) for k, g in groups.items()}
    if cfg.MODEL.FREEZE_HRNET_WEIGHTS:
        # zero the final update (incl. the weight-decay term) for frozen HRNet
        # params (ref: OTPose.py:502-503) — bit-identical across steps
        for k in lr_scale:
            if k.startswith("rough_pose_estimation_net."):
                lr_scale[k] = 0.0

    def scale_by_group_lr():
        def init_fn(params):
            return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

        def update_fn(updates, state, params=None):
            lr = schedule(state.count)
            updates = {k: -lr * lr_scale[k] * u for k, u in updates.items()}
            return updates, optax.ScaleByScheduleState(count=state.count + 1)

        return optax.GradientTransformation(init_fn, update_fn)

    chain = []
    if clip_grad_norm and clip_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(clip_grad_norm))
    name = cfg.TRAIN.OPTIMIZER
    if name == "AdamW":
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        chain.append(optax.add_decayed_weights(cfg.TRAIN.WD, mask=wd_mask))
    elif name == "SGD":
        # torch SGD weight decay is COUPLED: wd*p is added to the gradient
        # before the momentum accumulator (ref: make_optimizer passes the
        # group weight_decay to optim.SGD, train_utils.py:116-137,121)
        if cfg.TRAIN.WD:
            chain.append(optax.add_decayed_weights(cfg.TRAIN.WD, mask=wd_mask))
        if cfg.TRAIN.MOMENTUM:
            # plain momentum: the reference factory never passes nesterov to
            # optim.SGD (train_utils.py:124-128), so the TRAIN.NESTEROV cfg
            # key is parsed-but-ignored there; mirror that to keep SGD
            # trajectories reference-equal
            chain.append(optax.trace(decay=cfg.TRAIN.MOMENTUM,
                                     nesterov=False))
    else:
        raise ValueError(f"Unsupported optimizer {name}")
    chain.append(scale_by_group_lr())
    return optax.chain(*chain)


class ModelEma:
    """Exponential moving average of parameters
    (ref: thirdparty/utils/train_utils.py:240-262)."""

    def __init__(self, params, decay: float = 0.999):
        import jax

        self.decay = decay
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self._update = jax.jit(
            lambda ema, p: jax.tree_util.tree_map(
                lambda e, x: self.decay * e + (1.0 - self.decay) * x, ema, p))

    def update(self, params):
        self.params = self._update(self.params, params)
        return self.params
