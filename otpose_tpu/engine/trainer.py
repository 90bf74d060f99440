"""pjit training/eval step functions.

TPU-native replacement for the reference train/eval engine hot loop
(ref: script/Common.py:79-294,296-453).  The whole step — forward, the
student/teacher loss plus the occlusion auxiliary loss, backward, global-norm
clip, AdamW update, LR schedule — is one jit-compiled function over a
``Mesh``-sharded batch; gradient all-reduce over the data axis is emitted by
XLA.  Batch-norm batch statistics are computed over the *global* batch
(sync-BN), a deliberate improvement over DataParallel's per-replica stats
(documented divergence; see SURVEY.md hard-parts (e)).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from otpose_tpu.models.core import Ctx
from otpose_tpu.models.losses import st_ohkw_mse_loss
from otpose_tpu.models.otpose import OTPoseSpec, otpose_forward


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Dict[str, jnp.ndarray]
    model_state: Dict[str, jnp.ndarray]   # BN running stats + PE buffers
    opt_state: Any
    step: jnp.ndarray


def compute_losses(ctx: Ctx, batch: Dict[str, jnp.ndarray], spec: OTPoseSpec,
                   topk: int = 8, use_target_weight: bool = True):
    """Forward + the reference's loss combination (ref: Common.py:122-130).

    batch: 'inputs' (B, H, W, 15), 'margin' (B, 4),
           'target' (B, Hh, Hw, J), 'target_weight' (B, J, 1).
    """
    out = otpose_forward(ctx, batch["inputs"], batch["margin"], spec)
    output, rough, intersection, _prev_b, context_encoding, _sq, _tb = out
    bsz = batch["inputs"].shape[0]
    pred_t = rough[:bsz]  # current-frame teacher heatmaps (no detach, as in ref)
    target = batch["target"]
    weight = batch["target_weight"]

    losses = st_ohkw_mse_loss(output, pred_t, target, weight, topk=topk,
                              use_target_weight=use_target_weight)
    occlusion = (target + intersection) / 2
    aux = st_ohkw_mse_loss(context_encoding, context_encoding, occlusion, weight,
                           topk=topk, use_target_weight=use_target_weight)
    total = losses["final_loss"] + aux["final_loss"]
    from otpose_tpu.evaluate.pck import accuracy_device

    pck, _ = accuracy_device(jax.lax.stop_gradient(output), target)
    metrics = {
        "final_loss": total,
        "ohkm_loss_s": losses["ohkm_loss_s"],
        "mse_loss_s": losses["mse_loss_s"],
        "occ_final_loss": aux["final_loss"],
        "pck_acc": pck,
    }
    return total, (metrics, output)


def make_train_step(spec: OTPoseSpec, optimizer, *, compute_dtype=jnp.float32,
                    topk: int = 8, use_target_weight: bool = True,
                    donate: bool = True, remat: bool = False,
                    compiler_options: dict | None = None,
                    seq_axis: str | None = None,
                    accum_steps: int = 1) -> Callable:
    """Build the jit'd train step: (TrainState, batch, rng) -> (TrainState, metrics).

    ``remat=True`` recomputes the whole forward during the backward pass
    (cfg.TPU.REMAT) — trades ~1 extra forward for activation memory.
    Flagship batch 8 fits WITHOUT remat on a 16GB v5e since the round-2
    bf16/(B,C,T) activation work and runs 13.7% faster that way (516.5 vs
    598.2 ms/step measured).  Remat does NOT rescue flagship batch 16 on
    16GB: the round-4 sweep measured a compile-time OOM at 16.23G of
    15.75G HBM (the f32 deform tent buffer's remat compressed+uncompressed
    copies alone are ~1.5G) — use ``accum_steps`` for effective batches
    above 8 instead (accum2@16 runs at ~910 ms/update and beats two b8
    steps by ~20%/clip, STATUS.md round-4 sweep).

    ``accum_steps=K > 1`` (cfg.TPU.ACCUM_STEPS) runs gradient accumulation:
    the incoming batch (size K*m) is split into K micro-batches processed
    sequentially under ``lax.scan`` — activation memory stays at micro-batch
    size — with gradients/metrics averaged and ONE optimizer update at the
    end.  Standard accumulation semantics: BN batch statistics and the
    batch-global OHKM loss branch see each micro-batch separately (exactly
    as K small torch steps would), and each micro-batch gets its own
    dropout/drop-path fold of ``rng``.  No reference counterpart (it trains
    batch 2-8/GPU, ref: configs/17/model_RSN.yaml:45); this is the TPU-side
    mechanism for reference-scale *effective* batches beyond 16GB HBM."""
    if accum_steps < 1:
        raise ValueError(
            f"accum_steps (cfg.TPU.ACCUM_STEPS) must be >= 1, got "
            f"{accum_steps}; use 1 to disable gradient accumulation")

    def loss_fn(params, model_state, batch, rng):
        ctx = Ctx(params, model_state, train=True, rng=rng,
                  compute_dtype=compute_dtype, seq_axis=seq_axis)
        total, (metrics, _) = compute_losses(ctx, batch, spec, topk,
                                             use_target_weight)
        return total, (metrics, ctx.finalize_state())

    if remat:
        loss_fn = jax.checkpoint(loss_fn)

    tree_map = jax.tree_util.tree_map

    def step(ts: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum_steps == 1:
            (_, (metrics, new_model_state)), grads = grad_fn(
                ts.params, ts.model_state, batch, rng)
        else:
            b = batch["inputs"].shape[0]
            if b % accum_steps:
                raise ValueError(f"batch size {b} not divisible by "
                                 f"accum_steps {accum_steps}")
            micro = tree_map(
                lambda x: x.reshape((accum_steps, b // accum_steps)
                                    + x.shape[1:]), batch)
            # ALL micro-batches run inside the scan; the zero-initialized
            # grads/metrics carry gets its pytree structure from eval_shape
            # (abstract evaluation only — nothing executes).  The previous
            # formulation ran micro-batch 0 OUTSIDE the scan to pin the
            # carry structure, which compiled a second full fwd+bwd whose
            # body-scale temporaries coexisted with the scan body's in XLA
            # buffer assignment: flagship accum2@16 demanded 21.96G of the
            # chip's 15.75G HBM (round-4 sweep receipt in STATUS.md).
            (_, (m_shapes, _)), g_shapes = jax.eval_shape(
                grad_fn, ts.params, ts.model_state,
                tree_map(lambda x: x[0], micro), rng)

            def zeros_of(tree):
                return tree_map(lambda s: jnp.zeros(s.shape, s.dtype), tree)

            def body(carry, xs):
                state, g_acc, m_acc = carry
                mb, i = xs
                (_, (m, new_state)), g = grad_fn(ts.params, state, mb,
                                                 jax.random.fold_in(rng, i))
                return (new_state, tree_map(jnp.add, g_acc, g),
                        tree_map(jnp.add, m_acc, m)), None

            (state, g_acc, m_acc), _ = jax.lax.scan(
                body, (ts.model_state, zeros_of(g_shapes), zeros_of(m_shapes)),
                (micro, jnp.arange(accum_steps)))
            grads = tree_map(lambda g: g / accum_steps, g_acc)
            metrics = tree_map(lambda m: m / accum_steps, m_acc)
            new_model_state = state
        updates, new_opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, ts.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(new_params, new_model_state, new_opt_state,
                          ts.step + 1), metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums,
                   compiler_options=compiler_options)


def make_eval_step(spec: OTPoseSpec, *, compute_dtype=jnp.float32,
                   seq_axis: str | None = None,
                   fused: bool | None = None) -> Callable:
    """jit'd eval forward: (params, model_state, batch) -> (pred_heatmaps, teacher).

    ``fused``: force the Pallas fused-MLP kernel on/off (None = Ctx auto —
    on for a single real TPU device)."""

    def step(params, model_state, batch):
        ctx = Ctx(params, model_state, train=False, compute_dtype=compute_dtype,
                  seq_axis=seq_axis, fused=fused)
        out = otpose_forward(ctx, batch["inputs"], batch["margin"], spec)
        bsz = batch["inputs"].shape[0]
        return out[0], out[1][:bsz]

    return jax.jit(step)


def make_decoded_eval_step(spec: OTPoseSpec, *, compute_dtype=jnp.float32,
                           flip: bool = False,
                           seq_axis: str | None = None,
                           fused: bool | None = None,
                           mesh=None) -> Callable:
    """jit'd eval forward + on-device decode.

    Returns (refined_coords (B, J, 2), maxvals (B, J, 1),
    raw_coords (B, J, 2)) — the host then only back-projects 17 points per
    box instead of fetching full heatmaps (ref decode: utils/heatmap.py:108-140;
    the reference pulls heatmaps to host and decodes per box in numpy,
    script/Common.py:419-432).

    ``mesh``: with a multi-device data-parallel mesh (and no sequence
    sharding), the step is wrapped in ``shard_map`` over the ``data`` axis
    so each chip runs its batch shard independently — eval has no
    cross-batch ops (BN uses running stats), and per-device execution lets
    the Pallas fused kernels run under the mesh (plain jit disables them:
    the GSPMD partitioner has no sharding rule for the custom calls).
    Batches not divisible by the data-axis size dispatch to a plain-jit
    fallback (the eval loader doesn't drop_last).
    """
    from otpose_tpu.ops.heatmap import get_max_preds_device, refine_coords_device

    def build_step(fused_flag):
        if flip:
            from otpose_tpu.engine.runner import make_flip_eval_step

            fwd = make_flip_eval_step(spec, compute_dtype=compute_dtype,
                                      seq_axis=seq_axis, fused=fused_flag,
                                      jit=False)
        else:
            def fwd(params, model_state, batch):
                ctx = Ctx(params, model_state, train=False,
                          compute_dtype=compute_dtype, seq_axis=seq_axis,
                          fused=fused_flag)
                out = otpose_forward(ctx, batch["inputs"], batch["margin"],
                                     spec)
                bsz = batch["inputs"].shape[0]
                return out[0], out[1][:bsz]

        def step(params, model_state, batch):
            heat, _teacher = fwd(params, model_state, batch)
            heat_nchw = heat.transpose(0, 3, 1, 2)
            coords, maxvals = refine_coords_device(heat_nchw)
            raw_coords, _ = get_max_preds_device(heat_nchw)
            return coords, maxvals, raw_coords

        return step

    data_n = 0
    if mesh is not None and seq_axis is None:
        data_n = dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 0)
    fused_eff = fused if fused is not None \
        else jax.default_backend() == "tpu"
    if data_n > 1 and fused_eff:
        from jax.sharding import PartitionSpec as P

        jit_sharded = jax.jit(jax.shard_map(
            build_step(True), mesh=mesh,
            in_specs=(P(), P(), P("data")), out_specs=P("data"),
            check_vma=False))
        # fallback for non-divisible (last) batches: plain jit with Ctx
        # auto (fused=None), which keeps the Pallas kernels OFF under a
        # multi-device backend — passing the caller's fused=True through
        # would put the custom calls inside a multi-device jit, the exact
        # no-GSPMD-rule configuration the shard_map wrapper avoids
        jit_plain = jax.jit(build_step(None))

        def dispatch(params, model_state, batch):
            if batch["inputs"].shape[0] % data_n == 0:
                return jit_sharded(params, model_state, batch)
            return jit_plain(params, model_state, batch)

        # expose the sharded jit for AOT compile gates
        # (__graft_entry__.dryrun_multichip lowers it at flagship geometry)
        dispatch.jit_sharded = jit_sharded
        return dispatch
    return jax.jit(build_step(fused))



def init_train_state(params, model_state, optimizer) -> TrainState:
    return TrainState(params=params, model_state=model_state,
                      opt_state=optimizer.init(params),
                      step=jnp.zeros([], jnp.int32))
