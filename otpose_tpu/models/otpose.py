"""OTPose: occlusion-aware transformer pose estimation, full model assembly.

ref: model/OTPose.py:180-503.  Forward (ref: 307-394):
  1. split the (B, H, W, 15) 5-frame stack into 5 x (B, H, W, 3), batch as 5B,
     run HRNet once -> rough heatmaps (5B, Hh, Hw, J)
  2. occlusion encoding: total_b = sum of the 5 heatmap sets; squeezed =
     channel-sum broadcast back to J channels; intersection = total_b*squeezed
  3. flow encoder (ConvTransformer J->J) on total_b -> context_encoding
  4. margin penalty: aux heatmaps divided by (margin + 1)
  5. two 8-feature 136-channel stacks -> temporal encoders (ConvTransformer,
     3 outputs each) -> 408-ch maps -> final 1x1 convs -> 2 x J
  6. def_fuse RSB on total_b; offset_mask_combine RSB on [branches, fused];
     per-dilation offset/mask convs + modulated deformable conv; mean-aggregate

Returns the reference 7-tuple. Heatmap tensors are NHWC throughout.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import numpy as np
import jax.numpy as jnp

from otpose_tpu.models import core, rsb
from otpose_tpu.models.conv_transformer import (ConvTransformerSpec,
                                                conv_transformer_forward,
                                                init_conv_transformer)
from otpose_tpu.models.core import Ctx, KeyGen
from otpose_tpu.models.hrnet import HRNetSpec, hrnet_forward, init_hrnet
from otpose_tpu.ops.deform_conv import (identity_filler_weight,
                                         modulated_deform_conv_multi)


def _check_aggregation(kind: str) -> str:
    if kind != "weighted_sum":
        raise ValueError(
            f"DEFORMABLE_CONV.AGGREGATION_TYPE={kind!r} is not implemented: "
            "the reference model only defines its output under "
            "'weighted_sum' (ref: model/OTPose.py:387-394)")
    return kind


@dataclasses.dataclass(frozen=True)
class OTPoseSpec:
    hrnet: HRNetSpec
    num_joints: int
    pe_h: int
    pe_w: int
    dilations: Tuple[int, ...]
    def_ch: int
    offset_mask_combine_blocks: int
    aggregation_type: str = "weighted_sum"
    freeze_hrnet: bool = False    # MODEL.FREEZE_HRNET_WEIGHTS
    num_frames: int = 8           # feature-stack depth (ref: OTPose.py:188)
    scale_arch: Tuple[int, int, int] = (0, 6, 2)
    flow_scale_arch: Tuple[int, int, int] = (0, 6, 0)
    proj_pdrop: float = 0.1
    path_pdrop: float = 0.1

    @property
    def temporal_encoding_dim(self) -> int:
        return self.num_joints * self.num_frames

    @property
    def num_patches(self) -> int:
        return self.pe_h * self.pe_w

    def temporal_spec(self) -> ConvTransformerSpec:
        d = self.temporal_encoding_dim
        return ConvTransformerSpec(
            n_in=d, n_embd=d, n_head=2, n_embd_ks=3, max_len=self.num_patches,
            arch=self.scale_arch, proj_pdrop=self.proj_pdrop,
            path_pdrop=self.path_pdrop)

    def flow_spec(self) -> ConvTransformerSpec:
        return ConvTransformerSpec(
            n_in=self.num_joints, n_embd=self.num_joints, n_head=1, n_embd_ks=3,
            max_len=self.num_patches, arch=self.flow_scale_arch,
            proj_pdrop=self.proj_pdrop, path_pdrop=self.path_pdrop)

    @staticmethod
    def from_cfg(cfg) -> "OTPoseSpec":
        hm_w, hm_h = cfg.MODEL.HEATMAP_SIZE
        extra = cfg.MODEL.EXTRA
        # archs are hard-coded in the reference (ref: OTPose.py:203-204);
        # optional EXTRA overrides exist for small test models only
        scale_arch = tuple(extra.get("SCALE_ARCH", (0, 6, 2)))
        flow_arch = tuple(extra.get("FLOW_SCALE_ARCH", (0, 6, 0)))
        return OTPoseSpec(
            hrnet=HRNetSpec.from_cfg(cfg),
            num_joints=cfg.MODEL.NUM_JOINTS,
            pe_h=hm_h, pe_w=hm_w,
            dilations=tuple(cfg.MODEL.DEFORMABLE_CONV.DILATION),
            def_ch=cfg.MODEL.DEFORMABLE_CONV_CH,
            offset_mask_combine_blocks=cfg.MODEL.OFFSET_MASK_COMBINE_CONV,
            # the reference only defines the output under 'weighted_sum'
            # (its forward hits an UnboundLocalError otherwise, ref:
            # OTPose.py:387-394); reject loudly rather than silently
            # running a different aggregation
            aggregation_type=_check_aggregation(
                cfg.MODEL.DEFORMABLE_CONV.AGGREGATION_TYPE),
            freeze_hrnet=cfg.MODEL.FREEZE_HRNET_WEIGHTS,
            scale_arch=scale_arch,
            flow_scale_arch=flow_arch,
        )


def _tokens_to_map(feats, b, pe_h, pe_w):
    """Stack ConvTransformer outputs [(B, C, T)] -> NHWC map (B, H, W, n*C).

    The reference stacks on a new dim-1 then views to (B, n*C, H, W)
    (ref: OTPose.py:332-335,362-369), i.e. channel order is scale-major —
    exactly the (B, C, T) layout the encoder already produces.
    """
    n = len(feats)
    c = feats[0].shape[1]
    x = jnp.stack(feats, axis=1)                  # (B, n, C, T)
    x = x.reshape(b, n * c, pe_h, pe_w)           # row-major (H, W)
    return x.transpose(0, 2, 3, 1)                # NHWC


def _final_layer_ct(ctx: Ctx, name: str, feats, b: int, pe_h: int,
                    pe_w: int) -> jnp.ndarray:
    """Final 1x1 conv over stacked encoder scales, computed in token space.

    Equivalent to ``conv2d(name, _tokens_to_map(feats_upsampled))`` for a
    1x1 kernel (ref: OTPose.py:332-338,362-369): the stored (1, 1, n*C, J)
    weight is split scale-major to match ``_tokens_to_map``'s channel
    order, each scale's slice is applied to its native strided tokens, and
    the J-channel partial results are linearly upsampled (the conv and the
    linear interpolation commute) and summed.  Returns NHWC (B, H, W, J).
    """
    t = pe_h * pe_w
    w = ctx.param(f"{name}.weight")[0, 0]       # (n*C, J)
    bias = ctx.params.get(ctx._key(f"{name}.bias"))
    c = feats[0].shape[1]
    y = None
    for s, f in enumerate(feats):
        ws = w[s * c:(s + 1) * c].astype(ctx.compute_dtype)
        ys = jnp.einsum("bct,cd->bdt", f.astype(ctx.compute_dtype), ws,
                        preferred_element_type=core._preferred(ctx.compute_dtype),
                        precision=core._mxu_precision(ctx.compute_dtype)
                        ).astype(f.dtype)
        if ys.shape[-1] != t:
            ys = core.upsample_linear_1d_ct(ys, t)
        y = ys if y is None else y + ys
    if bias is not None:
        y = y + bias.astype(y.dtype)[:, None]
    return y.reshape(b, -1, pe_h, pe_w).transpose(0, 2, 3, 1)


def otpose_forward(ctx: Ctx, x: jnp.ndarray, margin: jnp.ndarray,
                   spec: OTPoseSpec):
    """x: (B, H, W, 15) five RGB frames stacked channel-wise in the order
    (current, prev, next, pprev, nnext) (ref: script/Common.py:117);
    margin: (B, 4) temporal distances (left, right, lleft, rright).

    Returns the reference 7-tuple, all NHWC:
    (output_heatmaps, rough_heatmaps(5B), intersection, prev_b,
     context_encoding, squeezed, total_b).
    """
    b = x.shape[0]
    j = spec.num_joints

    frames = jnp.concatenate(jnp.split(x, 5, axis=-1), axis=0)  # (5B, H, W, 3)
    # bf16 activations end-to-end when compute_dtype is bf16 (halves HBM
    # traffic); norm statistics stay f32 inside the layers
    frames = frames.astype(ctx.compute_dtype)
    hctx = ctx.sub("rough_pose_estimation_net")
    if spec.freeze_hrnet:
        # MODEL.FREEZE_HRNET_WEIGHTS (ref: OTPose.py:502-503, HRNet.py:154-158).
        # The reference only sets requires_grad=False (torch BN running stats
        # would still drift in train mode — a well-known footgun); we freeze
        # the running stats too and normalize with them, i.e. a true freeze.
        # stop_gradient on the outputs matches torch's grad flow exactly (no
        # HRNet param receives gradient) and lets XLA drop the entire HRNet
        # backward pass.
        hctx = hctx.frozen()
    rough = hrnet_forward(hctx, frames, spec.hrnet)
    if spec.freeze_hrnet:
        rough = jax.lax.stop_gradient(rough)
    cur, prev, nxt, pprev, nnext = jnp.split(rough, 5, axis=0)

    total_b = cur + prev + nxt + pprev + nnext
    squeezed = jnp.sum(total_b, axis=-1, keepdims=True)
    squeezed = jnp.broadcast_to(squeezed, total_b.shape)
    intersection = total_b * squeezed

    flow_feats = conv_transformer_forward(ctx.sub("flow_encoder"), total_b,
                                          spec.flow_spec(), out_layout="ct")
    context_encoding = _tokens_to_map(flow_feats, b, spec.pe_h, spec.pe_w)

    # margin penalty (ref: OTPose.py:339-342)
    margin = margin.astype(total_b.dtype)
    prev = prev / (margin[:, 0] + 1)[:, None, None, None]
    nxt = nxt / (margin[:, 1] + 1)[:, None, None, None]
    pprev = pprev / (margin[:, 2] + 1)[:, None, None, None]
    nnext = nnext / (margin[:, 3] + 1)[:, None, None, None]

    prev_b = cur + (prev + pprev)
    next_b = cur + (nxt + nnext)
    close_b = cur + (nxt + prev)
    far_b = cur + (nnext + pprev)
    prev_int = prev_b * squeezed
    next_int = next_b * squeezed
    close_int = close_b * squeezed
    far_int = far_b * squeezed

    # stack 8 J-channel features joint-major: channel = j*8 + f
    # (ref: OTPose.py:356-359 stack(dim=2).flatten(1, 2))
    def _stack8(feats):
        s = jnp.stack(feats, axis=-1)             # (B, H, W, J, 8)
        return s.reshape(b, spec.pe_h, spec.pe_w, j * spec.num_frames)

    x1 = _stack8([intersection, context_encoding, prev_b, far_b, close_b,
                  prev_int, far_int, close_int])
    x2 = _stack8([intersection, context_encoding, next_b, close_b, far_b,
                  next_int, close_int, far_int])

    tspec = spec.temporal_spec()
    # (both round 1 and round 2 measured the "obvious" batching of the two
    # encoders — vmap over stacked params — SLOWER than sequential execution:
    # ~7% with in-step stacking, ~7% even with params pre-stacked outside the
    # step.  XLA lowers the s=2 batched matmuls worse than two plain ones.
    # See STATUS.md perf log; keep them sequential.)
    commute = spec.hrnet.final_conv_kernel == 1
    x1_feats = conv_transformer_forward(ctx.sub("temporal_encoder1"), x1, tspec,
                                        out_layout="ct", upsample=not commute)
    x2_feats = conv_transformer_forward(ctx.sub("temporal_encoder2"), x2, tspec,
                                        out_layout="ct", upsample=not commute)
    if commute:
        # final_layer is a 1x1 conv (FINAL_CONV_KERNEL=1, the shipped spec):
        # a per-token channel map commutes with the encoder's linear branch
        # upsampling, so apply the conv per scale on the native strided
        # tokens and upsample the J-channel results — this skips the
        # (B, 3C, T) stack/transpose materialization and upsamples 8x fewer
        # channels (same math as conv(stack(...)), ref: OTPose.py:332-338)
        y1 = _final_layer_ct(ctx, "final_layer1", x1_feats, b,
                             spec.pe_h, spec.pe_w)
        y2 = _final_layer_ct(ctx, "final_layer2", x2_feats, b,
                             spec.pe_h, spec.pe_w)
    else:
        x1m = _tokens_to_map(x1_feats, b, spec.pe_h, spec.pe_w)
        x2m = _tokens_to_map(x2_feats, b, spec.pe_h, spec.pe_w)
        pad = 1 if spec.hrnet.final_conv_kernel == 3 else 0
        y1 = ctx.conv2d("final_layer1", x1m, padding=pad)
        y2 = ctx.conv2d("final_layer2", x2m, padding=pad)
    branches = jnp.concatenate([y1, y2], axis=-1)

    def_heatmaps = rsb.chain_rsb_blocks(ctx.sub("def_fuse"), total_b, j, j,
                                        spec.offset_mask_combine_blocks)
    trans = rsb.chain_rsb_blocks(
        ctx.sub("offset_mask_combine_conv"),
        jnp.concatenate([branches, def_heatmaps], axis=-1),
        j * 3, spec.def_ch, spec.offset_mask_combine_blocks)

    offsets_list, masks_list = [], []
    for d_idx, dilation in enumerate(spec.dilations):
        # (round-2 A/B: concatenating the offsets+masks convs into one conv
        # per dilation measured +1.4 ms at the flagship shape — XLA already
        # schedules the pair well — so they stay separate; see STATUS.md)
        offsets_list.append(ctx.conv2d(f"offsets_list.{d_idx}.0", trans,
                                       padding=dilation, dilation=dilation,
                                       bias=False))
        masks_list.append(ctx.conv2d(f"masks_list.{d_idx}.0", trans,
                                     padding=dilation, dilation=dilation,
                                     bias=False))
    weights = jnp.stack([
        ctx.param(f"modulated_deform_conv_list.{d}.deform_conv.weight")
        for d in range(len(spec.dilations))])
    biases = jnp.stack([
        ctx.param(f"modulated_deform_conv_list.{d}.deform_conv.bias")
        for d in range(len(spec.dilations))])
    output = modulated_deform_conv_multi(
        def_heatmaps, offsets_list, masks_list, weights, biases,
        kernel=3, stride=1, padding_list=tuple(spec.dilations),
        dilation_list=tuple(spec.dilations), deformable_groups=j)
    output = output.astype(jnp.float32)
    return output, rough, intersection, prev_b, context_encoding, squeezed, total_b


def prepare_eval_params(params, *, param_dtype=None):
    """Eval-only view of the param dict, built ONCE per eval epoch outside
    the jitted step: casts >=2-D weights (convs/denses) to ``param_dtype`` —
    bf16 halves weight HBM reads and drops the per-step cast kernels — while
    1-D norm/bias params stay f32 for exact statistics.  ``param_dtype=None``
    is the identity.

    (This transform is dtype-only by design: pre-stacking the two temporal
    encoders for a vmapped pass was tried here and measured ~7% SLOWER
    end-to-end — see STATUS.md perf log.  Training and checkpointing always
    use the plain dict.)
    """
    if param_dtype is None:
        return params
    # one jitted program: eager per-param casts dispatch ~800 tiny
    # individually-compiled ops — seconds of per-op compile+RTT over the
    # axon tunnel (bench r5 phase receipt), vs one cached program
    return _prepare_eval_params_jit(dict(params), np.dtype(param_dtype))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_otpose(key, spec: OTPoseSpec):
    """Fresh params/state with the reference init (ref: OTPose.py:431-475):
    conv2d normal std=0.001 / bias 0, BN 1/0, deform-conv weights identity
    filler, conv1d torch-default with zero bias.

    Jitted as ONE program ON THE HOST CPU BACKEND, then shipped to the
    default device in one batched transfer.  Rationale (r5 receipts,
    STATUS.md): the eager op-by-op init dispatches ~900 tiny ops that each
    compile separately — ~150 s over the axon tunnel — and compiling the
    single init program on the TPU took ~340 s cold with axon cache keys
    that can drift between sessions; the CPU compile is local,
    deterministic, persistently cached, and the one ~250 MB transfer is
    seconds.  Values match the eager build to float reassociation
    (~1e-10)."""
    target = jax.config.jax_default_device
    if target is None:
        target = jax.local_devices()[0]
    if target.platform == "cpu":
        # CPU-default (tests, dryrun): eager, exactly as before round 5 —
        # per-op compiles are SHARED across the many distinct tiny test
        # specs, while a jitted init would pay a fresh whole-program
        # compile per spec
        return _init_otpose_impl(key, spec)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:  # no host CPU backend: compile on the target
        return _init_otpose_jit(key, spec)
    with jax.default_device(cpu):
        params, state = _init_otpose_jit(key, spec)
    return jax.device_put((params, state), target)


def _init_otpose_impl(key, spec: OTPoseSpec):
    kg = KeyGen(key)
    params: dict = {}
    state: dict = {}

    hp, hs = init_hrnet(kg(), spec.hrnet)
    params.update({f"rough_pose_estimation_net.{k}": v for k, v in hp.items()})
    state.update({f"rough_pose_estimation_net.{k}": v for k, v in hs.items()})

    for name, cspec in (("temporal_encoder1", spec.temporal_spec()),
                        ("temporal_encoder2", spec.temporal_spec()),
                        ("flow_encoder", spec.flow_spec())):
        cp, cs = init_conv_transformer(kg(), cspec)
        params.update({f"{name}.{k}": v for k, v in cp.items()})
        state.update({f"{name}.{k}": v for k, v in cs.items()})

    d = spec.temporal_encoding_dim * (spec.scale_arch[-1] + 1)
    k = spec.hrnet.final_conv_kernel
    for name in ("final_layer1", "final_layer2"):
        params[f"{name}.weight"] = core.normal_init(kg(), (k, k, d, spec.num_joints))
        params[f"{name}.bias"] = jnp.zeros((spec.num_joints,))

    j = spec.num_joints
    rp, rs = rsb.init_chain_rsb_blocks(kg(), "", j, j, spec.offset_mask_combine_blocks)
    params.update({f"def_fuse.{kk}": v for kk, v in rp.items()})
    state.update({f"def_fuse.{kk}": v for kk, v in rs.items()})
    rp, rs = rsb.init_chain_rsb_blocks(kg(), "", j * 3, spec.def_ch,
                                       spec.offset_mask_combine_blocks)
    params.update({f"offset_mask_combine_conv.{kk}": v for kk, v in rp.items()})
    state.update({f"offset_mask_combine_conv.{kk}": v for kk, v in rs.items()})

    for d_idx, _dilation in enumerate(spec.dilations):
        params[f"offsets_list.{d_idx}.0.weight"] = core.normal_init(
            kg(), (3, 3, spec.def_ch, j * 2 * 9))
        params[f"masks_list.{d_idx}.0.weight"] = core.normal_init(
            kg(), (3, 3, spec.def_ch, j * 9))
        params[f"modulated_deform_conv_list.{d_idx}.deform_conv.weight"] = \
            identity_filler_weight(j, 3)
        params[f"modulated_deform_conv_list.{d_idx}.deform_conv.bias"] = jnp.zeros((j,))
    return params, state


# one wrapper for the process so repeat calls hit the jit trace cache
# (a fresh jax.jit per call would re-trace every time)
_init_otpose_jit = jax.jit(_init_otpose_impl, static_argnums=1)


@functools.partial(jax.jit, static_argnums=1)
def _prepare_eval_params_jit(params, param_dtype):
    return {k: v.astype(param_dtype)
            if v.ndim >= 2 and v.dtype == jnp.float32 else v
            for k, v in params.items()}


def make_sine_position_embedding(pe_h: int, pe_w: int, d_model: int,
                                 temperature: float = 10000,
                                 scale: float = 2 * np.pi) -> jnp.ndarray:
    """2-D sine position embedding (1, H*W, d_model).

    API-parity helper (ref: OTPose.py:281-305 — defined there but never
    invoked; provided for users who enabled it downstream).
    """
    area = np.ones((1, pe_h, pe_w), np.float32)
    y_embed = area.cumsum(1)
    x_embed = area.cumsum(2)
    one_direction = d_model // 2
    eps = 1e-6
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = np.arange(one_direction, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / one_direction)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])],
                     axis=4).reshape(1, pe_h, pe_w, -1)
    pos_y = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])],
                     axis=4).reshape(1, pe_h, pe_w, -1)
    pos = np.concatenate([pos_y, pos_x], axis=3)
    return jnp.asarray(pos.reshape(1, pe_h * pe_w, d_model))


def make_learnable_position_embedding(key, num_patches: int, dim: int) -> jnp.ndarray:
    """Learnable PE parameter (ref: OTPose.py:266-271)."""
    return jax.random.normal(key, (1, num_patches, dim))
