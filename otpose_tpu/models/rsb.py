"""Residual Steps Network (RSN) bottleneck blocks.

ref: model/RSB.py:10-139.  Each block expands to 4 branches of
``branch_ch = in_planes * 26 // 64`` channels, runs a cascade of 3x3 convs
with cross-branch additive connections, concatenates and projects back with
a residual.  ``chain_rsb_blocks`` chains N of them with a 1x1 downsample on
the first.
"""

from __future__ import annotations

import jax.numpy as jnp

from otpose_tpu.models import core
from otpose_tpu.models.core import Ctx, KeyGen, relu


def _conv_bn_relu(ctx: Ctx, name: str, x: jnp.ndarray, *, kernel: int, padding: int,
                  has_relu: bool = True) -> jnp.ndarray:
    """conv (with bias) + BN [+ relu] (ref: model/RSB.py:106-139).
    ``kernel`` documents intent at the call site; the conv geometry itself
    comes from the stored weight — assert they agree so an edit to one
    can't silently diverge from the other."""
    sub = ctx.sub(name)
    assert sub.param("conv.weight").shape[0] == kernel, name
    y = sub.conv2d("conv", x, padding=padding)
    y = sub.batch_norm("bn", y)
    return relu(y) if has_relu else y


def _pair_cbr(ctx: Ctx, name_a: str, xa: jnp.ndarray, name_b: str,
              xb: jnp.ndarray, bc: int):
    """Two independent 3x3 branch convs at the same cascade depth as ONE
    conv: inputs concatenated on channels, weights block-diagonal.  The
    off-diagonal zeros cost negligible FLOPs at branch_ch<=20 channels while
    halving the kernel count — on v5e every small conv costs a fixed
    ~0.4 ms of launch/latency regardless of width (STATUS.md perf log)."""
    wa = ctx.param(f"{name_a}.conv.weight")
    wb = ctx.param(f"{name_b}.conv.weight")
    w = jnp.zeros((3, 3, 2 * bc, 2 * bc), wa.dtype)
    w = w.at[:, :, :bc, :bc].set(wa).at[:, :, bc:, bc:].set(wb)
    bias = jnp.concatenate([ctx.param(f"{name_a}.conv.bias"),
                            ctx.param(f"{name_b}.conv.bias")])
    y = core.conv2d(jnp.concatenate([xa, xb], axis=-1), w, bias, padding=1,
                    compute_dtype=ctx.compute_dtype)
    y = core.batch_norm_multi(ctx, [f"{name_a}.bn", f"{name_b}.bn"],
                              [bc, bc], y)
    y = relu(y)
    return y[..., :bc], y[..., bc:]


def rsb_block(ctx: Ctx, x: jnp.ndarray, in_planes: int, planes: int,
              has_downsample: bool) -> jnp.ndarray:
    """ref: model/RSB.py:77-103.

    The 4-branch cascade is evaluated depth-by-depth with independent convs
    at equal depth merged into block-diagonal pairs (`_pair_cbr`), and the
    expand conv merged with the residual downsample (same input).  13 convs
    become 9; the math is unchanged (independent channel groups)."""
    branch_ch = in_planes * 26 // 64
    if has_downsample:
        # conv_bn_relu1 and the downsample read the SAME input -> one conv
        w = jnp.concatenate([ctx.param("conv_bn_relu1.conv.weight"),
                             ctx.param("downsample.conv.weight")], axis=-1)
        bias = jnp.concatenate([ctx.param("conv_bn_relu1.conv.bias"),
                                ctx.param("downsample.conv.bias")])
        y = core.conv2d(x, w, bias, compute_dtype=ctx.compute_dtype)
        y = core.batch_norm_multi(ctx, ["conv_bn_relu1.bn", "downsample.bn"],
                                  [4 * branch_ch, planes], y)
        out = relu(y[..., :4 * branch_ch])         # downsample has no relu
        residual = y[..., 4 * branch_ch:]
    else:
        out = _conv_bn_relu(ctx, "conv_bn_relu1", x, kernel=1, padding=0)
        residual = x
    spx = [out[..., i * branch_ch:(i + 1) * branch_ch] for i in range(4)]

    out_1_1 = _conv_bn_relu(ctx, "conv_bn_relu2_1_1", spx[0], kernel=3, padding=1)
    out_2_1 = _conv_bn_relu(ctx, "conv_bn_relu2_2_1", spx[1] + out_1_1, kernel=3, padding=1)
    out_2_2, out_3_1 = _pair_cbr(ctx, "conv_bn_relu2_2_2", out_2_1,
                                 "conv_bn_relu2_3_1", spx[2] + out_2_1, branch_ch)
    out_3_2, out_4_1 = _pair_cbr(ctx, "conv_bn_relu2_3_2", out_3_1 + out_2_2,
                                 "conv_bn_relu2_4_1", spx[3] + out_3_1, branch_ch)
    out_3_3, out_4_2 = _pair_cbr(ctx, "conv_bn_relu2_3_3", out_3_2,
                                 "conv_bn_relu2_4_2", out_4_1 + out_3_2, branch_ch)
    out_4_3 = _conv_bn_relu(ctx, "conv_bn_relu2_4_3", out_4_2 + out_3_3, kernel=3, padding=1)
    out_4_4 = _conv_bn_relu(ctx, "conv_bn_relu2_4_4", out_4_3, kernel=3, padding=1)

    out = jnp.concatenate([out_1_1, out_2_2, out_3_3, out_4_4], axis=-1)
    out = _conv_bn_relu(ctx, "conv_bn_relu3", out, kernel=1, padding=0, has_relu=False)
    return relu(out + residual)


def chain_rsb_blocks(ctx: Ctx, x: jnp.ndarray, in_planes: int, out_planes: int,
                     num_blocks: int) -> jnp.ndarray:
    """ref: model/RSB.py:10-23 (note: the 1x1 downsample exists on block 0
    even when in_planes == out_planes)."""
    for i in range(num_blocks):
        sub = ctx.sub(f"layers.{i}")
        if i == 0:
            x = rsb_block(sub, x, in_planes, out_planes, has_downsample=True)
        else:
            x = rsb_block(sub, x, out_planes, out_planes, has_downsample=False)
    return x


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_cbr(params, state, kg: KeyGen, prefix: str, cin: int, cout: int, kernel: int):
    params[f"{prefix}.conv.weight"] = core.normal_init(kg(), (kernel, kernel, cin, cout))
    params[f"{prefix}.conv.bias"] = jnp.zeros((cout,))
    params[f"{prefix}.bn.weight"] = jnp.ones((cout,))
    params[f"{prefix}.bn.bias"] = jnp.zeros((cout,))
    state[f"{prefix}.bn.running_mean"] = jnp.zeros((cout,))
    state[f"{prefix}.bn.running_var"] = jnp.ones((cout,))


def _init_rsb_block(params, state, kg, prefix, in_planes, planes, has_downsample):
    branch_ch = in_planes * 26 // 64
    _init_cbr(params, state, kg, f"{prefix}.conv_bn_relu1", in_planes, 4 * branch_ch, 1)
    for name in ("2_1_1", "2_2_1", "2_2_2", "2_3_1", "2_3_2", "2_3_3",
                 "2_4_1", "2_4_2", "2_4_3", "2_4_4"):
        _init_cbr(params, state, kg, f"{prefix}.conv_bn_relu{name}", branch_ch, branch_ch, 3)
    _init_cbr(params, state, kg, f"{prefix}.conv_bn_relu3", 4 * branch_ch, planes, 1)
    if has_downsample:
        _init_cbr(params, state, kg, f"{prefix}.downsample", in_planes, planes, 1)


def init_chain_rsb_blocks(key, prefix: str, in_planes: int, out_planes: int,
                          num_blocks: int):
    kg = KeyGen(key)
    params: dict = {}
    state: dict = {}
    for i in range(num_blocks):
        p = f"{prefix}layers.{i}" if prefix else f"layers.{i}"
        if i == 0:
            _init_rsb_block(params, state, kg, p, in_planes, out_planes, True)
        else:
            _init_rsb_block(params, state, kg, p, out_planes, out_planes, False)
    return params, state
