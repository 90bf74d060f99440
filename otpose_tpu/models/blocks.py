"""Conv-transformer building blocks.

Replicates the reference block semantics exactly (ref: model/blocks.py).
A deliberate behavioral quirk of the reference is preserved because trained
checkpoints depend on it: ``MaskedMHCA`` reshapes q/k/v to (B, nh, hs, T)
WITHOUT transposing (ref: blocks.py:427-429), so the attention matrix is
(hs x hs) over the per-head *channel* axis rather than (T x T) over tokens,
and the output reshape (ref: blocks.py:447) interleaves (T, hs) when mapping
back to (B, C, T).  This makes the attention cost O(hs^2 * T) — tiny on TPU —
while the surrounding depthwise convs carry the sequence mixing.

Activations here are (B, T, C); 1x1 convs are dense matmuls on the MXU.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from otpose_tpu.models import core
from otpose_tpu.models.core import Ctx, gelu, max_pool1d


def get_sinusoid_encoding(n_position: int, d_hid: int) -> np.ndarray:
    """Sinusoid PE table, returned as (1, T, C) (ref: blocks.py:114-125,
    which returns the torch layout (1, C, T))."""
    pos = np.arange(n_position, dtype=np.float64)[:, None]
    j = np.arange(d_hid, dtype=np.float64)[None, :]
    angle = pos / np.power(10000, 2 * (j // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)[None]


def _qkv_supported(t: int) -> bool:
    from otpose_tpu.ops.pallas.fused_attn import fused_attn_supported
    return fused_attn_supported(t)


def _dense_1x1(ctx: Ctx, name: str, x: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv1d == dense over channels. Kernel stored (1, C_in, C_out)."""
    w = ctx.param(f"{name}.weight")[0]
    y = jnp.einsum("btc,cd->btd", x.astype(ctx.compute_dtype), w.astype(ctx.compute_dtype),
                   preferred_element_type=core._preferred(ctx.compute_dtype),
                   precision=core._mxu_precision(ctx.compute_dtype)).astype(x.dtype)
    b = ctx.params.get(ctx._key(f"{name}.bias"))
    # cast the f32 bias param: y + f32 would silently promote the whole
    # downstream activation chain to f32 in bf16 mode
    return y + b.astype(y.dtype) if b is not None else y


def masked_mhca(ctx: Ctx, x: jnp.ndarray, n_head: int, stride: int = 1,
                attn_pdrop: float = 0.0, proj_pdrop: float = 0.0) -> jnp.ndarray:
    """Multi-head conv 'attention' (ref: blocks.py:319-453). x: (B, T, C)."""
    b, t, c = x.shape
    hs = c // n_head
    scale = 1.0 / np.sqrt(hs)

    # depthwise convs (k=3, stride s, pad 1) + channel LN
    q = ctx.conv1d("query_conv", x, stride=stride, padding=1, groups=c)
    q = ctx.layer_norm_c("query_norm", q)
    k = ctx.conv1d("key_conv", x, stride=stride, padding=1, groups=c)
    k = ctx.layer_norm_c("key_norm", k)
    v = ctx.conv1d("value_conv", x, stride=stride, padding=1, groups=c)
    v = ctx.layer_norm_c("value_norm", v)

    # 1x1 projections
    q = _dense_1x1(ctx, "query", q)
    k = _dense_1x1(ctx, "key", k)
    v = _dense_1x1(ctx, "value", v)

    tq = q.shape[1]
    # (B, T', C) -> (B, nh, hs, T')  [the reference's non-transposed view]
    qh = q.transpose(0, 2, 1).reshape(b, n_head, hs, tq)
    kh = k.transpose(0, 2, 1).reshape(b, n_head, hs, tq)
    vh = v.transpose(0, 2, 1).reshape(b, n_head, hs, tq)

    att = jnp.einsum("bhct,bhdt->bhcd", qh * scale, kh,
                     preferred_element_type=core._preferred(ctx.compute_dtype),
                     precision=core._mxu_precision(ctx.compute_dtype)).astype(jnp.float32)
    att = jnp.exp(att - jnp.max(att, axis=-1, keepdims=True))
    att = att / jnp.sum(att, axis=-1, keepdims=True)
    att = ctx.dropout(att.astype(x.dtype), attn_pdrop)
    out = jnp.einsum("bhcd,bhdt->bhct", att.astype(x.dtype), vh,
                     preferred_element_type=core._preferred(ctx.compute_dtype),
                     precision=core._mxu_precision(ctx.compute_dtype)).astype(x.dtype)

    # the reference's scrambled re-assembly: (B, nh, hs, T') -transpose->
    # (B, nh, T', hs) -row-major view-> (B, C, T') (ref: blocks.py:447)
    out = out.transpose(0, 1, 3, 2).reshape(b, c, tq)
    out = out.transpose(0, 2, 1)  # back to (B, T', C)

    out = _dense_1x1(ctx, "proj", out)
    return ctx.dropout(out, proj_pdrop)


def affine_drop_path(ctx: Ctx, name: str, x: jnp.ndarray, drop_prob: float) -> jnp.ndarray:
    """Per-channel scale (init 1e-4) + stochastic depth (ref: blocks.py:283-298).
    When the block was built with path_pdrop=0 the scale param is absent
    (torch nn.Identity) and this is a no-op."""
    if not ctx.has(f"{name}.scale"):
        return x
    scale = ctx.param(f"{name}.scale").astype(x.dtype)  # f32 param would promote
    return ctx.drop_path(x * scale, drop_prob)


def transformer_block(ctx: Ctx, x: jnp.ndarray, n_head: int, *,
                      ds_stride: int = 1, attn_pdrop: float = 0.0,
                      proj_pdrop: float = 0.0, path_pdrop: float = 0.0,
                      mha_win_size: int = -1, use_rel_pe: bool = False) -> jnp.ndarray:
    """Pre-LN transformer block with conv attention (ref: blocks.py:185-280).

    x: (B, T, C) -> (B, T/ds_stride, C).  ``mha_win_size > 1`` selects the
    Longformer-style local attention (ref: blocks.py:212-231).
    """
    normed = ctx.layer_norm_c("ln1", x)
    if mha_win_size > 1:
        out = local_masked_mhca(ctx.sub("attn"), normed, n_head,
                                window_size=mha_win_size, stride=ds_stride,
                                attn_pdrop=attn_pdrop, proj_pdrop=proj_pdrop,
                                use_rel_pe=use_rel_pe)
    else:
        out = masked_mhca(ctx.sub("attn"), normed, n_head,
                          stride=ds_stride, attn_pdrop=attn_pdrop,
                          proj_pdrop=proj_pdrop)
    if ds_stride > 1:
        skip = max_pool1d(x, kernel=ds_stride + 1, stride=ds_stride,
                          padding=(ds_stride + 1) // 2)
    else:
        skip = x
    out = skip + affine_drop_path(ctx, "drop_path_attn", out, path_pdrop)

    # conv-MLP: dense C->4C, GELU, dropout, dense 4C->C, dropout
    h = ctx.layer_norm_c("ln2", out)
    h = _dense_1x1(ctx, "mlp.0", h)
    h = ctx.dropout(gelu(h), proj_pdrop)
    h = _dense_1x1(ctx, "mlp.3", h)
    h = ctx.dropout(h, proj_pdrop)
    out = out + affine_drop_path(ctx, "drop_path_mlp", h, path_pdrop)
    return out


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _add_ln(params, key: str, ch: int):
    params[f"{key}.weight"] = jnp.ones((ch,))
    params[f"{key}.bias"] = jnp.zeros((ch,))


def init_transformer_block(params, kg: core.KeyGen, prefix: str, n_embd: int,
                           path_pdrop: float = 0.0):
    """Parameters for one TransformerBlock; torch-default conv1d init with
    bias zeroed where the reference zeroes it (ref: ConvVideoTransformer.py:116-120)."""
    p = prefix
    _add_ln(params, f"{p}.ln1", n_embd)
    _add_ln(params, f"{p}.ln2", n_embd)
    a = f"{p}.attn"
    for name in ("query_conv", "key_conv", "value_conv"):
        params[f"{a}.{name}.weight"] = core.kaiming_uniform_conv(kg(), (3, 1, n_embd))
    for name in ("query_norm", "key_norm", "value_norm"):
        _add_ln(params, f"{a}.{name}", n_embd)
    for name in ("query", "key", "value", "proj"):
        params[f"{a}.{name}.weight"] = core.kaiming_uniform_conv(kg(), (1, n_embd, n_embd))
        params[f"{a}.{name}.bias"] = jnp.zeros((n_embd,))
    params[f"{p}.mlp.0.weight"] = core.kaiming_uniform_conv(kg(), (1, n_embd, 4 * n_embd))
    params[f"{p}.mlp.0.bias"] = jnp.zeros((4 * n_embd,))
    params[f"{p}.mlp.3.weight"] = core.kaiming_uniform_conv(kg(), (1, 4 * n_embd, n_embd))
    params[f"{p}.mlp.3.bias"] = jnp.zeros((n_embd,))
    if path_pdrop > 0.0:
        params[f"{p}.drop_path_attn.scale"] = 1e-4 * jnp.ones((n_embd,))
        params[f"{p}.drop_path_mlp.scale"] = 1e-4 * jnp.ones((n_embd,))


def local_masked_mhca(ctx: Ctx, x: jnp.ndarray, n_head: int, window_size: int,
                      stride: int = 1, attn_pdrop: float = 0.0,
                      proj_pdrop: float = 0.0, use_rel_pe: bool = False) -> jnp.ndarray:
    """Sliding-window (Longformer-style) local attention.

    ref: blocks.py:479-833 (LocalMaskedMHCA).  Unlike ``masked_mhca``, the
    reference transposes q/k/v properly here (ref: blocks.py:784-790), so
    this IS token attention over a +-w window.  The reference realizes the
    band with as_strided chunk tricks; on TPU we express the same band
    directly as 2w+1 shifted dot products — static shapes, no gathers, and
    XLA fuses the shifts.  Edge positions are masked with -inf before the
    softmax exactly like `_mask_invalid_locations` (ref: blocks.py:613-625).
    """
    b, t, c = x.shape
    hs = c // n_head
    scale = 1.0 / np.sqrt(hs)
    w = window_size // 2

    q = ctx.layer_norm_c("query_norm", ctx.conv1d("query_conv", x, stride=stride,
                                                  padding=1, groups=c))
    k = ctx.layer_norm_c("key_norm", ctx.conv1d("key_conv", x, stride=stride,
                                                padding=1, groups=c))
    v = ctx.layer_norm_c("value_norm", ctx.conv1d("value_conv", x, stride=stride,
                                                  padding=1, groups=c))
    q = _dense_1x1(ctx, "query", q)
    k = _dense_1x1(ctx, "key", k)
    v = _dense_1x1(ctx, "value", v)

    tq = q.shape[1]
    qh = (q * scale).reshape(b, tq, n_head, hs).transpose(0, 2, 1, 3)  # (B,nh,T,hs)
    kh = k.reshape(b, tq, n_head, hs).transpose(0, 2, 1, 3)
    vh = v.reshape(b, tq, n_head, hs).transpose(0, 2, 1, 3)

    # banded scores: att[..., t, d] = q_t . k_{t+d-w}, d in [0, 2w]
    idx = jnp.arange(tq)
    scores = []
    for d in range(-w, w + 1):
        shifted = jnp.roll(kh, -d, axis=2)
        s = jnp.einsum("bhtd,bhtd->bht", qh, shifted,
                       preferred_element_type=core._preferred(ctx.compute_dtype),
                       precision=core._mxu_precision(ctx.compute_dtype)).astype(jnp.float32)
        valid = (idx + d >= 0) & (idx + d < tq)
        s = jnp.where(valid[None, None, :], s, -jnp.inf)
        scores.append(s)
    att = jnp.stack(scores, axis=-1)                     # (B, nh, T, 2w+1)

    if use_rel_pe and ctx.has("rel_pe"):
        # stored (1, 1, nh, window) in torch -> converter flattens 3-dim LN-
        # like shapes only for (1,C,1); rel_pe stays (1,1,nh,window)
        rel = ctx.param("rel_pe")
        att = att + jnp.transpose(rel, (0, 2, 1, 3))     # (1, nh, 1, 2w+1)

    att = att - jnp.max(att, axis=-1, keepdims=True)
    att = jnp.exp(att)
    att = att / jnp.sum(att, axis=-1, keepdims=True)
    att = ctx.dropout(att.astype(x.dtype), attn_pdrop)

    out = jnp.zeros_like(qh)
    for j, d in enumerate(range(-w, w + 1)):
        shifted_v = jnp.roll(vh, -d, axis=2)
        out = out + att[..., j:j + 1] * shifted_v

    out = out.transpose(0, 2, 1, 3).reshape(b, tq, c)
    out = _dense_1x1(ctx, "proj", out)
    return ctx.dropout(out, proj_pdrop)


# ---------------------------------------------------------------------------
# (B, C, T) layout variants
#
# The flagship token geometry is T=6912 (=54*128 lanes, perfectly tiled) and
# C=136 (=17*8 sublanes); the (B, T, C) layout instead pads C to 2 lane tiles
# (53% utilization) for every elementwise op and pays 4 transposes of a
# ~30 MB tensor per attention block.  These variants keep channels on
# sublanes end-to-end: the head split (B, C, T) -> (B, nh, hs, T) is a free
# reshape and the reference's scrambled reassembly needs one transpose
# instead of three.  Same params, same math, measured ~5% faster per encoder
# (see STATUS.md round-2 perf log).
# ---------------------------------------------------------------------------

def _dense_1x1_ct(ctx: Ctx, name: str, x: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv1d on (B, C, T): dense over the channel (sublane) axis."""
    w = ctx.param(f"{name}.weight")[0]
    y = jnp.einsum("bct,cd->bdt", x.astype(ctx.compute_dtype),
                   w.astype(ctx.compute_dtype),
                   preferred_element_type=core._preferred(ctx.compute_dtype),
                   precision=core._mxu_precision(ctx.compute_dtype)).astype(x.dtype)
    b = ctx.params.get(ctx._key(f"{name}.bias"))
    return y + b.astype(y.dtype)[:, None] if b is not None else y


def masked_mhca_ct(ctx: Ctx, x: jnp.ndarray, n_head: int, stride: int = 1,
                   attn_pdrop: float = 0.0, proj_pdrop: float = 0.0) -> jnp.ndarray:
    """``masked_mhca`` on (B, C, T) (ref: blocks.py:319-453)."""
    b, c, t = x.shape
    hs = c // n_head
    scale = 1.0 / np.sqrt(hs)

    q = ctx.layer_norm_ct("query_norm",
                          core.depthwise_conv1d_k3_ct(
                              x, ctx.param("query_conv.weight"), stride=stride))
    k = ctx.layer_norm_ct("key_norm",
                          core.depthwise_conv1d_k3_ct(
                              x, ctx.param("key_conv.weight"), stride=stride))
    v = ctx.layer_norm_ct("value_norm",
                          core.depthwise_conv1d_k3_ct(
                              x, ctx.param("value_conv.weight"), stride=stride))
    q = _dense_1x1_ct(ctx, "query", q)
    k = _dense_1x1_ct(ctx, "key", k)
    v = _dense_1x1_ct(ctx, "value", v)
    return _mhca_tail_ct(ctx, q, k, v, n_head,
                         attn_pdrop=attn_pdrop, proj_pdrop=proj_pdrop)


def _mhca_tail_ct(ctx: Ctx, q, k, v, n_head: int, *,
                  attn_pdrop: float = 0.0, proj_pdrop: float = 0.0):
    """Channel attention + proj on projected q/k/v (B, C, T')
    (ref: blocks.py:427-453)."""
    b, c, tq = q.shape
    hs = c // n_head
    scale = 1.0 / np.sqrt(hs)
    qh = q.reshape(b, n_head, hs, tq)   # free: C-major already
    kh = k.reshape(b, n_head, hs, tq)
    vh = v.reshape(b, n_head, hs, tq)

    att = jnp.einsum("bhct,bhdt->bhcd", qh * scale, kh,
                     preferred_element_type=core._preferred(ctx.compute_dtype),
                     precision=core._mxu_precision(ctx.compute_dtype)).astype(jnp.float32)
    att = jnp.exp(att - jnp.max(att, axis=-1, keepdims=True))
    att = att / jnp.sum(att, axis=-1, keepdims=True)
    att = ctx.dropout(att.astype(q.dtype), attn_pdrop)
    out = jnp.einsum("bhcd,bhdt->bhct", att.astype(q.dtype), vh,
                     preferred_element_type=core._preferred(ctx.compute_dtype),
                     precision=core._mxu_precision(ctx.compute_dtype)).astype(q.dtype)

    # the reference's scrambled re-assembly (ref: blocks.py:447): one
    # (hs, T') transpose, directly into (B, C, T')
    out = out.transpose(0, 1, 3, 2).reshape(b, c, tq)
    out = _dense_1x1_ct(ctx, "proj", out)
    return ctx.dropout(out, proj_pdrop)


def affine_drop_path_ct(ctx: Ctx, name: str, x: jnp.ndarray,
                        drop_prob: float) -> jnp.ndarray:
    """``affine_drop_path`` with the (C,) scale broadcast over (B, C, T)."""
    if not ctx.has(f"{name}.scale"):
        return x
    scale = ctx.param(f"{name}.scale").astype(x.dtype)[:, None]
    return ctx.drop_path(x * scale, drop_prob)


def transformer_block_ct(ctx: Ctx, x: jnp.ndarray, n_head: int, *,
                         ds_stride: int = 1, attn_pdrop: float = 0.0,
                         proj_pdrop: float = 0.0, path_pdrop: float = 0.0,
                         mha_win_size: int = -1,
                         use_rel_pe: bool = False) -> jnp.ndarray:
    """``transformer_block`` on (B, C, T) -> (B, C, T/ds_stride).

    Local-window levels fall back to the (B, T, C) implementation around a
    transpose pair (no flagship spec uses local windows; the fallback keeps
    the two implementations from diverging).
    """
    fused_ok = (ctx.fused and not ctx.train and ctx.seq_axis is None
                and x.shape[1] >= 32)
    if mha_win_size > 1:
        normed = ctx.layer_norm_ct("ln1", x)
        out = local_masked_mhca(ctx.sub("attn"), normed.transpose(0, 2, 1),
                                n_head, window_size=mha_win_size,
                                stride=ds_stride, attn_pdrop=attn_pdrop,
                                proj_pdrop=proj_pdrop,
                                use_rel_pe=use_rel_pe).transpose(0, 2, 1)
    elif fused_ok and ds_stride == 1 and _qkv_supported(x.shape[-1]):
        # one fused VMEM pass for ln1 + depthwise q/k/v + channel-LN +
        # projections + channel attention (eval only; q/k/v never touch
        # HBM — see ops/pallas/fused_attn.py); only the reference's
        # token/channel-interleaving scramble (ref: blocks.py:447), the
        # 1x1 projection and the residual stay in XLA
        from otpose_tpu.ops.pallas.fused_attn import fused_attn_block_ct
        pre = fused_attn_block_ct(ctx, x, n_head)      # (B, C, T) att @ v
        bb, cc, tt = pre.shape
        hs = cc // n_head
        out = pre.reshape(bb, n_head, hs, tt).transpose(0, 1, 3, 2)
        out = out.reshape(bb, cc, tt)
        a = ctx.sub("attn")
        out = _dense_1x1_ct(a, "proj", out)
        out = a.dropout(out, proj_pdrop)
    else:
        normed = ctx.layer_norm_ct("ln1", x)
        out = masked_mhca_ct(ctx.sub("attn"), normed, n_head,
                             stride=ds_stride, attn_pdrop=attn_pdrop,
                             proj_pdrop=proj_pdrop)
    if ds_stride > 1:
        skip = core.max_pool1d_ct(x, kernel=ds_stride + 1, stride=ds_stride,
                                  padding=(ds_stride + 1) // 2)
    else:
        skip = x
    out = skip + affine_drop_path_ct(ctx, "drop_path_attn", out, path_pdrop)

    if fused_ok:
        # single fused VMEM pass for ln2 + mlp + residual (eval only; see
        # ops/pallas/fused_mlp.py).  Dropout and drop-path are identity at
        # eval; the drop-path scale is folded into the kernel's W2/b2.
        # C >= 32 (fused_ok): at the flow encoder's C=17 the kernels pad to
        # 32 sublanes and measured no reliable win (STATUS.md perf log).
        from otpose_tpu.ops.pallas.fused_mlp import fused_mlp_block_ct
        return fused_mlp_block_ct(ctx, out)

    h = ctx.layer_norm_ct("ln2", out)
    h = _dense_1x1_ct(ctx, "mlp.0", h)
    h = ctx.dropout(gelu(h), proj_pdrop)
    h = _dense_1x1_ct(ctx, "mlp.3", h)
    h = ctx.dropout(h, proj_pdrop)
    out = out + affine_drop_path_ct(ctx, "drop_path_mlp", h, path_pdrop)
    return out


def init_local_transformer_block(params, kg: core.KeyGen, prefix: str, n_embd: int,
                                 n_head: int, window_size: int,
                                 path_pdrop: float = 0.0, use_rel_pe: bool = False):
    """Params for a TransformerBlock using LocalMaskedMHCA."""
    init_transformer_block(params, kg, prefix, n_embd, path_pdrop)
    if use_rel_pe:
        # trunc_normal_(std=sqrt(2/n_embd)) in the reference (blocks.py:580-582)
        std = (2.0 / n_embd) ** 0.5
        params[f"{prefix}.attn.rel_pe"] = core.normal_init(
            kg(), (1, 1, n_head, window_size), std)
