"""ConvTransformer: 1-D conv-transformer over the flattened heatmap grid.

ref: model/ConvVideoTransformer.py:16-185.  The sequence is the row-major
flattened (H, W) grid (T = H*W = 6912 for 96x72 heatmaps).  Architecture is
(#embedding convs, #stem blocks, #branch blocks); each branch block halves T
(strided depthwise q/kv convs + maxpool skip) and its output is linearly
upsampled back to T.  Absolute sinusoid PE scaled by 1/sqrt(C) is added once
(re-interpolated at inference for over-length sequences).

Our layout: feature maps are NHWC, tokens are (B, T, C).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp

from otpose_tpu.models import blocks, core
from otpose_tpu.models.core import Ctx


@dataclasses.dataclass(frozen=True)
class ConvTransformerSpec:
    n_in: int
    n_embd: int
    n_head: int
    n_embd_ks: int
    max_len: int
    arch: Tuple[int, int, int]
    scale_factor: int = 2
    with_ln: bool = True
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    path_pdrop: float = 0.0
    use_abs_pe: bool = True
    mha_win_size: tuple = ()      # per-level window sizes; empty/<=1 => global
    use_rel_pe: bool = False

    @property
    def num_outputs(self) -> int:
        return 1 + self.arch[2]

    def win_size(self, level: int) -> int:
        """Attention window for a pyramid level (-1 = global).  The SINGLE
        source of the level->window mapping — forward and init must agree
        or local-attention params (rel_pe, window tables) mismatch."""
        if not self.mha_win_size:
            return -1
        return self.mha_win_size[min(level, len(self.mha_win_size) - 1)]


def conv_transformer_forward(ctx: Ctx, x: jnp.ndarray,
                             spec: ConvTransformerSpec,
                             out_layout: str = "tc",
                             upsample: bool = True) -> List[jnp.ndarray]:
    """x: (B, H, W, C_in) feature map -> list of token maps
    (1 stem output + arch[2] upsampled branch outputs)
    (ref: ConvVideoTransformer.py:123-185).

    ``out_layout``: "tc" returns (B, T, C) tensors (the reference's
    ``permute``d view); "ct" returns (B, C, T).  The blocks run in the
    (B, C, T) layout internally either way — T=H*W lands on the 128-lane
    axis fully tiled while C=136/17 would waste ~half of it — so "ct"
    (used by ``otpose_forward``) also skips the exit transposes.

    ``upsample=False`` returns the branch outputs at their native strided
    lengths (T/2, T/4, ...) instead of linearly upsampling each back to T
    (ref: ConvVideoTransformer.py:172-179).  Callers that consume the
    outputs through a 1x1 conv can commute the conv with the (linear)
    upsampling and interpolate the much smaller result instead — see
    ``otpose._final_layer_ct``.
    """
    b, h, w, _ = x.shape
    t = h * w

    # embedding convs (2-D conv + channel LN + relu); arch[0] == 0 for OTPose
    for i in range(spec.arch[0]):
        x = ctx.conv2d(f"embd.{i}", x, padding=spec.n_embd_ks // 2,
                       bias=not spec.with_ln)
        tokens = x.reshape(b, t, -1)
        if spec.with_ln:
            tokens = ctx.layer_norm_c(f"embd_norm.{i}", tokens)
        x = core.relu(tokens).reshape(b, h, w, -1)

    tokens = x.transpose(0, 3, 1, 2).reshape(b, spec.n_embd, t)  # (B, C, T)

    def _seq_shard(z, spec_t=None):
        """Sequence parallelism (no reference counterpart; SURVEY §5): shard
        the token axis over ctx.seq_axis.  XLA SPMD inserts the halo
        exchanges for the depthwise convs / pools and the psums for the
        channel-attention T-contraction; the exit constraint gathers T back
        so the rest of the model stays purely data-parallel."""
        if ctx.seq_axis is None:
            return z
        from jax.sharding import PartitionSpec as P
        return jax.lax.with_sharding_constraint(
            z, P("data", None, spec_t))

    tokens = _seq_shard(tokens, ctx.seq_axis)

    if spec.use_abs_pe:
        pe = ctx.state[ctx._key("pos_embd")]  # (1, max_len, C), f32
        if ctx.train:
            assert t <= spec.max_len, "Reached max length."
        elif t >= spec.max_len:
            pe = core.interpolate_linear_to(pe, t)
        # add in f32, round back ONCE: without the cast the f32 PE buffer
        # silently promotes bf16 tokens to f32 and the whole encoder (and
        # every consumer downstream) runs f32 elementwise ops — 2x the HBM
        # traffic of the intended bf16 activation path
        tokens = (tokens + pe[:, :t].transpose(0, 2, 1)).astype(x.dtype)

    _win = spec.win_size

    for i in range(spec.arch[1]):
        tokens = blocks.transformer_block_ct(
            ctx.sub(f"stem.{i}"), tokens, spec.n_head,
            attn_pdrop=spec.attn_pdrop, proj_pdrop=spec.proj_pdrop,
            path_pdrop=spec.path_pdrop, mha_win_size=_win(0),
            use_rel_pe=spec.use_rel_pe)

    out_feats = [tokens]
    for i in range(spec.arch[2]):
        tokens = blocks.transformer_block_ct(
            ctx.sub(f"branch.{i}"), tokens, spec.n_head,
            ds_stride=spec.scale_factor,
            attn_pdrop=spec.attn_pdrop, proj_pdrop=spec.proj_pdrop,
            path_pdrop=spec.path_pdrop, mha_win_size=_win(1 + i),
            use_rel_pe=spec.use_rel_pe)
        out_feats.append(core.upsample_linear_1d_ct(tokens, t)
                         if upsample else tokens)
    out_feats = [_seq_shard(f, None) for f in out_feats]  # gather T back
    if out_layout == "ct":
        return out_feats
    return [f.transpose(0, 2, 1) for f in out_feats]


def init_conv_transformer(key, spec: ConvTransformerSpec):
    """Fresh params/state (PE buffer) for a ConvTransformer."""
    kg = core.KeyGen(key)
    params: dict = {}
    state: dict = {}
    if spec.use_abs_pe:
        pe = blocks.get_sinusoid_encoding(spec.max_len, spec.n_embd) / (spec.n_embd ** 0.5)
        state["pos_embd"] = jnp.asarray(pe)
    for i in range(spec.arch[0]):
        cin = spec.n_in if i == 0 else spec.n_embd
        k = spec.n_embd_ks
        params[f"embd.{i}.weight"] = core.normal_init(kg(), (k, k, cin, spec.n_embd))
        if not spec.with_ln:
            params[f"embd.{i}.bias"] = jnp.zeros((spec.n_embd,))
        if spec.with_ln:
            blocks._add_ln(params, f"embd_norm.{i}", spec.n_embd)
    _win = spec.win_size

    for i in range(spec.arch[1]):
        if _win(0) > 1:
            blocks.init_local_transformer_block(params, kg, f"stem.{i}",
                                                spec.n_embd, spec.n_head,
                                                _win(0), spec.path_pdrop,
                                                spec.use_rel_pe)
        else:
            blocks.init_transformer_block(params, kg, f"stem.{i}", spec.n_embd,
                                          spec.path_pdrop)
    for i in range(spec.arch[2]):
        if _win(1 + i) > 1:
            blocks.init_local_transformer_block(params, kg, f"branch.{i}",
                                                spec.n_embd, spec.n_head,
                                                _win(1 + i), spec.path_pdrop,
                                                spec.use_rel_pe)
        else:
            blocks.init_transformer_block(params, kg, f"branch.{i}", spec.n_embd,
                                          spec.path_pdrop)
    return params, state
