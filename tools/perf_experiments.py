"""Variant micro-benchmarks for perf hypotheses (device traces are not
capturable over the axon tunnel, so hypotheses are tested by timing modified
forwards).  Results recorded in STATUS.md.

Usage: python tools/perf_experiments.py --exp hrnet_bn --batch 16
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def fence(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(jax.device_get(leaf.ravel()[0])))


def timeit(fn, args, iters=10):
    fence(fn(*args))
    fence(fn(*args))
    t0 = time.perf_counter()
    outs = None
    for _ in range(iters):
        outs = fn(*args)
    fence(outs)
    return (time.perf_counter() - t0) / iters


def exp_hrnet_bn(batch, iters):
    """Eval BN cost in HRNet: baseline vs BN-as-identity vs BN folded."""
    import jax
    import jax.numpy as jnp

    from otpose_tpu.models.core import Ctx
    from otpose_tpu.models import core
    from otpose_tpu.models.hrnet import hrnet_forward
    from otpose_tpu.models.otpose import OTPoseSpec, init_otpose
    from otpose_tpu.utils.testing import flagship_otpose_cfg

    spec = OTPoseSpec.from_cfg(flagship_otpose_cfg())
    params, state = init_otpose(jax.random.PRNGKey(0), spec)
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    x = jnp.asarray(np.random.RandomState(0).randn(5 * batch, 384, 288, 3), dt)

    def base(params, state, x):
        ctx = Ctx(params, state, train=False, compute_dtype=dt)
        return hrnet_forward(ctx.sub("rough_pose_estimation_net"), x, spec.hrnet)

    print(f"hrnet base        {timeit(jax.jit(base), (params, state, x), iters)*1e3:8.2f} ms")

    orig_bn = Ctx.batch_norm
    try:
        Ctx.batch_norm = lambda self, name, y: y
        print(f"hrnet no-BN       {timeit(jax.jit(base), (params, state, x), iters)*1e3:8.2f} ms")
    finally:
        Ctx.batch_norm = orig_bn

    # eval-mode affine in compute dtype (no f32 intermediate)
    def affine_bn(self, name, y):
        key = self._key(name)
        w = self.param(f"{name}.weight")
        b = self.param(f"{name}.bias")
        mean = self.state[f"{key}.running_mean"]
        var = self.state[f"{key}.running_var"]
        inv = jax.lax.rsqrt(var + core.BN_EPS)
        scale = (w * inv).astype(y.dtype)
        shift = (b - mean * inv * w).astype(y.dtype)
        return y * scale + shift

    try:
        Ctx.batch_norm = affine_bn
        print(f"hrnet affine-BN   {timeit(jax.jit(base), (params, state, x), iters)*1e3:8.2f} ms")
    finally:
        Ctx.batch_norm = orig_bn


def exp_mhca(batch, iters):
    """masked_mhca layout: current transposed einsums vs direct (B,T,C) form."""
    import jax
    import jax.numpy as jnp

    from otpose_tpu.models import core
    from otpose_tpu.models.core import Ctx
    from otpose_tpu.models import blocks
    from otpose_tpu.models.conv_transformer import (ConvTransformerSpec,
                                                    conv_transformer_forward,
                                                    init_conv_transformer)

    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    spec = ConvTransformerSpec(n_in=136, n_embd=136, n_head=2, n_embd_ks=3,
                               max_len=6912, arch=(0, 6, 2))
    params, state = init_conv_transformer(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(np.random.RandomState(0).randn(batch, 96, 72, 136), dt)

    def run(params, state, x):
        ctx = Ctx(params, state, train=False, compute_dtype=dt)
        return conv_transformer_forward(ctx, x, spec)[0]

    print(f"temporal base     {timeit(jax.jit(run), (params, state, x), iters)*1e3:8.2f} ms")


def exp_block_parts(batch, iters):
    """Per-op timing inside one temporal transformer block at flagship shape
    (B, T=6912, C=136)."""
    import jax
    import jax.numpy as jnp

    from otpose_tpu.models import core

    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    b, t, c = batch, 6912, 136
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, c), dt)
    wdw = jnp.asarray(rng.randn(3, 1, c), dt)
    w1 = jnp.asarray(rng.randn(c, c) * 0.05, dt)
    wm1 = jnp.asarray(rng.randn(c, 4 * c) * 0.05, dt)
    wm2 = jnp.asarray(rng.randn(4 * c, c) * 0.05, dt)
    g = jnp.ones((c,), jnp.float32)
    be = jnp.zeros((c,), jnp.float32)

    def t_(name, fn, *args):
        ms = timeit(jax.jit(fn), args, iters) * 1e3
        print(f"{name:28s} {ms:8.3f} ms")
        return ms

    t_("depthwise_k3", lambda x: core.depthwise_conv1d_k3(x, wdw), x)
    t_("layer_norm_c", lambda x: core.layer_norm_c(x, g, be), x)
    t_("dense_1x1 CxC", lambda x: jnp.einsum("btc,cd->btd", x, w1,
                                             preferred_element_type=dt), x)
    t_("mlp (C->4C->C)", lambda x: jnp.einsum(
        "bth,hd->btd", jax.nn.gelu(jnp.einsum("btc,ch->bth", x, wm1,
                                              preferred_element_type=dt),
                                   approximate=False), wm2,
        preferred_element_type=dt), x)

    nh, hs = 2, c // 2
    q = jnp.asarray(rng.randn(b, nh, hs, t), dt)

    def attn_cur(q):
        att = jnp.einsum("bhct,bhdt->bhcd", q, q,
                         preferred_element_type=dt).astype(jnp.float32)
        att = jnp.exp(att - jnp.max(att, axis=-1, keepdims=True))
        att = att / jnp.sum(att, axis=-1, keepdims=True)
        out = jnp.einsum("bhcd,bhdt->bhct", att.astype(q.dtype), q,
                         preferred_element_type=dt)
        return out

    t_("attention (channel-axis)", attn_cur, q)
    t_("transpose btc->bct", lambda x: x.transpose(0, 2, 1) + 0.0, x)
    t_("scramble out", lambda q: q.transpose(0, 1, 3, 2).reshape(b, c, t)
       .transpose(0, 2, 1) + 0.0, q)
    t_("maxpool1d k3 s2", lambda x: core.max_pool1d(x, 3, 2, 1), x)
    t_("upsample_linear 2x",
       lambda x: core.upsample_linear_1d(x[:, ::2], t), x)
    t_("add+scale (residual)", lambda x: x + x * g.astype(x.dtype), x)


def exp_wpad(batch, iters):
    """Is the HRNet conv time governed by W (lane) tiling?  Time identical
    3x3 convs at the real branch widths vs zero-padded to the 128-lane tile.
    If time is ~flat in W, the conv is lane-padded internally and a
    keep-at-128 layout (with BN-folded edge masking) would win ~1.8x on br0.
    """
    import jax
    import jax.numpy as jnp

    from otpose_tpu.models import core

    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rng = np.random.RandomState(0)
    b5 = 5 * batch

    cases = [
        ("br0 48ch 96x72 ", (b5, 96, 72, 48), (b5, 96, 128, 48)),
        ("br1 96ch 48x36 ", (b5, 48, 36, 96), (b5, 48, 128, 96)),
        ("br2 192ch 24x18", (b5, 24, 18, 192), (b5, 24, 128, 192)),
        ("br3 384ch 12x9 ", (b5, 12, 9, 384), (b5, 12, 128, 384)),
    ]
    for name, shp, shp_pad in cases:
        c = shp[-1]
        w = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, dt)

        def chain(x, w=w):
            for _ in range(8):
                x = core.conv2d(x, w, padding=1, compute_dtype=dt)
            return x

        for tag, s in (("", shp), ("pad128", shp_pad)):
            x = jnp.asarray(rng.randn(*s), dt)
            ms = timeit(jax.jit(chain), (x,), iters) * 1e3
            gf = 8 * 2 * np.prod(s) * c * 9 / 1e9
            print(f"{name} {tag:7s} {str(s):>22s} {ms:7.2f} ms "
                  f"{gf / ms:6.1f} TF/s")


def exp_s2d(batch, iters):
    """HRNet stem conv1 (3->64, k3 s2 p1, on 384x288x3): MXU-starved (K=27).
    Space-to-depth rewrite: 2x2-block the input to (192,144,12) and apply an
    algebraically identical (2,2,12,64) stride-1 conv with top/left padding 1
    -> K=48 contraction, same math.  Verify exactness + time both."""
    import jax
    import jax.numpy as jnp

    from otpose_tpu.models import core

    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rng = np.random.RandomState(0)
    b5 = 5 * batch
    h, w, cin, cout = 384, 288, 3, 64
    x = jnp.asarray(rng.randn(b5, h, w, cin), dt)
    wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, dt)

    def direct(x):
        return core.conv2d(x, wk, stride=2, padding=1, compute_dtype=dt)

    # kernel transform: out(y,x) = sum_{dy,dx} w[dy,dx] in[2y+dy-1, 2x+dx-1];
    # with I2[a,b,(p,q,c)] = in[2a+p, 2b+q], tap (dy) maps to block a=y-1+A,
    # sub-row p: dy=0 -> (A=0,p=1), dy=1 -> (A=1,p=0), dy=2 -> (A=1,p=1)
    amap = {0: (0, 1), 1: (1, 0), 2: (1, 1)}
    w2 = np.zeros((2, 2, 4 * cin, cout), np.float32)
    wk_f = np.asarray(wk, np.float32)
    for dy in range(3):
        for dx in range(3):
            A, p = amap[dy]
            B, q = amap[dx]
            w2[A, B, (p * 2 + q) * cin:(p * 2 + q + 1) * cin] = wk_f[dy, dx]
    w2 = jnp.asarray(w2, dt)

    def s2d(x):
        b = x.shape[0]
        i2 = x.reshape(b, h // 2, 2, w // 2, 2, cin).transpose(0, 1, 3, 2, 4, 5)
        i2 = i2.reshape(b, h // 2, w // 2, 4 * cin)
        y = jax.lax.conv_general_dilated(
            i2.astype(dt), w2, window_strides=(1, 1),
            padding=[(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt)
        return y

    ya = jax.jit(direct)(x)
    yb = jax.jit(s2d)(x)
    print("maxdiff:", float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                            - yb.astype(jnp.float32)))))
    for r in range(3):
        ms_a = timeit(jax.jit(direct), (x,), iters) * 1e3
        ms_b = timeit(jax.jit(s2d), (x,), iters) * 1e3
        print(f"round {r}: direct {ms_a:7.3f} ms   s2d {ms_b:7.3f} ms")


def exp_ct_layout(batch, iters):
    """(B, C, T) vs (B, T, C) token layout for the conv-transformer.

    Hypothesis: with C=136 (temporal) / C=17 (flow) on the 128-lane axis,
    every elementwise op wastes ~47% / ~87% of the VPU and each block pays
    4 transposes of a ~30 MB tensor; putting T=6912 (=54*128) on lanes and
    C on sublanes (136=17*8) should be strictly better for all non-matmul
    ops and make the attention head-split reshape free.
    """
    import jax
    import jax.numpy as jnp

    from otpose_tpu.models import core
    from otpose_tpu.models.core import Ctx
    from otpose_tpu.models.conv_transformer import (ConvTransformerSpec,
                                                    conv_transformer_forward,
                                                    init_conv_transformer)

    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    def ln_ct(x, w, bs, eps=core.LN_EPS):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=1, keepdims=True)
        res = xf - mu
        sigma = jnp.mean(jnp.square(res), axis=1, keepdims=True)
        out = res / jnp.sqrt(sigma + eps)
        return (out * w[:, None] + bs[:, None]).astype(x.dtype)

    def dw_ct(x, w, stride=1):
        t = x.shape[-1]
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1)))
        w = w.astype(x.dtype)
        w0, w1, w2 = w[0, 0][:, None], w[1, 0][:, None], w[2, 0][:, None]
        if stride == 1:
            return xp[..., 0:t] * w0 + xp[..., 1:t + 1] * w1 + xp[..., 2:t + 2] * w2
        to = (t + 2 - 3) // stride + 1
        end = (to - 1) * stride + 1
        return (xp[..., 0:end:stride][..., :to] * w0
                + xp[..., 1:end + 1:stride][..., :to] * w1
                + xp[..., 2:end + 2:stride][..., :to] * w2)

    def dense_ct(params, name, x):
        w = params[f"{name}.weight"][0]
        y = jnp.einsum("bct,cd->bdt", x.astype(dt), w.astype(dt),
                       preferred_element_type=dt)
        b = params.get(f"{name}.bias")
        return y + b.astype(y.dtype)[:, None] if b is not None else y

    def mhca_ct(params, pfx, x, n_head, stride=1):
        b, c, t = x.shape
        hs = c // n_head
        scale = 1.0 / np.sqrt(hs)
        p = lambda n: params[f"{pfx}.{n}"]  # noqa: E731
        q = ln_ct(dw_ct(x, p("attn.query_conv.weight"), stride),
                  p("attn.query_norm.weight"), p("attn.query_norm.bias"))
        k = ln_ct(dw_ct(x, p("attn.key_conv.weight"), stride),
                  p("attn.key_norm.weight"), p("attn.key_norm.bias"))
        v = ln_ct(dw_ct(x, p("attn.value_conv.weight"), stride),
                  p("attn.value_norm.weight"), p("attn.value_norm.bias"))
        q = dense_ct(params, f"{pfx}.attn.query", q)
        k = dense_ct(params, f"{pfx}.attn.key", k)
        v = dense_ct(params, f"{pfx}.attn.value", v)
        tq = q.shape[-1]
        qh = q.reshape(b, n_head, hs, tq)
        kh = k.reshape(b, n_head, hs, tq)
        vh = v.reshape(b, n_head, hs, tq)
        att = jnp.einsum("bhct,bhdt->bhcd", qh * scale, kh,
                         preferred_element_type=dt).astype(jnp.float32)
        att = jnp.exp(att - jnp.max(att, axis=-1, keepdims=True))
        att = att / jnp.sum(att, axis=-1, keepdims=True)
        out = jnp.einsum("bhcd,bhdt->bhct", att.astype(x.dtype), vh,
                         preferred_element_type=dt)
        out = out.transpose(0, 1, 3, 2).reshape(b, c, tq)  # ref scramble
        return dense_ct(params, f"{pfx}.attn.proj", out)

    def block_ct(params, pfx, x, n_head, ds_stride=1):
        p = lambda n: params[f"{pfx}.{n}"]  # noqa: E731
        normed = ln_ct(x, p("ln1.weight"), p("ln1.bias"))
        out = mhca_ct(params, pfx, normed, n_head, ds_stride)
        if ds_stride > 1:
            skip = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 1, ds_stride + 1),
                window_strides=(1, 1, ds_stride),
                padding=((0, 0), (0, 0),
                         ((ds_stride + 1) // 2, (ds_stride + 1) // 2)))
        else:
            skip = x
        if f"{pfx}.drop_path_attn.scale" in params:
            out = out * p("drop_path_attn.scale").astype(out.dtype)[:, None]
        out = skip + out
        h = ln_ct(out, p("ln2.weight"), p("ln2.bias"))
        h = dense_ct(params, f"{pfx}.mlp.0", h)
        h = core.gelu(h)
        h = dense_ct(params, f"{pfx}.mlp.3", h)
        if f"{pfx}.drop_path_mlp.scale" in params:
            h = h * p("drop_path_mlp.scale").astype(h.dtype)[:, None]
        return out + h

    def up_ct(x, out_t):
        b, c, t = x.shape
        assert out_t % t == 0
        f = out_t // t
        left = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
        right = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)
        phases = []
        for kk in range(f):
            frac = (2 * kk + 1) / (2 * f) - 0.5
            if frac < 0:
                phases.append((-frac) * left + (1 + frac) * x)
            elif frac == 0:
                phases.append(x)
            else:
                phases.append((1 - frac) * x + frac * right)
        out = jnp.stack(phases, axis=-1)                     # (B, C, T, f)
        return out.reshape(b, c, t * f).astype(x.dtype)

    def enc_ct(params, state, xmap, spec):
        b, h, w, _ = xmap.shape
        t = h * w
        x = xmap.transpose(0, 3, 1, 2).reshape(b, spec.n_embd, t)
        pe = state["pos_embd"].transpose(0, 2, 1)  # (1, C, T)
        x = x + pe[..., :t].astype(x.dtype)
        for i in range(spec.arch[1]):
            x = block_ct(params, f"stem.{i}", x, spec.n_head)
        feats = [x]
        for i in range(spec.arch[2]):
            x = block_ct(params, f"branch.{i}", x, spec.n_head,
                         ds_stride=spec.scale_factor)
            feats.append(up_ct(x, t))
        return feats

    for c, nh, arch, tag in ((136, 2, (0, 6, 2), "temporal"),
                             (17, 1, (0, 6, 0), "flow")):
        spec = ConvTransformerSpec(n_in=c, n_embd=c, n_head=nh, n_embd_ks=3,
                                   max_len=6912, arch=arch, path_pdrop=0.1)
        params, state = init_conv_transformer(jax.random.PRNGKey(0), spec)
        rng = np.random.RandomState(0)
        xmap = jnp.asarray(rng.randn(batch, 96, 72, c), dt)

        def run_tc(params, state, xmap, spec=spec):
            ctx = Ctx(params, state, train=False, compute_dtype=dt)
            return conv_transformer_forward(ctx, xmap, spec)

        def run_ct(params, state, xmap, spec=spec):
            return enc_ct(params, state, xmap, spec)

        o_tc = jax.jit(run_tc)(params, state, xmap)
        o_ct = jax.jit(run_ct)(params, state, xmap)
        diffs = [float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                       - b.transpose(0, 2, 1).astype(jnp.float32))))
                 for a, b in zip(o_tc, o_ct)]
        ms_tc = timeit(jax.jit(run_tc), (params, state, xmap), iters) * 1e3
        # isolate the silent f32 promotion at the PE add (f32 pos_embd + bf16
        # tokens -> f32 activations through the whole encoder)
        state_bf = dict(state, pos_embd=state["pos_embd"].astype(dt))
        ms_tcb = timeit(jax.jit(run_tc), (params, state_bf, xmap), iters) * 1e3
        ms_ct = timeit(jax.jit(run_ct), (params, state, xmap), iters) * 1e3
        print(f"{tag}: TC {ms_tc:7.2f} ms   TC/bf16pe {ms_tcb:7.2f} ms   "
              f"CT {ms_ct:7.2f} ms   maxdiff {max(diffs):.2e}")


def exp_fused_mlp(batch, iters):
    """Flagship eval forward: Pallas fused-MLP kernel on vs off, interleaved."""
    import jax
    import jax.numpy as jnp

    from otpose_tpu.models.core import Ctx
    from otpose_tpu.models.otpose import (OTPoseSpec, init_otpose,
                                          otpose_forward, prepare_eval_params)
    from otpose_tpu.utils.testing import flagship_otpose_cfg

    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    spec = OTPoseSpec.from_cfg(flagship_otpose_cfg())
    params, state = init_otpose(jax.random.PRNGKey(0), spec)
    params = prepare_eval_params(
        params, param_dtype=dt if dt != jnp.float32 else None)
    x = jnp.asarray(np.random.RandomState(0).randn(batch, 384, 288, 15),
                    jnp.float32)
    margin = jnp.ones((batch, 4), jnp.float32)

    def make(fused):
        def f(params, state, x, margin):
            ctx = Ctx(params, state, train=False, compute_dtype=dt, fused=fused)
            return otpose_forward(ctx, x, margin, spec)[0]
        return jax.jit(f)

    fa, fb = make(True), make(False)
    oa = fa(params, state, x, margin)
    ob = fb(params, state, x, margin)
    print("maxdiff fused vs xla:",
          float(jnp.max(jnp.abs(oa.astype(jnp.float32)
                                - ob.astype(jnp.float32)))))
    for f in (fa, fb):
        timeit(f, (params, state, x, margin), 3)  # warm both
    for r in range(4):
        ma = timeit(fa, (params, state, x, margin), iters) * 1e3
        mb = timeit(fb, (params, state, x, margin), iters) * 1e3
        print(f"round {r}: fused {ma:7.2f} ms   xla {mb:7.2f} ms   "
              f"delta {mb - ma:+6.2f} ms", flush=True)


def exp_fused_mlp_enc(batch, iters):
    """Encoder-only fused-MLP A/B + T-tile sweep (temporal and flow specs)."""
    import jax
    import jax.numpy as jnp

    from otpose_tpu.models.conv_transformer import (ConvTransformerSpec,
                                                    conv_transformer_forward,
                                                    init_conv_transformer)
    from otpose_tpu.models.core import Ctx
    from otpose_tpu.ops.pallas import fused_mlp

    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    for c, nh, arch, tag in ((136, 2, (0, 6, 2), "temporal"),
                             (17, 1, (0, 6, 0), "flow")):
        spec = ConvTransformerSpec(n_in=c, n_embd=c, n_head=nh, n_embd_ks=3,
                                   max_len=6912, arch=arch)
        params, state = init_conv_transformer(jax.random.PRNGKey(0), spec)
        params = {k: v.astype(dt) if v.dtype == jnp.float32 else v
                  for k, v in params.items()}
        rng = np.random.RandomState(0)
        xmap = jnp.asarray(rng.randn(batch, 96, 72, c), dt)

        def make(fused):
            def run(params, state, xmap, spec=spec):
                ctx = Ctx(params, state, train=False, compute_dtype=dt,
                          fused=fused)
                return conv_transformer_forward(ctx, xmap, spec, "ct")
            return jax.jit(run)

        fa, fb = make(True), make(False)
        d = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - b.astype(jnp.float32))))
                for a, b in zip(fa(params, state, xmap),
                                fb(params, state, xmap)))
        timeit(fb, (params, state, xmap), 3)
        ms_b = timeit(fb, (params, state, xmap), iters) * 1e3
        for tile in (768, 1152, 2304):
            fused_mlp._T_TILE = tile
            fa = make(True)
            timeit(fa, (params, state, xmap), 3)
            ms_a = timeit(fa, (params, state, xmap), iters) * 1e3
            ms_b2 = timeit(fb, (params, state, xmap), iters) * 1e3
            print(f"{tag}: tile {tile}: fused {ms_a:7.2f} ms   "
                  f"xla {ms_b2:7.2f} ms (first {ms_b:7.2f})  maxdiff {d:.2e}",
                  flush=True)
        fused_mlp._T_TILE = 1152


def exp_fused_attn(batch, iters):
    """Flagship eval forward, interleaved: fused-attention kernel
    (q/k/v+scores+att@v in VMEM) vs plain XLA.  (The 3-way vs the deleted
    round-2 fused-QKV kernel measured a wash: -0.26 ms avg, see STATUS.md.)"""
    import jax
    import jax.numpy as jnp

    from otpose_tpu.models.core import Ctx
    from otpose_tpu.models.otpose import (OTPoseSpec, init_otpose,
                                          otpose_forward, prepare_eval_params)
    from otpose_tpu.utils.testing import flagship_otpose_cfg

    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    spec = OTPoseSpec.from_cfg(flagship_otpose_cfg())
    params, state = init_otpose(jax.random.PRNGKey(0), spec)
    params = prepare_eval_params(
        params, param_dtype=dt if dt != jnp.float32 else None)
    x = jnp.asarray(np.random.RandomState(0).randn(batch, 384, 288, 15),
                    jnp.float32)
    margin = jnp.ones((batch, 4), jnp.float32)

    def make(fused):
        def f(params, state, x, margin):
            ctx = Ctx(params, state, train=False, compute_dtype=dt,
                      fused=fused)
            return otpose_forward(ctx, x, margin, spec)[0]
        return jax.jit(f)

    f_new, f_xla = make(True), make(False)
    o_new = f_new(params, state, x, margin)
    o_xla = f_xla(params, state, x, margin)
    print("maxdiff fused vs xla:",
          float(jnp.max(jnp.abs(o_new.astype(jnp.float32)
                                - o_xla.astype(jnp.float32)))))
    for f in (f_new, f_xla):
        timeit(f, (params, state, x, margin), 3)
    for r in range(4):
        mn = timeit(f_new, (params, state, x, margin), iters) * 1e3
        mx = timeit(f_xla, (params, state, x, margin), iters) * 1e3
        print(f"round {r}: attn-fused {mn:7.2f} ms   xla {mx:7.2f} ms   "
              f"delta {mx - mn:+6.2f} ms", flush=True)


def exp_final_commute(batch, iters):
    """Flagship eval forward: token-space final layer (1x1 conv commuted
    through the branch upsample) vs the explicit stack+NHWC+conv2d path.
    The old path is selected by spoofing final_conv_kernel=2 (same 1x1
    weights; the else-branch uses padding 0)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from otpose_tpu.models.core import Ctx
    from otpose_tpu.models.otpose import (OTPoseSpec, init_otpose,
                                          otpose_forward, prepare_eval_params)
    from otpose_tpu.utils.testing import flagship_otpose_cfg

    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    spec = OTPoseSpec.from_cfg(flagship_otpose_cfg())
    spec_old = dataclasses.replace(
        spec, hrnet=dataclasses.replace(spec.hrnet, final_conv_kernel=2))
    params, state = init_otpose(jax.random.PRNGKey(0), spec)
    params = prepare_eval_params(
        params, param_dtype=dt if dt != jnp.float32 else None)
    x = jnp.asarray(np.random.RandomState(0).randn(batch, 384, 288, 15),
                    jnp.float32)
    margin = jnp.ones((batch, 4), jnp.float32)

    def make(sp):
        def f(params, state, x, margin):
            ctx = Ctx(params, state, train=False, compute_dtype=dt)
            return otpose_forward(ctx, x, margin, sp)[0]
        return jax.jit(f)

    fa, fb = make(spec), make(spec_old)
    oa = fa(params, state, x, margin)
    ob = fb(params, state, x, margin)
    print("maxdiff commute vs stack:",
          float(jnp.max(jnp.abs(oa.astype(jnp.float32)
                                - ob.astype(jnp.float32)))))
    for f in (fa, fb):
        timeit(f, (params, state, x, margin), 3)
    for r in range(4):
        ma = timeit(fa, (params, state, x, margin), iters) * 1e3
        mb = timeit(fb, (params, state, x, margin), iters) * 1e3
        print(f"round {r}: commute {ma:7.2f} ms   stack {mb:7.2f} ms   "
              f"delta {mb - ma:+6.2f} ms", flush=True)


def exp_deform_layout(batch, iters):
    """Deform stage only, flagship shape: shipped tap_body vs dot-native
    tent layouts (wx generated as (b,g,w,p); accumulator (b,o,p); v2 also
    generates wy as (b,g,y,p))."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from otpose_tpu.ops.deform_conv import modulated_deform_conv_multi

    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rng = np.random.RandomState(0)
    b, h, w, g = batch, 96, 72, 17
    k2, kernel = 9, 3
    dils = (3, 6, 9, 12, 15)
    d = len(dils)
    p = h * w
    x = jnp.asarray(rng.randn(b, h, w, g), dt)
    offs = [jnp.asarray(rng.randn(b, h, w, g * 2 * k2) * 2, jnp.float32)
            for _ in range(d)]
    msks = [jnp.asarray(rng.randn(b, h, w, g * k2), jnp.float32)
            for _ in range(d)]
    weights = jnp.asarray(rng.randn(d, kernel, kernel, g, g) * 0.1, jnp.float32)
    biases = jnp.asarray(rng.randn(d, g) * 0.1, jnp.float32)

    f32 = jnp.float32

    def make_variant(gen_wy_t):
        def run(x, offs, msks, weights, biases):
            cd = x.dtype
            ys = jnp.arange(h, dtype=f32)
            xs = jnp.arange(w, dtype=f32)
            base_y = jnp.broadcast_to(ys[:, None], (h, w)).reshape(p)
            base_x = jnp.broadcast_to(xs[None, :], (h, w)).reshape(p)
            off = jnp.stack([o.reshape(b, p, g, k2, 2) for o in offs]).astype(f32)
            # mask pre-transposed to (d, b, g, k2, p) once
            msk = jnp.stack([m.reshape(b, p, g, k2).transpose(0, 2, 3, 1)
                             for m in msks]).astype(cd)
            wk = weights.reshape(d, k2, g, 1, g).astype(cd)
            ki = np.arange(k2)
            tap_table = np.zeros((d * k2, 2), np.float32)
            for di, dil in enumerate(dils):
                tap_table[di * k2:(di + 1) * k2, 0] = (ki // kernel) * dil - dil
                tap_table[di * k2:(di + 1) * k2, 1] = (ki % kernel) * dil - dil
            tap_tab = jnp.asarray(tap_table)
            iota_h = jnp.arange(h, dtype=f32)
            iota_w = jnp.arange(w, dtype=f32)
            xg1 = x.reshape(b, p // w, w, g, 1)[..., 0].reshape(b, h, w, g)
            preferred = f32 if cd == f32 else cd

            def tap_body(acc, i):
                di = i // k2
                k = i % k2
                # (b, g, p) sample coords
                syt = (base_y[None, None, :] + tap_tab[i, 0]
                       + off[di, :, :, :, k, 0].transpose(0, 2, 1))
                sxt = (base_x[None, None, :] + tap_tab[i, 1]
                       + off[di, :, :, :, k, 1].transpose(0, 2, 1))
                if gen_wy_t:
                    # wy directly in the dot-native (b, g, y, p) layout
                    wy = jnp.maximum(
                        1.0 - jnp.abs(syt[:, :, None, :] - iota_h[:, None]),
                        0.0).astype(cd)
                    a = jnp.einsum("bywg,bgyp->bgwp", xg1.astype(cd), wy,
                                   preferred_element_type=preferred)
                else:
                    wy = jnp.maximum(
                        1.0 - jnp.abs(syt[..., None] - iota_h), 0.0
                    ).astype(cd)  # (b, g, p, y)
                    a = jnp.einsum("bgpy,bywg->bgwp", wy, xg1.astype(cd),
                                   preferred_element_type=preferred)
                # wx in (b, g, w, p): multiply-reduce with a needs no
                # transpose of the big tensors
                wx = jnp.maximum(
                    1.0 - jnp.abs(sxt[:, :, None, :] - iota_w[:, None]),
                    0.0).astype(cd)
                sampled = jnp.sum(a * wx, axis=2)          # (b, g, p)
                sampled = sampled * msk[di, :, :, k]
                acc = acc + jnp.einsum(
                    "bgp,go->bop", sampled, wk[di, k, :, 0],
                    preferred_element_type=preferred).astype(f32)
                return acc, None

            out0 = jnp.zeros((b, g, p), f32)
            out, _ = lax.scan(jax.checkpoint(tap_body), out0,
                              jnp.arange(d * k2))
            out = out / d + jnp.mean(biases.astype(f32), axis=0)[:, None]
            return out.transpose(0, 2, 1).reshape(b, h, w, g).astype(x.dtype)
        return jax.jit(run)

    def shipped(x, offs, msks, weights, biases):
        return modulated_deform_conv_multi(
            x, offs, msks, weights, biases, kernel=kernel, stride=1,
            padding_list=dils, dilation_list=dils, deformable_groups=g)

    f0 = jax.jit(shipped)
    f1 = make_variant(False)
    f2 = make_variant(True)
    args = (x, offs, msks, weights, biases)
    o0, o1, o2 = f0(*args), f1(*args), f2(*args)
    print("maxdiff v1 vs shipped:",
          float(jnp.max(jnp.abs(o1.astype(f32) - o0.astype(f32)))))
    print("maxdiff v2 vs shipped:",
          float(jnp.max(jnp.abs(o2.astype(f32) - o0.astype(f32)))))
    for f in (f0, f1, f2):
        timeit(f, args, 3)
    for r in range(4):
        m0 = timeit(f0, args, iters) * 1e3
        m1 = timeit(f1, args, iters) * 1e3
        m2 = timeit(f2, args, iters) * 1e3
        print(f"round {r}: shipped {m0:7.2f} ms   v1 {m1:7.2f} ms   "
              f"v2 {m2:7.2f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="hrnet_bn")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    import jax
    print(f"backend={jax.default_backend()} batch={args.batch}")
    globals()[f"exp_{args.exp}"](args.batch, args.iters)


if __name__ == "__main__":
    main()
