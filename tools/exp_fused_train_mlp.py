"""A/B: custom_vjp fused-MLP Pallas kernel in the TRAIN-mode forward
(VERDICT r2 task 8).

The fused MLP kernel (ops/pallas/fused_mlp.py) was the -7.2 ms eval winner;
training keeps the plain-jnp path because autodiff needs differentiable ops.
This experiment wraps the kernel in ``jax.custom_vjp`` — forward runs the
kernel, backward runs the VJP of the numerically-identical jnp formulation
(recomputing the forward intermediates, remat-style) — and interleaves
value_and_grad timings of an N-block MLP chain at flagship encoder shapes
(B=8, C=136, T=6912, bf16) against the plain path.

Dropout note: the kernel has no in-kernel dropout, so both arms run
pdrop=0.  If even this variant loses, the train-mode fused MLP is closed:
the dropout-capable variant can only be slower (extra RNG + mask traffic).

Accounting (why a loss is expected): XLA's plain fwd+bwd stores the GELU
intermediate for the backward; the custom_vjp arm pays kernel_fwd extra and
recomputes the forward inside the VJP, so it trades ~60 MB/block of stored
intermediates for a full extra forward of MXU work.  It can only win if the
plain forward is bandwidth-bound enough that kernel_fwd + recompute < plain
fwd + intermediate traffic.

Usage: python tools/exp_fused_train_mlp.py [--batch 8] [--blocks 6]
       [--iters 10] [--rounds 3]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--channels", type=int, default=136)
    ap.add_argument("--tokens", type=int, default=6912)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from otpose_tpu.utils.backend import ensure_live_backend

    ensure_live_backend()
    import jax
    import jax.numpy as jnp

    from otpose_tpu.models import core
    from otpose_tpu.ops.pallas.fused_mlp import fused_mlp_residual_ct

    b, c, t, nblk = args.batch, args.channels, args.tokens, args.blocks
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(b, c, t), dt)
    blocks = []
    for i in range(nblk):
        blocks.append({
            "ln_w": jnp.asarray(rng.randn(c) * 0.1 + 1.0, jnp.float32),
            "ln_b": jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
            "w1": jnp.asarray(rng.randn(1, c, 4 * c) * 0.05, jnp.float32),
            "b1": jnp.asarray(rng.randn(4 * c) * 0.01, jnp.float32),
            "w2": jnp.asarray(rng.randn(1, 4 * c, c) * 0.05, jnp.float32),
            "b2": jnp.asarray(rng.randn(c) * 0.01, jnp.float32),
        })

    # the same primitive path blocks.py uses: einsum over (B, C, T)
    def dense_ct(x, w, bias):
        w = w[0].astype(x.dtype)
        y = jnp.einsum("bct,cd->bdt", x, w,
                       precision=core._mxu_precision(x.dtype),
                       preferred_element_type=core._preferred(x.dtype))
        return y + bias.astype(y.dtype)[:, None]

    def mlp_block_plain(x, p):
        h = core.layer_norm_ct(x, p["ln_w"], p["ln_b"])
        h = dense_ct(h, p["w1"], p["b1"])
        h = core.gelu(h)
        h = dense_ct(h, p["w2"], p["b2"])
        return x + h

    @jax.custom_vjp
    def mlp_block_fused(x, p):
        return fused_mlp_residual_ct(x, p["ln_w"], p["ln_b"],
                                     p["w1"], p["b1"], p["w2"], p["b2"])

    def _fwd(x, p):
        return mlp_block_fused(x, p), (x, p)

    def _bwd(saved, g):
        x, p = saved
        _, vjp = jax.vjp(mlp_block_plain, x, p)
        return vjp(g)

    mlp_block_fused.defvjp(_fwd, _bwd)

    def chain(block_fn):
        def loss(x, params):
            for p in params:
                x = block_fn(x, p)
            return jnp.sum(x.astype(jnp.float32))
        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

    f_plain = chain(mlp_block_plain)
    f_fused = chain(mlp_block_fused)

    def fence(out):
        return float(np.asarray(out[0]))

    def timeit(f):
        outs = None
        t0 = time.perf_counter()
        for _ in range(args.iters):
            outs = f(x0, blocks)
        fence(outs)
        return (time.perf_counter() - t0) / args.iters * 1e3

    # compile + warm both
    fence(f_plain(x0, blocks))
    fence(f_fused(x0, blocks))
    v_p, _ = f_plain(x0, blocks)
    v_f, _ = f_fused(x0, blocks)
    print(f"value parity: plain {float(v_p):.6e} fused {float(v_f):.6e} "
          f"rel {abs(float(v_p) - float(v_f)) / abs(float(v_p)):.2e}")
    g_p = f_plain(x0, blocks)[1][0]
    g_f = f_fused(x0, blocks)[1][0]
    gd = float(jnp.max(jnp.abs(g_p.astype(jnp.float32) -
                               g_f.astype(jnp.float32))))
    print(f"dL/dx maxdiff: {gd:.3e}")

    for rnd in range(args.rounds):
        tp = timeit(f_plain)
        tf = timeit(f_fused)
        print(f"round {rnd}: plain {tp:.2f} ms   fused-custom_vjp {tf:.2f} ms "
              f"  delta {tf - tp:+.2f} ms ({nblk} blocks, fwd+bwd)")


if __name__ == "__main__":
    main()
