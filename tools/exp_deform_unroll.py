"""A/B: deform-stage fwd+bwd at scan unroll factors 1/3/5/9/15.

The post-scan-xs flagship train-step trace (round 3) still shows the deform
scan as the top bucket — `while` self-time ~62+8 ms plus per-tap tent
fusions ~53 ms of the 394 ms step.  The 45-tap body alternates VPU work
(tent construction) with MXU work (the two contractions): with unroll=1 the
loop serializes them, which is exactly the dependence that voided the
Pallas kernels' overlap (STATUS "Deform kernel analysis").  `lax.scan`'s
``unroll`` replicates the body inside one loop step, letting XLA's
scheduler pipeline tap i+1's tents against tap i's matmuls, at the price of
unroll-x live tent transients ((B,P,G,H)+(B,P,G,W) bf16 each, ~315 MB/tap
at flagship batch 8).

Times jitted value_and_grad of the fused 45-tap stage, interleaved in one
process (cross-process A/Bs drift over the axon tunnel).

Usage: python tools/exp_deform_unroll.py [--batch 8] [--iters 5]
       [--unrolls 1,3,5,9,15]
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--unrolls", type=str, default="1,3,5,9,15")
    args = ap.parse_args()
    unrolls = [int(u) for u in args.unrolls.split(",")]

    from otpose_tpu.utils.backend import ensure_live_backend
    ensure_live_backend()
    import jax
    import jax.numpy as jnp

    from otpose_tpu.ops.deform_conv import modulated_deform_conv_multi

    b, ho, wo, j = args.batch, 96, 72, 17
    k2, d = 9, 5
    dil = (3, 6, 9, 12, 15)
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, ho, wo, j), dt)
    off = [jnp.asarray(rng.randn(b, ho, wo, j * 2 * k2) * 2, dt)
           for _ in range(d)]
    msk = [jnp.asarray(rng.rand(b, ho, wo, j * k2), dt) for _ in range(d)]
    w = jnp.asarray(rng.randn(d, 3, 3, j, j) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(d, j) * 0.01, jnp.float32)

    def make_step(unroll):
        def loss(x, offs, msks, weights):
            out = modulated_deform_conv_multi(
                x, offs, msks, weights, bias, kernel=3, stride=1,
                padding_list=dil, dilation_list=dil, deformable_groups=j,
                unroll=unroll)
            return jnp.sum(out.astype(jnp.float32))

        g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))
        return jax.jit(lambda: g(x, off, msk, w))

    steps = {u: make_step(u) for u in unrolls}

    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(np.asarray(jax.device_get(leaf.ravel()[0])))

    # compile + parity vs unroll=1
    vals, grads = {}, {}
    for u, stp in steps.items():
        vals[u], grads[u] = stp()
        fence((vals[u],))
    ref_u = unrolls[0]
    for u in unrolls[1:]:
        md = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                       b2.astype(jnp.float32))))
                 for a, b2 in zip(jax.tree_util.tree_leaves(grads[ref_u]),
                                  jax.tree_util.tree_leaves(grads[u])))
        print(f"unroll={u}: value diff {abs(float(vals[ref_u]) - float(vals[u])):.3e}"
              f"  grad maxdiff {md:.3e}")

    def timeit(stp):
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = stp()
        fence(out[0:1])
        return (time.perf_counter() - t0) / args.iters * 1e3

    for stp in steps.values():
        timeit(stp)  # warm
    for r in range(args.rounds):
        row = []
        for u in unrolls:
            row.append(f"u{u} {timeit(steps[u]):7.2f} ms")
        print(f"round {r}: " + "   ".join(row))


if __name__ == "__main__":
    main()
