"""A/B: deform-stage fwd+bwd — scan xs-slices vs closed-over dynamic indexing.

A flagship train-step trace (tools/trace_ops.py --stage train_step) showed the
deform backward dominated by a serial while loop scatter-adding the offsets
cotangent into the full f32 (D, B, P, G, K2, 2) buffer (~150 ms while +
~66 ms select_add + ~22 ms broadcast of 485 ms/step): `lax.scan` bodies that
dynamically index a closed-over array get their cotangent via scatter-add,
while explicit scan xs get in-place DUS stacking.  This experiment times
value_and_grad of the fused 45-tap deform stage under both formulations,
interleaved in one process (cross-process A/Bs drift over the axon tunnel).

Usage: python tools/exp_deform_scan_xs.py [--batch 8] [--iters 5]
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
    args = ap.parse_args()

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
    # (D, Kh, Kw, C, O) = (d, 3, 3, 17, 17): C=17 per the
    # modulated_deform_conv_multi contract — an earlier (d,3,3,1,j) shape
    # silently mapped output channels into the group slot (O=1 broadcast),
    # under-weighting the per-tap weight contraction vs the flagship shape
    w = jnp.asarray(rng.randn(d, 3, 3, j, j) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(d, j) * 0.01, jnp.float32)

    def legacy(x, offs, msks, weights, biases):
        """Round-2-shipped formulation: closed-over arrays indexed by the
        scan counter (the select_add cotangent path)."""
        bb, h, wdt, c = x.shape
        dg, cpg = j, 1
        p = ho * wo
        f32 = jnp.float32
        base_y = jnp.broadcast_to(
            jnp.arange(ho, dtype=f32)[:, None], (ho, wo)).reshape(p)
        base_x = jnp.broadcast_to(
            jnp.arange(wo, dtype=f32)[None, :], (ho, wo)).reshape(p)
        cd = x.dtype
        offT = jnp.stack([o.reshape(bb, p, dg, k2, 2) for o in offs]).astype(f32)
        mskT = jnp.stack([m.reshape(bb, p, dg, k2) for m in msks]).astype(cd)
        wk = weights.reshape(d, k2, dg, cpg, -1).astype(cd)
        ki = np.arange(k2)
        tap = np.zeros((d * k2, 2), np.float32)
        for di, dl in enumerate(dil):
            tap[di * k2:(di + 1) * k2, 0] = (ki // 3) * dl - dl
            tap[di * k2:(di + 1) * k2, 1] = (ki % 3) * dl - dl
        tap = jnp.asarray(tap)
        iota_h = jnp.arange(h, dtype=f32)
        iota_w = jnp.arange(wdt, dtype=f32)
        xg1 = x.reshape(bb, h, wdt, dg)
        pref = cd

        def body(acc, i):
            di = i // k2
            k = i % k2
            sy = base_y[None, :, None] + tap[i, 0] + offT[di, :, :, :, k, 0]
            sx = base_x[None, :, None] + tap[i, 1] + offT[di, :, :, :, k, 1]
            wy = jnp.maximum(1.0 - jnp.abs(sy[..., None] - iota_h), 0.0).astype(cd)
            wx = jnp.maximum(1.0 - jnp.abs(sx[..., None] - iota_w), 0.0).astype(cd)
            a = jnp.einsum("bpgy,bywg->bgwp", wy, xg1,
                           preferred_element_type=pref)
            sampled = jnp.einsum("bgwp,bpgw->bpg", a, wx,
                                 preferred_element_type=pref)
            sampled = (sampled * mskT[di, :, :, :, k])[..., None]
            acc = acc + jnp.einsum("bpgc,gco->bpo", sampled, wk[di, k],
                                   preferred_element_type=pref).astype(f32)
            return acc, None

        out0 = jnp.zeros((bb, p, weights.shape[-1]), f32)
        out, _ = jax.lax.scan(jax.checkpoint(body), out0, jnp.arange(d * k2))
        out = out / d + jnp.mean(biases.astype(f32), axis=0)
        return out.reshape(bb, ho, wo, -1).astype(x.dtype)

    def current(x, offs, msks, weights, biases):
        return modulated_deform_conv_multi(
            x, offs, msks, weights, biases, kernel=3, stride=1,
            padding_list=dil, dilation_list=dil, deformable_groups=j)

    def make_step(fwd):
        def loss(x, offs, msks, weights):
            return jnp.sum(fwd(x, offs, msks, weights, bias).astype(jnp.float32))

        g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))
        return jax.jit(lambda: g(x, off, msk, w))

    step_a = make_step(current)
    step_b = make_step(legacy)

    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(np.asarray(jax.device_get(leaf.ravel()[0])))

    va, ga = step_a()
    vb, gb = step_b()
    fence((va,)); fence((vb,))
    print("value diff:", abs(float(va) - float(vb)))
    md = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - b2.astype(jnp.float32))))
             for a, b2 in zip(jax.tree_util.tree_leaves(ga),
                              jax.tree_util.tree_leaves(gb)))
    print("grad maxdiff:", md)

    def timeit(stp):
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = stp()
        fence(out[0:1])
        return (time.perf_counter() - t0) / args.iters * 1e3

    timeit(step_a); timeit(step_b)  # warm
    for r in range(args.rounds):
        ta = timeit(step_a)
        tb = timeit(step_b)
        print(f"round {r}: xs-slices {ta:8.2f} ms   legacy {tb:8.2f} ms   "
              f"speedup {tb / ta:.3f}x")


if __name__ == "__main__":
    main()
