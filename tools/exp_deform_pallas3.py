"""Deform Pallas kernel v3: fused tent-matmul with VMEM-resident image.

Hypothesis (STATUS.md "Deform kernel analysis"): the shipped XLA tent path
is VPU(tent-gen)+MXU serialized at ~25.5 ms in-model; a fused kernel that
keeps the per-(b,g) image and all tent/interp temporaries in VMEM and lets
the hardware overlap VPU tent generation with MXU contraction should land
between max(VPU, MXU) ~ 14 ms and the serial sum.

Layout: pre-kernel XLA transposes offsets/masks to pixel-on-lanes
(B, G, 2, 45, P) / (B, G, 45, P); the kernel runs grid (B, PJ, G) with the
output block (B, O, PT) f32 revisited across the G dimension (sequential
TPU grid), a fori_loop over the 45 (dilation, tap) pairs, tents generated
in-register, the y-contraction as one (W, H) x (H, PT) MXU dot per tap and
the x-contraction as a multiply + sublane reduce.

Usage: python tools/exp_deform_pallas3.py [--check] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
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


def make_pallas3(h, w, g, o, kernel, dils, pt, interpret):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k2 = kernel * kernel
    nt = len(dils) * k2  # 45
    p = h * w
    pj = p // pt
    assert p % pt == 0

    # static per-(dilation, tap) displacement incl. -padding (pad == dil)
    ki = np.arange(k2)
    tap_table = np.zeros((nt, 2), np.float32)
    for di, dil in enumerate(dils):
        tap_table[di * k2:(di + 1) * k2, 0] = (ki // kernel) * dil - dil
        tap_table[di * k2:(di + 1) * k2, 1] = (ki % kernel) * dil - dil

    def kern(xt_ref, off_ref, msk_ref, wk_ref, by_ref, bx_ref,
             o_ref, s_scr, *, cd):
        gg = pl.program_id(2)

        @pl.when(gg == 0)
        def _():
            o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)

        x_img = xt_ref[0, 0]                      # (W, H) cd
        base_y = by_ref[...]                      # (1, PT) f32
        base_x = bx_ref[...]
        iota_y = lax.broadcasted_iota(jnp.int32, (h, pt), 0).astype(jnp.float32)
        iota_x = lax.broadcasted_iota(jnp.int32, (w, pt), 0).astype(jnp.float32)

        # static unroll over the 45 (dilation, tap) pairs: static indices
        # need no sublane-alignment proofs
        for i in range(nt):
            offy = off_ref[0, 0, 0, i:i + 1, :]   # (1, PT)
            offx = off_ref[0, 0, 1, i:i + 1, :]
            sy = offy + float(tap_table[i, 0]) + base_y   # (1, PT) f32
            sx = offx + float(tap_table[i, 1]) + base_x
            wy = jnp.maximum(1.0 - jnp.abs(sy - iota_y), 0.0)
            wx = jnp.maximum(1.0 - jnp.abs(sx - iota_x), 0.0)
            # y-contraction on the MXU: (W, H) @ (H, PT) -> (W, PT)
            a = lax.dot_general(x_img, wy.astype(cd),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            # x-contraction: multiply + sublane reduce (f32 accumulate)
            sampled = jnp.sum(a * wx, axis=0, keepdims=True)  # (1, PT) f32
            sm = (sampled.astype(cd) * msk_ref[0, 0, i:i + 1, :]
                  ).astype(jnp.float32)
            s_scr[i:i + 1, :] = sm

        # weight contraction: (NT, O)^T-contract (NT, PT) -> (O, PT)
        o_ref[0] += lax.dot_general(wk_ref[0], s_scr[...],
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)

    def run(x, offs, msks, weights, biases):
        cd = x.dtype
        b = x.shape[0]
        d = len(dils)
        # pre-kernel layout transforms (counted in the measurement)
        xt = jnp.transpose(x, (0, 3, 2, 1))                     # (B,G,W,H)
        off = jnp.stack([ofs.reshape(b, p, g, k2, 2) for ofs in offs], 2)
        off = jnp.transpose(off, (0, 3, 5, 2, 4, 1)) \
                 .reshape(b, g, 2, nt, p).astype(jnp.float32)
        msk = jnp.stack([m.reshape(b, p, g, k2) for m in msks], 1)
        msk = jnp.transpose(msk, (0, 3, 1, 4, 2)).reshape(b, g, nt, p)
        msk = msk.astype(cd)
        wk = weights.reshape(d, k2, g, o).transpose(2, 0, 1, 3) \
                    .reshape(g, nt, o).astype(jnp.float32)
        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)
        by = jnp.broadcast_to(ys[:, None], (h, w)).reshape(1, p)
        bx = jnp.broadcast_to(xs[None, :], (h, w)).reshape(1, p)

        grid = (b, pj, g)
        out = pl.pallas_call(
            functools.partial(kern, cd=cd),
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((b, o, p), jnp.float32),
            in_specs=[
                pl.BlockSpec((1, 1, w, h), lambda i, pjj, gg: (i, gg, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 2, nt, pt),
                             lambda i, pjj, gg: (i, gg, 0, 0, pjj),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, nt, pt),
                             lambda i, pjj, gg: (i, gg, 0, pjj),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nt, o), lambda i, pjj, gg: (gg, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, pt), lambda i, pjj, gg: (0, pjj),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, pt), lambda i, pjj, gg: (0, pjj),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, o, pt),
                                   lambda i, pjj, gg: (i, 0, pjj),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((nt, pt), jnp.float32)],
            interpret=interpret,
        )(xt, off, msk, wk, by, bx)
        out = out / d
        if biases is not None:
            out = out + jnp.mean(biases.astype(jnp.float32), 0)[:, None]
        return jnp.transpose(out, (0, 2, 1)).reshape(b, h, w, o).astype(cd)

    return jax.jit(run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--pt", type=int, default=2304)
    ap.add_argument("--check", action="store_true",
                    help="CPU interpret-mode exactness check only")
    args = ap.parse_args()

    if args.check:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from otpose_tpu.ops.deform_conv import modulated_deform_conv_multi

    interpret = jax.default_backend() != "tpu"
    dt = jnp.float32 if interpret else jnp.bfloat16
    rng = np.random.RandomState(0)
    b, h, w, g = args.batch, 96, 72, 17
    k2, kernel = 9, 3
    dils = (3, 6, 9, 12, 15)
    x = jnp.asarray(rng.randn(b, h, w, g), dt)
    offs = [jnp.asarray(rng.randn(b, h, w, g * 2 * k2) * 2, jnp.float32)
            for _ in range(len(dils))]
    msks = [jnp.asarray(rng.randn(b, h, w, g * k2), jnp.float32)
            for _ in range(len(dils))]
    weights = jnp.asarray(rng.randn(len(dils), kernel, kernel, g, g) * 0.1,
                          jnp.float32)
    biases = jnp.asarray(rng.randn(len(dils), g) * 0.1, jnp.float32)

    def shipped(x, offs, msks, weights, biases):
        return modulated_deform_conv_multi(
            x, offs, msks, weights, biases, kernel=kernel, stride=1,
            padding_list=dils, dilation_list=dils, deformable_groups=g)

    f0 = jax.jit(shipped)
    f1 = make_pallas3(h, w, g, g, kernel, dils, args.pt, interpret)
    argsv = (x, offs, msks, weights, biases)
    o0, o1 = f0(*argsv), f1(*argsv)
    md = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o0.astype(jnp.float32))))
    sc = float(jnp.max(jnp.abs(o0.astype(jnp.float32))))
    print(f"backend={jax.default_backend()} dt={dt.__name__} "
          f"maxdiff={md:.3e} (scale {sc:.2f})", flush=True)
    if args.check:
        assert md < 5e-4 * sc, md
        print("interpret-mode check OK")
        return
    for f in (f0, f1):
        timeit(f, argsv, 3)
    for r in range(4):
        m0 = timeit(f0, argsv, args.iters) * 1e3
        m1 = timeit(f1, argsv, args.iters) * 1e3
        print(f"round {r}: shipped {m0:7.2f} ms   pallas3 {m1:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
