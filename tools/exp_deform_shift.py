"""Experiment: flat-P shift-decomposition deform conv vs shipped tent-matmul.

The round-2 shift-decomposition Pallas kernel lost to the XLA tent path
because the (96, 72) tile packs the VPU at 56% (STATUS.md).  This variant
flattens pixels to the P = H*W = 6912 axis (54 exact lane tiles; B*G = 272
exact sublane tiles) so every elementwise pass packs ~100%, and expresses
each tap's bilinear sample as a 6x6 window of lane-rolls with precomputed
row/col validity masks (exact == tent path for |offset| <= M, M=2).

Usage: python tools/exp_deform_shift.py [--check] [--iters 20] [--m 2]
--check runs the CPU numerics gate vs modulated_deform_conv_multi.
"""

from __future__ import annotations

import argparse
import functools
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def build_shift_fn(h, w, dilations, m, dtype):
    import jax
    import jax.numpy as jnp

    p = h * w
    win = list(range(-m, m + 2))  # tent support for |off| <= m

    # per-(dilation, tap, dy, dx): flat shift + validity mask over P
    rows = np.arange(p) // w
    cols = np.arange(p) % w

    @functools.partial(jax.jit, static_argnames=())
    def shift_deform(x, off, msk, weights, biases):
        """x: (B, H, W, G) -> (B, H, W, O) mean over dilations.
        off: (D, B, H, W, G*2*9)  msk: (D, B, H, W, G*9)
        weights: (D, 3, 3, G, O)  biases: (D, O)."""
        b = x.shape[0]
        g = x.shape[-1]
        o = weights.shape[-1]
        cdt = dtype
        xf = x.astype(cdt).reshape(b, p, g).transpose(0, 2, 1)  # (B, G, P)
        acc = jnp.zeros((b, o, p), jnp.float32)
        for d_i, dil in enumerate(dilations):
            offs = off[d_i].reshape(b, p, g, 9, 2).astype(jnp.float32)
            masks = msk[d_i].reshape(b, p, g, 9).astype(cdt)
            wk = weights[d_i].reshape(9, g, o).astype(cdt)
            for k in range(9):
                cy = (k // 3 - 1) * dil
                cx = (k % 3 - 1) * dil
                dy_off = offs[:, :, :, k, 0].transpose(0, 2, 1)  # (B, G, P)
                dx_off = offs[:, :, :, k, 1].transpose(0, 2, 1)
                # 6 tent factors per axis, shared across the 6x6 window
                ty = [jnp.maximum(1.0 - jnp.abs(dy_off - dy), 0.0).astype(cdt)
                      for dy in win]
                tx = [jnp.maximum(1.0 - jnp.abs(dx_off - dx), 0.0).astype(cdt)
                      for dx in win]
                s_k = jnp.zeros((b, g, p), jnp.float32)
                for iy, dy in enumerate(win):
                    sy = cy + dy
                    row_ok = (rows + sy >= 0) & (rows + sy < h)
                    for ix, dx in enumerate(win):
                        sx = cx + dx
                        col_ok = (cols + sx >= 0) & (cols + sx < w)
                        valid = jnp.asarray((row_ok & col_ok), cdt)
                        shifted = jnp.roll(xf, -(sy * w + sx), axis=-1)
                        s_k = s_k + (ty[iy] * tx[ix] * valid) * shifted
                s_k = s_k.astype(cdt) * masks[:, :, :, k].transpose(0, 2, 1)
                # channel contraction (B, G, P) x (G, O) -> (B, O, P)
                acc = acc + jax.lax.dot_general(
                    wk[k], s_k, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).transpose(1, 0, 2)
            acc = acc + biases[d_i].astype(jnp.float32)[None, :, None] \
                if biases is not None else acc
        outm = (acc / len(dilations)).transpose(0, 2, 1).reshape(b, h, w, o)
        return outm.astype(x.dtype)

    return shift_deform


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--m", type=int, default=2)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    if args.check:
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        from otpose_tpu.utils.backend import ensure_live_backend
        ensure_live_backend()
    import jax
    import jax.numpy as jnp

    from otpose_tpu.ops.deform_conv import modulated_deform_conv_multi

    h, w, g, o = (96, 72, 17, 17)
    dils = (3, 6, 9, 12, 15)
    b = args.batch if not args.check else 2
    if args.check:
        h, w = 12, 10
        dils = (1, 2)
    rng = np.random.RandomState(0)
    dt = jnp.float32 if args.check else jnp.bfloat16

    x = jnp.asarray(rng.randn(b, h, w, g), dt)
    off = jnp.asarray(rng.uniform(-args.m, args.m, (len(dils), b, h, w, g * 18)),
                      jnp.float32)
    msk = jnp.asarray(rng.rand(len(dils), b, h, w, g * 9), dt)
    weights = jnp.asarray(rng.randn(len(dils), 3, 3, g, o) * 0.1, dt)
    biases = jnp.asarray(rng.randn(len(dils), o) * 0.01, jnp.float32)

    shift_fn = build_shift_fn(h, w, dils, args.m, dt)

    @jax.jit
    def tent_fn(x, off, msk, weights, biases):
        return modulated_deform_conv_multi(
            x, list(off), list(msk), weights, biases, kernel=3, stride=1,
            padding_list=tuple(dils), dilation_list=tuple(dils),
            deformable_groups=g)

    y_shift = np.asarray(shift_fn(x, off, msk, weights, biases), np.float32)
    y_tent = np.asarray(tent_fn(x, off, msk, weights, biases), np.float32)
    diff = np.abs(y_shift - y_tent).max()
    rel = diff / max(1e-9, np.abs(y_tent).max())
    print(f"maxdiff shift vs tent: {diff:.3e} (rel {rel:.3e})")
    if args.check:
        assert rel < 1e-5, "shift decomposition diverges from tent path"
        print("CHECK OK")
        return

    def fence(out):
        return float(np.asarray(jax.device_get(out.ravel()[0])))

    def timeit(fn):
        fence(fn(x, off, msk, weights, biases))
        t0 = time.perf_counter()
        outs = None
        for _ in range(args.iters):
            outs = fn(x, off, msk, weights, biases)
        fence(outs)
        return (time.perf_counter() - t0) / args.iters * 1e3

    # interleaved A/B (tunnel drift): tent, shift, tent, shift
    for rnd in range(3):
        t_tent = timeit(tent_fn)
        t_shift = timeit(shift_fn)
        print(f"round {rnd}: tent {t_tent:.2f} ms   shift {t_shift:.2f} ms   "
              f"speedup {t_tent / t_shift:.2f}x")


if __name__ == "__main__":
    main()
