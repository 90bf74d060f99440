"""Probe: does XLA TPU lower int8 conv/dot to the MXU's int8 mode, and how
fast is it vs bf16 at HRNet-like shapes?  (one-off measurement tool)"""

import sys
import time

import numpy as np


def fence(x):
    import jax
    return float(np.asarray(jax.device_get(x.ravel()[0])))


def timeit(fn, args, iters=20):
    fence(fn(*args))
    fence(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)

    shapes = [
        # (N, H, W, Cin, Cout, k) — HRNet-ish
        (80, 96, 72, 48, 48, 3),
        (80, 48, 36, 96, 96, 3),
        (80, 24, 18, 192, 192, 3),
    ]
    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))
    for (n, h, w, ci, co, k) in shapes:
        xf = jnp.asarray(rng.randn(n, h, w, ci), jnp.bfloat16)
        wf = jnp.asarray(rng.randn(k, k, ci, co) * 0.1, jnp.bfloat16)
        xi = jnp.asarray(rng.randint(-127, 127, (n, h, w, ci)), jnp.int8)
        wi = jnp.asarray(rng.randint(-127, 127, (k, k, ci, co)), jnp.int8)

        def conv_bf16(x, wt):
            return lax.conv_general_dilated(x, wt, (1, 1), "SAME",
                                            dimension_numbers=dn)

        def conv_int8(x, wt):
            return lax.conv_general_dilated(x, wt, (1, 1), "SAME",
                                            dimension_numbers=dn,
                                            preferred_element_type=jnp.int32)

        tb = timeit(jax.jit(conv_bf16), (xf, wf)) * 1e3
        try:
            ti = timeit(jax.jit(conv_int8), (xi, wi)) * 1e3
        except Exception as e:  # noqa: BLE001
            ti = None
            print(f"conv {n}x{h}x{w}x{ci}->{co}: bf16 {tb:7.3f} ms   "
                  f"int8 FAILED: {type(e).__name__}: {str(e)[:120]}")
            continue
        print(f"conv {n}x{h}x{w}x{ci}->{co}: bf16 {tb:7.3f} ms   "
              f"int8 {ti:7.3f} ms   ratio {tb/ti:5.2f}x", flush=True)

    # dot: encoder-projection-like and a big square
    for (m, kk, nn) in [(6912 * 16, 136, 136), (8192, 2048, 2048)]:
        af = jnp.asarray(rng.randn(m, kk), jnp.bfloat16)
        bf = jnp.asarray(rng.randn(kk, nn), jnp.bfloat16)
        ai = jnp.asarray(rng.randint(-127, 127, (m, kk)), jnp.int8)
        bi = jnp.asarray(rng.randint(-127, 127, (kk, nn)), jnp.int8)

        def dot_bf16(a, b):
            return lax.dot(a, b)

        def dot_int8(a, b):
            return lax.dot(a, b, preferred_element_type=jnp.int32)

        tb = timeit(jax.jit(dot_bf16), (af, bf)) * 1e3
        try:
            ti = timeit(jax.jit(dot_int8), (ai, bi)) * 1e3
        except Exception as e:  # noqa: BLE001
            print(f"dot {m}x{kk}x{nn}: bf16 {tb:7.3f} ms   int8 FAILED: {e}")
            continue
        print(f"dot {m}x{kk}x{nn}: bf16 {tb:7.3f} ms   int8 {ti:7.3f} ms   "
              f"ratio {tb/ti:5.2f}x", flush=True)


if __name__ == "__main__":
    sys.exit(main())
