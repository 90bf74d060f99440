"""Probe which bf16 lane-shift constructs Mosaic compiles on this TPU.

A k=3 depthwise conv along the lane axis needs +-1-token shifted views;
pltpu.roll rejects bf16 ("Rotate with non-32-bit data"), so this probes the
alternatives used by ops/pallas/fused_attn.py.  Run: python tools/probe_shift.py
"""

import sys
import os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, L = 16, 256
x = jnp.asarray(np.random.RandomState(0).randn(C, L), jnp.bfloat16)
want = np.zeros((C, L), np.float32)
want[:, 1:] = np.asarray(x).astype(np.float32)[:, :-1]   # right-shift by 1


def run(name, kernel):
    try:
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, L), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        ok = np.allclose(np.asarray(y).astype(np.float32), want, atol=1e-2)
        print(f"{name}: {'OK' if ok else 'WRONG RESULT'}")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL — {str(e).splitlines()[0][:120]}")


def k_concat(x_ref, o_ref):
    v = x_ref[...]
    o_ref[...] = jnp.concatenate(
        [jnp.zeros((C, 1), v.dtype), v[:, :-1]], axis=1)


def k_slice_pad(x_ref, o_ref):
    v = x_ref[...]
    p = jnp.pad(v, ((0, 0), (1, 0)))
    o_ref[...] = p[:, :L]


def k_bitcast_roll(x_ref, o_ref):
    v = x_ref[...]
    i = pltpu.bitcast(v, jnp.int32)
    r = pltpu.roll(i, 1, 1)
    o_ref[...] = pltpu.bitcast(r, jnp.bfloat16)


def k_f32_roll(x_ref, o_ref):
    v = x_ref[...].astype(jnp.float32)
    r = pltpu.roll(v, 1, 1)
    o_ref[...] = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (C, L), 1) == 0,
        jnp.zeros((C, L), jnp.float32), r).astype(jnp.bfloat16)


def k_scratch_store(x_ref, o_ref):
    def body(scr):
        scr[...] = jnp.zeros((C, L + 128), jnp.bfloat16)
        scr[:, pl.ds(1, L)] = x_ref[...]      # unaligned lane store
        o_ref[...] = scr[:, pl.ds(0, L)]
    pl.run_scoped(body, pltpu.VMEM((C, L + 128), jnp.bfloat16))


def k_unaligned_load(x_ref, o_ref):
    def body(scr):
        scr[...] = jnp.zeros((C, L + 128), jnp.bfloat16)
        scr[:, pl.ds(128, L)] = x_ref[...]    # aligned store at 128
        o_ref[...] = scr[:, pl.ds(127, L)]    # unaligned load
    pl.run_scoped(body, pltpu.VMEM((C, L + 128), jnp.bfloat16))


for name, kern in [("concat", k_concat), ("slice_pad", k_slice_pad),
                   ("bitcast_roll", k_bitcast_roll), ("f32_roll", k_f32_roll),
                   ("scratch_unaligned_store", k_scratch_store),
                   ("aligned_store_unaligned_load", k_unaligned_load)]:
    run(name, kern)


want_l = np.zeros((C, L), np.float32)
want_l[:, :-1] = np.asarray(x).astype(np.float32)[:, 1:]  # left-shift by 1


def run_l(name, kernel):
    try:
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, L), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        ok = np.allclose(np.asarray(y).astype(np.float32), want_l, atol=1e-2)
        print(f"{name}: {'OK' if ok else 'WRONG RESULT'}")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL — {str(e).splitlines()[0][:120]}")


def k_concat_left(x_ref, o_ref):
    v = x_ref[...]
    o_ref[...] = jnp.concatenate(
        [v[:, 1:], jnp.zeros((C, 1), v.dtype)], axis=1)


def k_masked_sum_col(x_ref, o_ref):
    # extract last column of v via one-hot mask + lane reduction, then
    # place it as col 0 of the output (boundary-column handoff pattern)
    v = x_ref[...]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (C, L), 1)
    last = jnp.sum(jnp.where(lanes == L - 1, v.astype(jnp.float32), 0.0),
                   axis=1, keepdims=True).astype(v.dtype)
    o_ref[...] = jnp.concatenate(
        [last, jnp.zeros((C, L - 1), v.dtype)], axis=1)


run_l("concat_left_shift", k_concat_left)
try:
    y = pl.pallas_call(
        k_masked_sum_col,
        out_shape=jax.ShapeDtypeStruct((C, L), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    got = np.asarray(y).astype(np.float32)
    ok = np.allclose(got[:, 0], np.asarray(x).astype(np.float32)[:, -1],
                     atol=1e-2) and np.allclose(got[:, 1:], 0)
    print("masked_sum_col:", "OK" if ok else "WRONG RESULT")
except Exception as e:  # noqa: BLE001
    print(f"masked_sum_col: FAIL — {str(e).splitlines()[0][:120]}")
