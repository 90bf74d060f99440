"""Stage-level TPU timing for the flagship OTPose forward.

Times each model stage in isolation (chained jit iterations, scalar-fetch
fence — see bench.py for why block_until_ready is not enough here) and prints
a breakdown table.  Used to target perf work; results recorded in STATUS.md.

Usage:  python tools/profile_stages.py [--batch 16] [--iters 10]
(train-step timing lives in tools/time_train_step.py; op-level traces in
tools/trace_ops.py)
"""

from __future__ import annotations

import argparse
import sys
import time
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def fence(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(jax.device_get(leaf.ravel()[0])))


def timeit(fn, args, iters):
    out = fn(*args)
    fence(out)  # compile
    fence(fn(*args))  # warm
    t0 = time.perf_counter()
    outs = None
    for _ in range(iters):
        outs = fn(*args)
    fence(outs)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stages", type=str, default="",
                    help="comma-separated subset to run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from otpose_tpu.models import rsb
    from otpose_tpu.models.conv_transformer import conv_transformer_forward
    from otpose_tpu.models.core import Ctx
    from otpose_tpu.models.hrnet import hrnet_forward
    from otpose_tpu.models.otpose import OTPoseSpec, init_otpose, otpose_forward
    from otpose_tpu.ops.deform_conv import modulated_deform_conv_multi
    from otpose_tpu.utils.testing import flagship_otpose_cfg

    cfg = flagship_otpose_cfg()
    spec = OTPoseSpec.from_cfg(cfg)
    params, state = init_otpose(jax.random.PRNGKey(0), spec)
    b = args.batch
    hh, ww = 384, 288
    ph, pw = spec.pe_h, spec.pe_w
    j = spec.num_joints
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rng = np.random.RandomState(0)

    x = jnp.asarray(rng.randn(b, hh, ww, 15), jnp.float32)
    margin = jnp.ones((b, 4), jnp.float32)
    frames5 = jnp.asarray(rng.randn(5 * b, hh, ww, 3), dt)
    heat = jnp.asarray(rng.randn(b, ph, pw, j), dt)
    x136 = jnp.asarray(rng.randn(b, ph, pw, j * spec.num_frames), dt)
    trans = jnp.asarray(rng.randn(b, ph, pw, spec.def_ch), dt)

    stages = {}

    def full(params, state, x, margin):
        ctx = Ctx(params, state, train=False, compute_dtype=dt)
        return otpose_forward(ctx, x, margin, spec)[0]

    stages["full_forward"] = (jax.jit(full), (params, state, x, margin), b)

    def hrnet_only(params, state, f):
        ctx = Ctx(params, state, train=False, compute_dtype=dt)
        return hrnet_forward(ctx.sub("rough_pose_estimation_net"), f, spec.hrnet)

    stages["hrnet_5b"] = (jax.jit(hrnet_only), (params, state, frames5), b)

    def flow_only(params, state, h):
        ctx = Ctx(params, state, train=False, compute_dtype=dt)
        return conv_transformer_forward(ctx.sub("flow_encoder"), h,
                                        spec.flow_spec())[0]

    stages["flow_encoder"] = (jax.jit(flow_only), (params, state, heat), b)

    def temporal_one(params, state, xx):
        ctx = Ctx(params, state, train=False, compute_dtype=dt)
        return conv_transformer_forward(ctx.sub("temporal_encoder1"), xx,
                                        spec.temporal_spec())[0]

    stages["temporal_encoder_x1"] = (jax.jit(temporal_one),
                                     (params, state, x136), b)

    def rsb_stage(params, state, h, br):
        ctx = Ctx(params, state, train=False, compute_dtype=dt)
        dh = rsb.chain_rsb_blocks(ctx.sub("def_fuse"), h, j, j,
                                  spec.offset_mask_combine_blocks)
        tr = rsb.chain_rsb_blocks(ctx.sub("offset_mask_combine_conv"),
                                  jnp.concatenate([br, dh], axis=-1),
                                  j * 3, spec.def_ch,
                                  spec.offset_mask_combine_blocks)
        return tr

    br34 = jnp.asarray(rng.randn(b, ph, pw, 2 * j), dt)
    stages["rsb_chains"] = (jax.jit(rsb_stage), (params, state, heat, br34), b)

    def deform_stage(params, state, tr, dh):
        ctx = Ctx(params, state, train=False, compute_dtype=dt)
        offsets_list, masks_list = [], []
        for d_idx, dilation in enumerate(spec.dilations):
            offsets_list.append(ctx.conv2d(f"offsets_list.{d_idx}.0", tr,
                                           padding=dilation, dilation=dilation,
                                           bias=False))
            masks_list.append(ctx.conv2d(f"masks_list.{d_idx}.0", tr,
                                         padding=dilation, dilation=dilation,
                                         bias=False))
        weights = jnp.stack([
            ctx.param(f"modulated_deform_conv_list.{d}.deform_conv.weight")
            for d in range(len(spec.dilations))])
        biases = jnp.stack([
            ctx.param(f"modulated_deform_conv_list.{d}.deform_conv.bias")
            for d in range(len(spec.dilations))])
        return modulated_deform_conv_multi(
            dh, offsets_list, masks_list, weights, biases, kernel=3, stride=1,
            padding_list=tuple(spec.dilations),
            dilation_list=tuple(spec.dilations), deformable_groups=j)

    stages["deform_stage"] = (jax.jit(deform_stage),
                              (params, state, trans, heat), b)

    def offsets_convs_only(params, state, tr):
        ctx = Ctx(params, state, train=False, compute_dtype=dt)
        outs = []
        for d_idx, dilation in enumerate(spec.dilations):
            outs.append(ctx.conv2d(f"offsets_list.{d_idx}.0", tr,
                                   padding=dilation, dilation=dilation,
                                   bias=False))
            outs.append(ctx.conv2d(f"masks_list.{d_idx}.0", tr,
                                   padding=dilation, dilation=dilation,
                                   bias=False))
        return sum(o.sum() for o in outs)

    stages["offset_mask_convs"] = (jax.jit(offsets_convs_only),
                                   (params, state, trans), b)

    def deform_core_only(params, state, dh, off, msk):
        ctx = Ctx(params, state, train=False, compute_dtype=dt)
        weights = jnp.stack([
            ctx.param(f"modulated_deform_conv_list.{d}.deform_conv.weight")
            for d in range(len(spec.dilations))])
        biases = jnp.stack([
            ctx.param(f"modulated_deform_conv_list.{d}.deform_conv.bias")
            for d in range(len(spec.dilations))])
        return modulated_deform_conv_multi(
            dh, list(off), list(msk), weights, biases, kernel=3, stride=1,
            padding_list=tuple(spec.dilations),
            dilation_list=tuple(spec.dilations), deformable_groups=j)

    off = jnp.asarray(rng.randn(len(spec.dilations), b, ph, pw, j * 18) * 2, dt)
    msk = jnp.asarray(rng.rand(len(spec.dilations), b, ph, pw, j * 9), dt)
    stages["deform_core"] = (jax.jit(deform_core_only),
                             (params, state, heat, off, msk), b)

    want = [s.strip() for s in args.stages.split(",") if s.strip()] or None
    print(f"backend={jax.default_backend()} batch={b} dtype={dt.__name__}")
    results = {}
    for name, (fn, a, clips) in stages.items():
        if want and name not in want:
            continue
        try:
            dt_s = timeit(fn, a, args.iters)
            results[name] = dt_s
            print(f"{name:24s} {dt_s * 1e3:9.2f} ms   "
                  f"{clips / dt_s:9.1f} clips/s")
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}")
    if "full_forward" in results:
        full_t = results["full_forward"]
        known = sum(v for k, v in results.items()
                    if k in ("hrnet_5b", "flow_encoder", "rsb_chains",
                             "offset_mask_convs", "deform_core"))
        known += 2 * results.get("temporal_encoder_x1", 0.0)
        print(f"{'sum_of_stages':24s} {known * 1e3:9.2f} ms   "
              f"(full {full_t * 1e3:.2f} ms)")


if __name__ == "__main__":
    main()
