"""HRNet pose backbone, TPU-native functional implementation.

Mirrors the reference graph exactly (ref: model/HRNet.py:57-250,341-571):
two stride-2 3x3 stem convs, Bottleneck x4 layer1, three multi-branch
high-resolution stages with SUM fuse (nearest upsample / strided-conv
downsample), final 1x1 conv to per-joint heatmaps at 1/4 resolution.

Param keys equal the torch ``state_dict`` names, so pretrained COCO HRNet
checkpoints convert directly (ref: model/HRNet.py:16-34).
Activations are NHWC; kernels HWIO.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax.numpy as jnp

from otpose_tpu.models import core
from otpose_tpu.models.core import Ctx, KeyGen, relu


@dataclasses.dataclass(frozen=True)
class StageSpec:
    num_modules: int
    num_branches: int
    block: str                      # 'BASIC' | 'BOTTLENECK'
    num_blocks: Tuple[int, ...]
    num_channels: Tuple[int, ...]   # post-expansion channels


@dataclasses.dataclass(frozen=True)
class HRNetSpec:
    stage2: StageSpec
    stage3: StageSpec
    stage4: StageSpec
    num_joints: int
    final_conv_kernel: int

    @staticmethod
    def from_cfg(cfg) -> "HRNetSpec":
        extra = cfg.MODEL.EXTRA

        def stage(node) -> StageSpec:
            expansion = 4 if node.BLOCK == "BOTTLENECK" else 1
            return StageSpec(
                num_modules=node.NUM_MODULES,
                num_branches=node.NUM_BRANCHES,
                block=node.BLOCK,
                num_blocks=tuple(node.NUM_BLOCKS),
                num_channels=tuple(c * expansion for c in node.NUM_CHANNELS),
            )

        return HRNetSpec(
            stage2=stage(extra.STAGE2),
            stage3=stage(extra.STAGE3),
            stage4=stage(extra.STAGE4),
            num_joints=cfg.MODEL.NUM_JOINTS,
            final_conv_kernel=extra.FINAL_CONV_KERNEL,
        )


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _basic_block(ctx: Ctx, x: jnp.ndarray, has_downsample: bool) -> jnp.ndarray:
    """ref: model/HRNet.py:500-530."""
    residual = x
    out = ctx.conv2d("conv1", x, stride=1, padding=1, bias=False)
    out = relu(ctx.batch_norm("bn1", out))
    out = ctx.conv2d("conv2", out, stride=1, padding=1, bias=False)
    out = ctx.batch_norm("bn2", out)
    if has_downsample:
        residual = ctx.batch_norm("downsample.1", ctx.conv2d("downsample.0", x, bias=False))
    return relu(out + residual)


def _bottleneck(ctx: Ctx, x: jnp.ndarray, has_downsample: bool) -> jnp.ndarray:
    """ref: model/HRNet.py:533-571."""
    residual = x
    out = relu(ctx.batch_norm("bn1", ctx.conv2d("conv1", x, bias=False)))
    out = relu(ctx.batch_norm("bn2", ctx.conv2d("conv2", out, stride=1, padding=1, bias=False)))
    out = ctx.batch_norm("bn3", ctx.conv2d("conv3", out, bias=False))
    if has_downsample:
        residual = ctx.batch_norm("downsample.1", ctx.conv2d("downsample.0", x, bias=False))
    return relu(out + residual)


def _branch_blocks(ctx: Ctx, x: jnp.ndarray, block: str, num_blocks: int,
                   in_ch: int, out_ch: int) -> jnp.ndarray:
    for b in range(num_blocks):
        sub = ctx.sub(str(b))
        has_ds = (b == 0 and in_ch != out_ch)
        x = _bottleneck(sub, x, has_ds) if block == "BOTTLENECK" else _basic_block(sub, x, has_ds)
    return x


_bn_multi = core.batch_norm_multi


def _hr_module(ctx: Ctx, xs: List[jnp.ndarray], spec: StageSpec,
               multi_scale_output: bool) -> List[jnp.ndarray]:
    """One HighResolutionModule (ref: model/HRNet.py:478-496).

    The fuse layers are evaluated grouped by SOURCE branch: all 1x1 up-paths
    out of branch j (and all first-hop strided 3x3 down-convs out of branch
    j) read the same input, so their convs run as ONE conv with concatenated
    output channels and one concatenated BN (`_bn_multi`).  Math is
    unchanged (independent output channels); kernel count and MXU lane
    utilization improve (e.g. stage4 source 3 emits 48+96+192 channels in
    one conv instead of three 37%/75%-padded ones).
    """
    nb = spec.num_branches
    xs = [
        _branch_blocks(ctx.sub(f"branches.{i}"), xs[i], spec.block,
                       spec.num_blocks[i], spec.num_channels[i], spec.num_channels[i])
        for i in range(nb)
    ]
    if nb == 1:
        return xs

    num_out = nb if multi_scale_output else 1
    ch = spec.num_channels
    dt = ctx.compute_dtype
    # contributions[i][j] = branch j's addend for output i
    contrib = [[None] * nb for _ in range(num_out)]
    for i in range(num_out):
        if i < nb:
            contrib[i][i] = xs[i]

    for j in range(nb):
        # ---- up-paths (j > i): 1x1 conv + BN + nearest upsample ----------
        ups = [i for i in range(num_out) if i < j]
        if ups:
            wcat = jnp.concatenate(
                [ctx.param(f"fuse_layers.{i}.{j}.0.weight") for i in ups],
                axis=-1)
            y = core.conv2d(xs[j], wcat, compute_dtype=dt)
            y = _bn_multi(ctx, [f"fuse_layers.{i}.{j}.1" for i in ups],
                          [ch[i] for i in ups], y)
            off = 0
            for i in ups:
                contrib[i][j] = core.upsample_nearest_2x(
                    y[..., off:off + ch[i]], 2 ** (j - i))
                off += ch[i]
        # ---- down-paths (j < i): chains of strided 3x3 convs -------------
        downs = [i for i in range(num_out) if i > j]
        if downs:
            # first hop is shared-input across targets -> one conv
            cout0 = {i: (ch[i] if i - j == 1 else ch[j]) for i in downs}
            wcat = jnp.concatenate(
                [ctx.param(f"fuse_layers.{i}.{j}.0.0.weight") for i in downs],
                axis=-1)
            y = core.conv2d(xs[j], wcat, stride=2, padding=1, compute_dtype=dt)
            y = _bn_multi(ctx, [f"fuse_layers.{i}.{j}.0.1" for i in downs],
                          [cout0[i] for i in downs], y)
            off = 0
            for i in downs:
                z = y[..., off:off + cout0[i]]
                off += cout0[i]
                # remaining hops diverge (ref: HRNet.py:444-473): relu on all
                # but the last conv of each chain
                if i - j > 1:
                    z = relu(z)
                    for k in range(1, i - j):
                        sub = ctx.sub(f"fuse_layers.{i}.{j}.{k}")
                        z = sub.batch_norm("1", sub.conv2d("0", z, stride=2,
                                                           padding=1, bias=False))
                        if k != i - j - 1:
                            z = relu(z)
                contrib[i][j] = z

    # same accumulation order as the reference loop (j ascending)
    out = []
    for i in range(num_out):
        y = contrib[i][0]
        for j in range(1, nb):
            y = y + contrib[i][j]
        out.append(relu(y))
    return out


def hrnet_forward(ctx: Ctx, x: jnp.ndarray, spec: HRNetSpec) -> jnp.ndarray:
    """HRNet forward: (B, H, W, 3) -> (B, H/4, W/4, num_joints)
    (ref: model/HRNet.py:116-152)."""
    x = relu(ctx.batch_norm("bn1", ctx.conv2d("conv1", x, stride=2, padding=1, bias=False)))
    x = relu(ctx.batch_norm("bn2", ctx.conv2d("conv2", x, stride=2, padding=1, bias=False)))
    x = _branch_blocks(ctx.sub("layer1"), x, "BOTTLENECK", 4, 64, 256)

    xs = _transition_multi(ctx, [x], [256], spec.stage2.num_channels, "transition1")
    for m in range(spec.stage2.num_modules):
        xs = _hr_module(ctx.sub(f"stage2.{m}"), xs, spec.stage2, True)

    xs = _transition_multi(ctx, xs, spec.stage2.num_channels, spec.stage3.num_channels,
                           "transition2")
    for m in range(spec.stage3.num_modules):
        xs = _hr_module(ctx.sub(f"stage3.{m}"), xs, spec.stage3, True)

    xs = _transition_multi(ctx, xs, spec.stage3.num_channels, spec.stage4.num_channels,
                           "transition3")
    for m in range(spec.stage4.num_modules):
        last = m == spec.stage4.num_modules - 1
        xs = _hr_module(ctx.sub(f"stage4.{m}"), xs, spec.stage4, not last)

    pad = 1 if spec.final_conv_kernel == 3 else 0
    return ctx.conv2d("final_layer", xs[0], padding=pad)


def _transition_multi(ctx: Ctx, ys: List[jnp.ndarray], prev_ch: Sequence[int],
                      cur_ch: Sequence[int], stage_name: str) -> List[jnp.ndarray]:
    """Transitions after stage2/3 feed the *last* branch into new branches
    (ref: model/HRNet.py:134-147)."""
    out = []
    for i in range(len(cur_ch)):
        if i < len(prev_ch) and cur_ch[i] == prev_ch[i]:
            out.append(ys[i])
        elif i < len(prev_ch):
            # channel-changing transition on an EXISTING branch: consume
            # ys[i].  The reference feeds ys[-1] here too (HRNet.py:134-147)
            # but that is resolution-inconsistent and its init channels
            # don't match either — the path is unrunnable upstream (only
            # BOTTLENECK stages exercise it); rebuilt fixed, see
            # tests/test_hrnet.py::test_bottleneck_stage_runs_...
            sub = ctx.sub(f"{stage_name}.{i}")
            out.append(relu(sub.batch_norm("1", sub.conv2d("0", ys[i], padding=1, bias=False))))
        else:
            x = ys[-1]
            for k in range(i + 1 - len(prev_ch)):
                sub = ctx.sub(f"{stage_name}.{i}.{k}")
                x = relu(sub.batch_norm("1", sub.conv2d("0", x, stride=2, padding=1, bias=False)))
            out.append(x)
    return out


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _add_conv(params, kg: KeyGen, key: str, kh: int, kw: int, cin: int, cout: int,
              bias: bool = False, std: float = 0.001):
    params[f"{key}.weight"] = core.normal_init(kg(), (kh, kw, cin, cout), std)
    if bias:
        params[f"{key}.bias"] = jnp.zeros((cout,))


def _add_bn(params, state, key: str, ch: int):
    params[f"{key}.weight"] = jnp.ones((ch,))
    params[f"{key}.bias"] = jnp.zeros((ch,))
    state[f"{key}.running_mean"] = jnp.zeros((ch,))
    state[f"{key}.running_var"] = jnp.ones((ch,))


def _init_basic_block(params, state, kg, prefix, cin, cout):
    _add_conv(params, kg, f"{prefix}.conv1", 3, 3, cin, cout)
    _add_bn(params, state, f"{prefix}.bn1", cout)
    _add_conv(params, kg, f"{prefix}.conv2", 3, 3, cout, cout)
    _add_bn(params, state, f"{prefix}.bn2", cout)
    if cin != cout:
        _add_conv(params, kg, f"{prefix}.downsample.0", 1, 1, cin, cout)
        _add_bn(params, state, f"{prefix}.downsample.1", cout)


def _init_bottleneck(params, state, kg, prefix, cin, planes):
    cout = planes * 4
    _add_conv(params, kg, f"{prefix}.conv1", 1, 1, cin, planes)
    _add_bn(params, state, f"{prefix}.bn1", planes)
    _add_conv(params, kg, f"{prefix}.conv2", 3, 3, planes, planes)
    _add_bn(params, state, f"{prefix}.bn2", planes)
    _add_conv(params, kg, f"{prefix}.conv3", 1, 1, planes, cout)
    _add_bn(params, state, f"{prefix}.bn3", cout)
    if cin != cout:
        _add_conv(params, kg, f"{prefix}.downsample.0", 1, 1, cin, cout)
        _add_bn(params, state, f"{prefix}.downsample.1", cout)


def _init_stage(params, state, kg, name: str, spec: StageSpec, multi_scale_last: bool):
    for m in range(spec.num_modules):
        for b in range(spec.num_branches):
            ch = spec.num_channels[b]
            for blk in range(spec.num_blocks[b]):
                prefix = f"{name}.{m}.branches.{b}.{blk}"
                if spec.block == "BOTTLENECK":
                    # num_channels is post-expansion (from_cfg multiplied by
                    # 4), so planes = ch // 4 (ref: HRNet.py blocks_dict +
                    # _make_one_branch expansion math)
                    _init_bottleneck(params, state, kg, prefix, ch, ch // 4)
                else:
                    _init_basic_block(params, state, kg, prefix, ch, ch)
        last = m == spec.num_modules - 1
        num_out = spec.num_branches if (multi_scale_last or not last) else 1
        if spec.num_branches > 1:
            for i in range(num_out):
                for j in range(spec.num_branches):
                    p = f"{name}.{m}.fuse_layers.{i}.{j}"
                    if j > i:
                        _add_conv(params, kg, f"{p}.0", 1, 1, spec.num_channels[j],
                                  spec.num_channels[i])
                        _add_bn(params, state, f"{p}.1", spec.num_channels[i])
                    elif j < i:
                        for k in range(i - j):
                            cout = spec.num_channels[i] if k == i - j - 1 else spec.num_channels[j]
                            _add_conv(params, kg, f"{p}.{k}.0", 3, 3, spec.num_channels[j], cout)
                            _add_bn(params, state, f"{p}.{k}.1", cout)


def _init_transition(params, state, kg, name, prev_ch, cur_ch):
    for i in range(len(cur_ch)):
        if i < len(prev_ch):
            if cur_ch[i] != prev_ch[i]:
                # existing-branch transition reads ys[i] (rebuilt fixed —
                # see _transition_multi; unrunnable upstream)
                _add_conv(params, kg, f"{name}.{i}.0", 3, 3, prev_ch[i],
                          cur_ch[i])
                _add_bn(params, state, f"{name}.{i}.1", cur_ch[i])
        else:
            for k in range(i + 1 - len(prev_ch)):
                cin = prev_ch[-1]
                cout = cur_ch[i] if k == i - len(prev_ch) else cin
                _add_conv(params, kg, f"{name}.{i}.{k}.0", 3, 3, cin, cout)
                _add_bn(params, state, f"{name}.{i}.{k}.1", cout)


def init_hrnet(key, spec: HRNetSpec):
    """Fresh params/state with the reference init distribution
    (conv normal std=0.001, BN weight 1 / bias 0 — ref: model/OTPose.py:439-447)."""
    kg = KeyGen(key)
    params: dict = {}
    state: dict = {}
    _add_conv(params, kg, "conv1", 3, 3, 3, 64)
    _add_bn(params, state, "bn1", 64)
    _add_conv(params, kg, "conv2", 3, 3, 64, 64)
    _add_bn(params, state, "bn2", 64)
    cin = 64
    for b in range(4):
        _init_bottleneck(params, state, kg, f"layer1.{b}", cin, 64)
        cin = 256
    _init_transition(params, state, kg, "transition1", [256], spec.stage2.num_channels)
    _init_stage(params, state, kg, "stage2", spec.stage2, True)
    _init_transition(params, state, kg, "transition2", spec.stage2.num_channels,
                     spec.stage3.num_channels)
    _init_stage(params, state, kg, "stage3", spec.stage3, True)
    _init_transition(params, state, kg, "transition3", spec.stage3.num_channels,
                     spec.stage4.num_channels)
    _init_stage(params, state, kg, "stage4", spec.stage4, False)
    k = spec.final_conv_kernel
    _add_conv(params, kg, "final_layer", k, k, spec.stage4.num_channels[0],
              spec.num_joints, bias=True)
    return params, state
