"""Construct the *reference* torch OTPose on CPU for full-model parity tests.

The reference model is CUDA-only as written (compiled deform_conv extension,
``.cuda()`` calls in __init__/forward, torchvision imports).  For oracle use
we inject:
- a pure-torch DCNv2 (``ModulatedDeformConv``) implementing the exact CUDA
  semantics via the separable tent formulation (validated against the same
  dense numpy oracle as our JAX op), or a float32 ``F.grid_sample``
  equivalent ("fast") used as bench.py's realistic CPU-reference baseline,
- no-op ``.cuda()`` patches,
- a minimal torchvision stub.

This file implements torch *stand-ins written from the op's mathematical
definition*; no reference code is copied.
"""

from __future__ import annotations

import sys
import types

_LAST_DCN_IMPL = None
_DCN_CLASSES = None


def get_dcn_classes():
    """(oracle, fast) pure-torch ModulatedDeformConv classes.

    oracle: float64 separable-tent formulation (parity tests).
    fast:   float32 F.grid_sample formulation — identical semantics
            (grid_sample zero padding == the tent's zero-outside bilinear;
            align_corners=True maps -1..1 linearly onto pixel 0..size-1),
            the realistic efficient CPU implementation.
    """
    global _DCN_CLASSES
    if _DCN_CLASSES is not None:
        return _DCN_CLASSES

    import torch
    import torch.nn as nn

    class ModulatedDeformConv(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, deformable_groups=1,
                     bias=True):
            super().__init__()
            if isinstance(kernel_size, tuple):
                kernel_size = kernel_size[0]
            self.in_channels = in_channels
            self.out_channels = out_channels
            self.kernel_size = kernel_size
            self.stride = stride
            self.padding = padding
            self.dilation = dilation
            self.groups = groups
            self.deformable_groups = deformable_groups
            self.weight = nn.Parameter(
                torch.empty(out_channels, in_channels // groups, kernel_size,
                            kernel_size))
            self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None
            n = in_channels * kernel_size * kernel_size
            self.weight.data.uniform_(-(n ** -0.5), n ** -0.5)

        def forward(self, x, offset, mask):
            b, c, hh, ww = x.shape
            k = self.kernel_size
            k2 = k * k
            dg = self.deformable_groups
            # output grid == input grid (stride 1, same padding in OTPose)
            ys = torch.arange(hh, dtype=torch.float64) * self.stride - self.padding
            xs = torch.arange(ww, dtype=torch.float64) * self.stride - self.padding
            off = offset.double().reshape(b, dg, k2, 2, hh, ww)
            msk = mask.double().reshape(b, dg, k2, hh, ww)
            iy = torch.arange(hh, dtype=torch.float64)
            ix = torch.arange(ww, dtype=torch.float64)
            xg = x.double().reshape(b, dg, c // dg, hh, ww)

            out = torch.zeros(b, self.out_channels, hh, ww, dtype=torch.float64)
            wk = self.weight.double().reshape(self.out_channels, dg, c // dg, k2)
            for kidx in range(k2):
                dy = (kidx // k) * self.dilation
                dx = (kidx % k) * self.dilation
                sy = ys[None, None, :, None] + dy + off[:, :, kidx, 0]
                sx = xs[None, None, None, :] + dx + off[:, :, kidx, 1]
                wy = (1 - (sy[..., None] - iy).abs()).clamp(min=0)  # (B,dg,H,W,Hs)
                wx = (1 - (sx[..., None] - ix).abs()).clamp(min=0)
                a = torch.einsum("bghwy,bgcyx->bghwcx", wy, xg)
                s = torch.einsum("bghwcx,bghwx->bghwc", a, wx)
                s = s * msk[:, :, kidx, :, :, None]
                out = out + torch.einsum("bghwc,ogc->bohw", s, wk[:, :, :, kidx])
            if self.bias is not None:
                out = out + self.bias.double()[None, :, None, None]
            return out.float()

    class FastModulatedDeformConv(ModulatedDeformConv):
        def forward(self, x, offset, mask):
            import torch.nn.functional as F

            b, c, hh, ww = x.shape
            k = self.kernel_size
            k2 = k * k
            dg = self.deformable_groups
            cpg = c // dg
            off = offset.reshape(b, dg, k2, 2, hh, ww)
            msk = mask.reshape(b, dg, k2, hh, ww)
            ys = (torch.arange(hh, dtype=x.dtype) * self.stride - self.padding)
            xs = (torch.arange(ww, dtype=x.dtype) * self.stride - self.padding)
            xg = x.reshape(b * dg, cpg, hh, ww)
            cols = []
            for kidx in range(k2):
                dy = (kidx // k) * self.dilation
                dx = (kidx % k) * self.dilation
                sy = ys[None, None, :, None] + dy + off[:, :, kidx, 0]
                sx = xs[None, None, None, :] + dx + off[:, :, kidx, 1]
                gx = 2.0 * sx / max(ww - 1, 1) - 1.0
                gy = 2.0 * sy / max(hh - 1, 1) - 1.0
                grid = torch.stack([gx, gy], dim=-1).reshape(b * dg, hh, ww, 2)
                s = F.grid_sample(xg, grid, mode="bilinear",
                                  padding_mode="zeros", align_corners=True)
                cols.append(s.reshape(b, dg, cpg, hh, ww)
                            * msk[:, :, kidx, None])
            col = torch.stack(cols, dim=2)          # (B, dg, K2, cpg, H, W)
            wk = self.weight.reshape(self.out_channels, dg, cpg, k2)
            out = torch.einsum("bgkchw,ogck->bohw", col, wk)
            if self.bias is not None:
                out = out + self.bias[None, :, None, None]
            return out

    _DCN_CLASSES = (ModulatedDeformConv, FastModulatedDeformConv)
    return _DCN_CLASSES


def build_reference_otpose(cfg, dcn_impl: str = "oracle"):
    """``dcn_impl``: "oracle" = float64 separable-tent DCNv2 (parity tests);
    "fast" = float32 grid_sample DCNv2 (bench.py CPU-reference baseline —
    the baseline is not penalized by the oracle's dense tents).
    """
    import torch
    import torch.nn as nn

    # -- torchvision stub (only transforms API surface is touched on import)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")

        class _Noop:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        tvt.Compose = lambda fns: (lambda x: x)
        tvt.ToTensor = _Noop
        tvt.Normalize = _Noop
        tvt.GaussianBlur = _Noop
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt

    ModulatedDeformConv, FastModulatedDeformConv = get_dcn_classes()

    class DeformConv(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()
            self.weight = nn.Parameter(torch.zeros(1, 1, 3, 3))

    fake = types.ModuleType("thirdparty.deform_conv")
    fake.ModulatedDeformConv = (FastModulatedDeformConv if dcn_impl == "fast"
                                else ModulatedDeformConv)
    fake.DeformConv = DeformConv
    fake_pkg = types.ModuleType("thirdparty")
    fake_pkg.deform_conv = fake
    sys.modules.setdefault("thirdparty", fake_pkg)
    sys.modules["thirdparty.deform_conv"] = fake

    # -- neutralize .cuda()
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import importlib

    # the reference's model.layers binds ModulatedDeformConv at import time;
    # force a reimport when the requested DCN implementation changes
    global _LAST_DCN_IMPL
    if _LAST_DCN_IMPL not in (None, dcn_impl):
        for mod in [m for m in sys.modules
                    if m == "model" or m.startswith("model.")]:
            del sys.modules[mod]
    _LAST_DCN_IMPL = dcn_impl

    otpose_mod = importlib.import_module("model.OTPose")
    return otpose_mod.OTPose(cfg)
