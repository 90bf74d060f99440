import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otpose_tpu.ops.deform_conv import identity_filler_weight, modulated_deform_conv


def _oracle(x, offsets, mask, weight, bias, kernel, stride, padding, dilation, dg):
    """Dense numpy transcription of the reference CUDA semantics
    (thirdparty/deform_conv/src/deform_conv_cuda_kernel.cu:505-604):
    per-output-pixel, per-group bilinear sampling with zero outside,
    modulation before the weight contraction.
    x: (B, C, H, W); offsets: (B, dg*2*K2, Ho, Wo); mask: (B, dg*K2, Ho, Wo);
    weight: (O, C, Kh, Kw)."""
    b, c, h, w = x.shape
    o_ch = weight.shape[0]
    k2 = kernel * kernel
    ho = (h + 2 * padding - (dilation * (kernel - 1) + 1)) // stride + 1
    wo = (w + 2 * padding - (dilation * (kernel - 1) + 1)) // stride + 1
    cpg = c // dg
    out = np.zeros((b, o_ch, ho, wo), dtype=np.float64)

    def bilinear(img, sy, sx):
        if sy <= -1 or sy >= h or sx <= -1 or sx >= w:
            return 0.0
        y0, x0 = int(np.floor(sy)), int(np.floor(sx))
        ly, lx = sy - y0, sx - x0
        val = 0.0
        for (yy, xx, wt) in ((y0, x0, (1 - ly) * (1 - lx)), (y0, x0 + 1, (1 - ly) * lx),
                             (y0 + 1, x0, ly * (1 - lx)), (y0 + 1, x0 + 1, ly * lx)):
            if 0 <= yy < h and 0 <= xx < w:
                val += wt * img[yy, xx]
        return val

    for bb in range(b):
        for oy in range(ho):
            for ox in range(wo):
                for ci in range(c):
                    g = ci // cpg
                    for ky in range(kernel):
                        for kx in range(kernel):
                            kidx = ky * kernel + kx
                            dy = offsets[bb, (g * k2 + kidx) * 2, oy, ox]
                            dx = offsets[bb, (g * k2 + kidx) * 2 + 1, oy, ox]
                            m = mask[bb, g * k2 + kidx, oy, ox]
                            sy = oy * stride - padding + ky * dilation + dy
                            sx = ox * stride - padding + kx * dilation + dx
                            val = bilinear(x[bb, ci], sy, sx) * m
                            out[bb, :, oy, ox] += weight[:, ci, ky, kx] * val
    if bias is not None:
        out += bias[None, :, None, None]
    return out


def _run_ours(x, offsets, mask, weight, bias, **kw):
    y = modulated_deform_conv(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(offsets.transpose(0, 2, 3, 1)),
        jnp.asarray(mask.transpose(0, 2, 3, 1)),
        jnp.asarray(weight.transpose(2, 3, 1, 0)),
        jnp.asarray(bias) if bias is not None else None, **kw)
    return np.asarray(y).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("dg,c,dilation", [(1, 4, 1), (4, 4, 2), (2, 6, 3)])
def test_matches_dense_oracle(rng, dg, c, dilation):
    b, h, w, kernel = 2, 8, 9, 3
    k2 = kernel * kernel
    pad = dilation
    x = rng.randn(b, c, h, w).astype(np.float32)
    offsets = (rng.randn(b, dg * 2 * k2, h, w) * 2).astype(np.float32)
    mask = rng.rand(b, dg * k2, h, w).astype(np.float32)
    weight = rng.randn(c, c, kernel, kernel).astype(np.float32)
    bias = rng.randn(c).astype(np.float32)
    y_ref = _oracle(x, offsets, mask, weight, bias, kernel, 1, pad, dilation, dg)
    y = _run_ours(x, offsets, mask, weight, bias, kernel=kernel, stride=1,
                  padding=pad, dilation=dilation, deformable_groups=dg)
    np.testing.assert_allclose(y, y_ref, atol=1e-4)


def test_zero_offset_identity_mask_equals_dilated_conv(rng):
    """Zero offsets + unit mask => plain dilated convolution."""
    torch = pytest.importorskip("torch")
    b, c, h, w, dilation = 1, 5, 12, 10, 2
    x = rng.randn(b, c, h, w).astype(np.float32)
    weight = rng.randn(c, c, 3, 3).astype(np.float32)
    offsets = np.zeros((b, c * 18, h, w), dtype=np.float32)
    mask = np.ones((b, c * 9, h, w), dtype=np.float32)
    y = _run_ours(x, offsets, mask, weight, None, kernel=3, stride=1,
                  padding=dilation, dilation=dilation, deformable_groups=c)
    with torch.no_grad():
        y_t = torch.nn.functional.conv2d(torch.from_numpy(x), torch.from_numpy(weight),
                                         padding=dilation, dilation=dilation).numpy()
    np.testing.assert_allclose(y, y_t, atol=1e-4)


def test_identity_filler_passthrough(rng):
    """Identity-filler weight + zero offsets + unit mask => input passthrough
    (the reference init makes def-conv start as identity, ref: OTPose.py:462-469)."""
    c, h, w = 17, 12, 9
    x = rng.randn(1, c, h, w).astype(np.float32)
    weight = np.asarray(identity_filler_weight(c, 3)).transpose(3, 2, 0, 1)
    offsets = np.zeros((1, c * 18, h, w), dtype=np.float32)
    mask = np.ones((1, c * 9, h, w), dtype=np.float32)
    y = _run_ours(x, offsets, mask, weight, None, kernel=3, stride=1,
                  padding=1, dilation=1, deformable_groups=c)
    np.testing.assert_allclose(y, x, atol=1e-5)


def test_half_pixel_shift_interpolates(rng):
    """Constant +0.5 x-offset with identity weight == average of horizontal
    neighbors (bilinear check)."""
    c, h, w = 3, 6, 8
    x = rng.randn(1, c, h, w).astype(np.float32)
    weight = np.asarray(identity_filler_weight(c, 3)).transpose(3, 2, 0, 1)
    offsets = np.zeros((1, c * 18, h, w), dtype=np.float32)
    offsets[:, 1::2] = 0.5  # dx channels
    mask = np.ones((1, c * 9, h, w), dtype=np.float32)
    y = _run_ours(x, offsets, mask, weight, None, kernel=3, stride=1,
                  padding=1, dilation=1, deformable_groups=c)
    expected = 0.5 * (x[..., :, :] + np.pad(x, ((0, 0),) * 3 + ((0, 1),))[..., :, 1:w + 1])
    np.testing.assert_allclose(y[..., : w - 1], expected[..., : w - 1], atol=1e-5)


def test_gradients_flow(rng):
    b, c, h, w = 1, 4, 6, 6
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    offsets = jnp.asarray(0.1 * rng.randn(b, h, w, c * 18).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, h, w, c * 9).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32))

    def loss(x, offsets, mask, weight):
        y = modulated_deform_conv(x, offsets, mask, weight, None, kernel=3,
                                  stride=1, padding=1, dilation=1,
                                  deformable_groups=c)
        return jnp.sum(y ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, offsets, mask, weight)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


def test_tent_matches_gather_formulation(rng):
    """The MXU tent-matmul path must agree with the gather path bit-for-bit
    (both validated against the dense oracle independently)."""
    from otpose_tpu.ops.deform_conv import modulated_deform_conv_gather
    import jax.numpy as jnp

    b, c, h, w, dg = 2, 6, 10, 9, 3
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    offsets = jnp.asarray((rng.randn(b, h, w, dg * 18) * 3).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, h, w, dg * 9).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32))
    kw = dict(kernel=3, stride=1, padding=2, dilation=2, deformable_groups=dg)
    y_tent = modulated_deform_conv(x, offsets, mask, weight, None, **kw)
    y_gather = modulated_deform_conv_gather(x, offsets, mask, weight, None, **kw)
    np.testing.assert_allclose(np.asarray(y_tent), np.asarray(y_gather),
                               atol=2e-4)


def test_multi_dilation_equals_mean_of_singles(rng):
    from otpose_tpu.ops.deform_conv import modulated_deform_conv_multi
    import jax.numpy as jnp

    b, c, h, w, dg = 2, 4, 8, 8, 4
    dilations = (1, 2)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    offs = [jnp.asarray((rng.randn(b, h, w, dg * 18) * 2).astype(np.float32))
            for _ in dilations]
    msks = [jnp.asarray(rng.rand(b, h, w, dg * 9).astype(np.float32))
            for _ in dilations]
    wgts = [jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32))
            for _ in dilations]
    bias = [jnp.asarray(rng.randn(c).astype(np.float32)) for _ in dilations]

    singles = [
        modulated_deform_conv(x, offs[i], msks[i], wgts[i], bias[i], kernel=3,
                              stride=1, padding=d, dilation=d,
                              deformable_groups=dg)
        for i, d in enumerate(dilations)
    ]
    expected = sum(np.asarray(s) for s in singles) / len(dilations)
    fused = modulated_deform_conv_multi(
        x, offs, msks, jnp.stack(wgts), jnp.stack(bias), kernel=3, stride=1,
        padding_list=dilations, dilation_list=dilations, deformable_groups=dg)
    np.testing.assert_allclose(np.asarray(fused), expected, atol=1e-4)


def test_multi_unroll_is_exact(rng):
    """`unroll` is a pure scheduling knob: the unrolled scan must reproduce
    unroll=1 bitwise (same carry-chain order) for values AND gradients."""
    from otpose_tpu.ops.deform_conv import modulated_deform_conv_multi
    import jax
    import jax.numpy as jnp

    b, c, h, w, dg = 2, 4, 8, 8, 4
    dilations = (1, 2)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    offs = [jnp.asarray((rng.randn(b, h, w, dg * 18) * 2).astype(np.float32))
            for _ in dilations]
    msks = [jnp.asarray(rng.rand(b, h, w, dg * 9).astype(np.float32))
            for _ in dilations]
    wgts = jnp.stack([jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32))
                      for _ in dilations])

    def loss(x, offs, msks, wgts, unroll):
        out = modulated_deform_conv_multi(
            x, offs, msks, wgts, None, kernel=3, stride=1,
            padding_list=dilations, dilation_list=dilations,
            deformable_groups=dg, unroll=unroll)
        return jnp.sum(out)

    g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))
    v1, g1 = g(x, offs, msks, wgts, 1)
    for unroll in (3, 18):  # partial and full (2*9 taps)
        vu, gu = g(x, offs, msks, wgts, unroll)
        assert float(v1) == float(vu)
        for a, b2 in zip(jax.tree_util.tree_leaves(g1),
                         jax.tree_util.tree_leaves(gu)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))


def test_deform_conv_v1_equals_modulated_with_ones_mask(rng):
    """DCNv1 package-API parity (ref: thirdparty/deform_conv/functions/
    deform_conv.py::deform_conv): unmodulated == mask-of-ones DCNv2."""
    from otpose_tpu.ops.deform_conv import deform_conv

    b, c, h, w, dg, kernel = 2, 4, 6, 7, 2, 3
    k2 = kernel * kernel
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    offsets = jnp.asarray((rng.randn(b, h, w, dg * 2 * k2) * 2).astype(np.float32))
    weight = jnp.asarray(rng.randn(kernel, kernel, c, c).astype(np.float32))
    bias = jnp.asarray(rng.randn(c).astype(np.float32))
    y1 = deform_conv(x, offsets, weight, bias, kernel=kernel, padding=1,
                     deformable_groups=dg)
    ones = jnp.ones((b, h, w, dg * k2), jnp.float32)
    y2 = modulated_deform_conv(x, offsets, ones, weight, bias, kernel=kernel,
                               padding=1, deformable_groups=dg)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_grouped_matches_blockdiag_oracle(rng):
    """groups=2 == dense conv with a block-diagonal weight (each group's
    cross-group weights zero), checked via the dense numpy oracle."""
    b, c, h, w, dg, kernel, groups = 2, 8, 6, 7, 4, 3, 2
    k2 = kernel * kernel
    cin_g, cout_g = c // groups, c // groups
    x = rng.randn(b, c, h, w).astype(np.float32)
    offsets = (rng.randn(b, dg * 2 * k2, h, w) * 2).astype(np.float32)
    mask = rng.rand(b, dg * k2, h, w).astype(np.float32)
    # grouped weight (OIHW with I = cin_g)
    wg = rng.randn(c, cin_g, kernel, kernel).astype(np.float32)
    bias = rng.randn(c).astype(np.float32)
    # embed into a block-diagonal dense weight for the oracle
    wd = np.zeros((c, c, kernel, kernel), np.float32)
    for g in range(groups):
        wd[g * cout_g:(g + 1) * cout_g, g * cin_g:(g + 1) * cin_g] = \
            wg[g * cout_g:(g + 1) * cout_g]
    y_ref = _oracle(x, offsets, mask, wd, bias, kernel, 1, 1, 1, dg)
    y = modulated_deform_conv(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(offsets.transpose(0, 2, 3, 1)),
        jnp.asarray(mask.transpose(0, 2, 3, 1)),
        jnp.asarray(wg.transpose(2, 3, 1, 0)),
        jnp.asarray(bias), kernel=kernel, stride=1, padding=1, dilation=1,
        deformable_groups=dg, groups=groups)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), y_ref,
                               atol=1e-4)


def test_ops_package_api_surface():
    """The reference package exports these names
    (thirdparty/deform_conv/__init__.py); ours must too."""
    import otpose_tpu.ops as ops

    for name in ("deform_conv", "modulated_deform_conv", "deform_roi_pooling"):
        assert callable(getattr(ops, name)), name


def test_torch_fast_dcn_matches_oracle(rng):
    """The grid_sample DCNv2 used as bench.py's CPU-reference baseline must
    reproduce the float64 tent-oracle stand-in (same CUDA semantics)."""
    torch = pytest.importorskip("torch")
    from tests.helpers.torch_otpose import get_dcn_classes

    oracle_cls, fast_cls = get_dcn_classes()
    b, c, h, w, dg, k = 2, 4, 7, 6, 2, 3
    k2 = k * k
    x = torch.tensor(rng.randn(b, c, h, w), dtype=torch.float32)
    off = torch.tensor(rng.randn(b, dg * 2 * k2, h, w) * 2, dtype=torch.float32)
    msk = torch.tensor(rng.rand(b, dg * k2, h, w), dtype=torch.float32)

    o = oracle_cls(c, c, k, padding=1, dilation=1, deformable_groups=dg)
    f = fast_cls(c, c, k, padding=1, dilation=1, deformable_groups=dg)
    f.load_state_dict(o.state_dict())
    with torch.no_grad():
        yo = o(x, off, msk).numpy()
        yf = f(x, off, msk).numpy()
    np.testing.assert_allclose(yf, yo, atol=2e-5)
