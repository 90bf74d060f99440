"""Pallas fused deform kernel vs the XLA tent formulation (interpret mode on
CPU; the compiled path runs on real TPU only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otpose_tpu.ops.deform_conv import modulated_deform_conv_multi
from otpose_tpu.ops.pallas.deform_kernel import fused_deform_refinement


@pytest.fixture
def case(rng):
    b, c, h, w, dg = 2, 8, 8, 16, 8
    dils = (1, 2)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    offs = [jnp.asarray((rng.randn(b, h, w, dg * 18) * 2).astype(np.float32))
            for _ in dils]
    msks = [jnp.asarray(rng.rand(b, h, w, dg * 9).astype(np.float32))
            for _ in dils]
    wgts = jnp.asarray(rng.randn(2, 3, 3, c, c).astype(np.float32))
    bias = jnp.asarray(rng.randn(2, c).astype(np.float32))
    return x, offs, msks, wgts, bias, dils, dg


def test_pallas_matches_xla(case):
    x, offs, msks, wgts, bias, dils, dg = case
    ref = modulated_deform_conv_multi(x, offs, msks, wgts, bias, kernel=3,
                                      stride=1, padding_list=dils,
                                      dilation_list=dils, deformable_groups=dg)
    out = fused_deform_refinement(x, offs, msks, wgts, bias, kernel=3,
                                  padding_list=dils, dilation_list=dils,
                                  deformable_groups=dg, tile_p=32,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_group_padding(case):
    """dg=8 pads to 8 (no-op); check a non-multiple group count too."""
    rng = np.random.RandomState(1)
    b, c, h, w, dg = 1, 6, 8, 8, 6   # pads to 8
    dils = (1,)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    offs = [jnp.asarray(rng.randn(b, h, w, dg * 18).astype(np.float32))]
    msks = [jnp.asarray(rng.rand(b, h, w, dg * 9).astype(np.float32))]
    wgts = jnp.asarray(rng.randn(1, 3, 3, c, c).astype(np.float32))
    ref = modulated_deform_conv_multi(x, offs, msks, wgts, None, kernel=3,
                                      stride=1, padding_list=dils,
                                      dilation_list=dils, deformable_groups=dg)
    out = fused_deform_refinement(x, offs, msks, wgts, None, kernel=3,
                                  padding_list=dils, dilation_list=dils,
                                  deformable_groups=dg, tile_p=16,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_gradients_via_custom_vjp(case):
    x, offs, msks, wgts, bias, dils, dg = case

    def loss_pal(x, o0, o1, m0, m1, w):
        y = fused_deform_refinement(x, [o0, o1], [m0, m1], w, bias, kernel=3,
                                    padding_list=dils, dilation_list=dils,
                                    deformable_groups=dg, tile_p=32,
                                    interpret=True)
        return jnp.sum(y ** 2)

    def loss_xla(x, o0, o1, m0, m1, w):
        y = modulated_deform_conv_multi(x, [o0, o1], [m0, m1], w, bias,
                                        kernel=3, stride=1, padding_list=dils,
                                        dilation_list=dils,
                                        deformable_groups=dg)
        return jnp.sum(y ** 2)

    g_pal = jax.grad(loss_pal, argnums=(0, 5))(x, offs[0], offs[1], msks[0],
                                               msks[1], wgts)
    g_xla = jax.grad(loss_xla, argnums=(0, 5))(x, offs[0], offs[1], msks[0],
                                               msks[1], wgts)
    for a, b_ in zip(g_pal, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3,
                                   atol=1e-3)
