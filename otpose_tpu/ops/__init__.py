"""TPU-native op library.

Re-exports the deformable-op surface so reference users find the same
names the CUDA package exported (ref: thirdparty/deform_conv/__init__.py:
deform_conv, modulated_deform_conv, deform_roi_pooling).  The reference's
nn.Module wrappers (DeformConv, ModulatedDeformConv, *Pack) have no class
equivalent in this functional framework — the functions below plus an
explicit weight pytree are the idiomatic JAX surface; ``models/otpose.py``
shows the wiring.
"""

from otpose_tpu.ops.deform_conv import (  # noqa: F401
    deform_conv,
    identity_filler_weight,
    modulated_deform_conv,
    modulated_deform_conv_multi,
)
from otpose_tpu.ops.deform_pool import deform_psroi_pool  # noqa: F401

# reference functional name (thirdparty/deform_conv/functions/deform_pool.py)
deform_roi_pooling = deform_psroi_pool

__all__ = [
    "deform_conv",
    "modulated_deform_conv",
    "modulated_deform_conv_multi",
    "deform_roi_pooling",
    "deform_psroi_pool",
    "identity_filler_weight",
]
