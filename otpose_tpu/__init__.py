"""otpose_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
KyungMinJin/OTPose (occlusion-aware transformer pose estimation on sparsely-labeled video).

Layering (see SURVEY.md for the reference layer map this corresponds to):

- ``otpose_tpu.config``   — YAML config system with ``_BASE_`` inheritance (ref: utils/setup.py:54-118).
- ``otpose_tpu.ops``      — pure-JAX + Pallas compute ops (affine warp, heatmaps, deformable conv,
                            channel attention) replacing the reference CUDA ops (ref: thirdparty/).
- ``otpose_tpu.models``   — functional model definitions (HRNet-W48, ConvTransformer, RSB, OTPose)
                            with parameter pytrees keyed like the reference state_dicts for direct
                            torch checkpoint conversion (ref: model/).
- ``otpose_tpu.data``     — PoseTrack video dataset + host pipeline (ref: dataset/).
- ``otpose_tpu.engine``   — pjit train/eval engines, optimizer groups, checkpoints (ref: script/, train.py).
- ``otpose_tpu.parallel`` — mesh/sharding helpers (supersedes the reference's nn.DataParallel).
- ``otpose_tpu.evaluate`` — poseval-compatible AP evaluation + format converters (ref: utils/evaluate.py).
"""

__version__ = "0.1.0"
