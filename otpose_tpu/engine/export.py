"""AOT model export for serving (jax.export / StableHLO).

No reference counterpart: the reference serves by shipping model code +
a torch checkpoint (ref: utils/inference.py:84-110 documents the intended
single-clip API).  The TPU-native production path exports the jitted eval
computation — with the trained weights baked in as constants — to a
portable serialized StableHLO artifact:

- the artifact is self-contained: serving only needs jax (any backend),
  not otpose_tpu or the checkpoint;
- semantics are pinned at export time (no skew between training code and
  serving replicas);
- batch size / dtype / flip-averaging are fixed at export, so the serving
  binary compiles exactly one executable per artifact.

``export_eval`` produces the bytes; ``save_exported``/``load_exported``
handle the on-disk artifact; ``cli/export.py`` wires it to checkpoints.
"""

from __future__ import annotations

import dataclasses
import json
import os.path as osp

import jax
import jax.numpy as jnp

from otpose_tpu.engine.trainer import make_decoded_eval_step, make_eval_step
from otpose_tpu.models.otpose import OTPoseSpec, prepare_eval_params
from otpose_tpu.parallel.mesh import null_mesh_context

_META_NAME = "otpose_export.json"
_BLOB_NAME = "otpose_eval.stablehlo"


_DEFAULT_PLATFORMS = ("cpu", "tpu")


def export_eval(spec: OTPoseSpec, params, model_state, *, batch_size: int,
                compute_dtype=jnp.float32, flip: bool = False,
                decoded: bool = True, bf16_params: bool = False,
                platforms=_DEFAULT_PLATFORMS):
    """Serialize the eval step to StableHLO bytes with weights baked in.

    The exported callable takes ``(inputs (B, H, W, 15) f32,
    margin (B, 4) f32)`` and returns the decoded
    ``(coords (B, J, 2), maxvals (B, J, 1), raw_coords (B, J, 2))`` when
    ``decoded`` (the serving path), else the raw
    ``(heatmaps (B, Hh, Hw, J), teacher)``.

    ``platforms``: lowering targets baked into the artifact (default cpu +
    tpu) — without multi-platform lowering, jax.export pins the artifact to
    the exporting process's backend and a replica on any other backend
    refuses to load it.
    """
    if bf16_params:
        params = prepare_eval_params(params, param_dtype=jnp.bfloat16)
    if decoded:
        step = make_decoded_eval_step(spec, compute_dtype=compute_dtype,
                                      flip=flip, fused=False)
    else:
        step = make_eval_step(spec, compute_dtype=compute_dtype, fused=False)

    # HRNet stride is 4: the input image is 4x the heatmap/PE grid
    h, w = spec.pe_h * 4, spec.pe_w * 4

    def serve(inputs, margin):
        return step(params, model_state, {"inputs": inputs, "margin": margin})

    args = (jax.ShapeDtypeStruct((batch_size, h, w, 15), jnp.float32),
            jax.ShapeDtypeStruct((batch_size, 4), jnp.float32))
    # The artifact must be single-device portable: trace outside any
    # process-global mesh a CLI set earlier (a leaked context mesh bakes
    # multi-device shardings into the StableHLO and every replica whose
    # topology differs refuses to run it).
    with null_mesh_context():
        exported = jax.export.export(jax.jit(serve),
                                     platforms=list(platforms))(*args)
    return exported.serialize()


def save_exported(out_dir: str, blob: bytes, spec: OTPoseSpec, *,
                  batch_size: int, compute_dtype, flip: bool,
                  decoded: bool, platforms=_DEFAULT_PLATFORMS) -> str:
    """Write the artifact dir: the StableHLO blob + a json manifest."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    with open(osp.join(out_dir, _BLOB_NAME), "wb") as f:
        f.write(blob)
    meta = {
        "batch_size": batch_size,
        "compute_dtype": jnp.dtype(compute_dtype).name,
        "flip": flip,
        "decoded": decoded,
        "num_joints": spec.num_joints,
        "heatmap_size": [spec.pe_w, spec.pe_h],
        "image_size": [spec.pe_w * 4, spec.pe_h * 4],
        "jax_version": jax.__version__,
        "platforms": list(platforms),
    }
    with open(osp.join(out_dir, _META_NAME), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


@dataclasses.dataclass
class ExportedModel:
    """A loaded serving artifact: ``model(inputs, margin)``."""
    meta: dict
    _call: callable

    def __call__(self, inputs, margin):
        # serving can be embedded in a process that set a global mesh (e.g.
        # exporting + smoke-serving from one CLI run) — the artifact's
        # computation is single-device, so run it outside any context mesh
        with null_mesh_context():
            return self._call(inputs, margin)


def load_exported(artifact_dir: str) -> ExportedModel:
    """Load an artifact dir produced by ``save_exported``.  Only jax is
    needed (the weights live inside the StableHLO module)."""
    with open(osp.join(artifact_dir, _BLOB_NAME), "rb") as f:
        exported = jax.export.deserialize(f.read())
    with open(osp.join(artifact_dir, _META_NAME)) as f:
        meta = json.load(f)
    fn = jax.jit(exported.call)
    return ExportedModel(meta=meta, _call=fn)
