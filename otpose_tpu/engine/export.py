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


@dataclasses.dataclass
class ExportBundle:
    """External-weights export: code-only StableHLO + the weight arrays.

    ``save_exported`` writes the blob plus a ``weights.npz`` sidecar.  The
    baked (default) mode returns plain ``bytes`` instead."""
    blob: bytes
    params: dict
    model_state: dict

    def __len__(self):
        return len(self.blob)


def export_eval(spec: OTPoseSpec, params, model_state, *, batch_size: int,
                compute_dtype=jnp.float32, flip: bool = False,
                decoded: bool = True, bf16_params: bool = False,
                platforms=_DEFAULT_PLATFORMS, bake_weights: bool = True):
    """Serialize the eval step to StableHLO bytes.

    The loaded artifact is called as ``(inputs (B, H, W, 15) f32,
    margin (B, 4) f32)`` and returns the decoded
    ``(coords (B, J, 2), maxvals (B, J, 1), raw_coords (B, J, 2))`` when
    ``decoded`` (the serving path), else the raw
    ``(heatmaps (B, Hh, Hw, J), teacher)``.

    ``platforms``: lowering targets baked into the artifact (default cpu +
    tpu) — without multi-platform lowering, jax.export pins the artifact to
    the exporting process's backend and a replica on any other backend
    refuses to load it.

    ``bake_weights``: True (default) folds the weights into the StableHLO
    module as constants — one fully self-contained file.  False exports the
    weights as ARGUMENTS and returns an :class:`ExportBundle`; the module
    stays a few MB of code that's shared across checkpoints, and compile
    services with request-size limits (this environment's tunnel rejects
    ~276 MB baked flagship modules with HTTP 413) stay usable.
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

    args = (jax.ShapeDtypeStruct((batch_size, h, w, 15), jnp.float32),
            jax.ShapeDtypeStruct((batch_size, 4), jnp.float32))

    def abstract(tree):
        return jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype), tree)

    # The artifact must be single-device portable: trace outside any
    # process-global mesh a CLI set earlier (a leaked context mesh bakes
    # multi-device shardings into the StableHLO and every replica whose
    # topology differs refuses to run it).
    with null_mesh_context():
        if bake_weights:
            def serve(inputs, margin):
                return step(params, model_state,
                            {"inputs": inputs, "margin": margin})

            exported = jax.export.export(jax.jit(serve),
                                         platforms=list(platforms))(*args)
            return exported.serialize()

        def serve_w(p, ms, inputs, margin):
            return step(p, ms, {"inputs": inputs, "margin": margin})

        exported = jax.export.export(jax.jit(serve_w),
                                     platforms=list(platforms))(
            abstract(params), abstract(model_state), *args)
    return ExportBundle(exported.serialize(), params, model_state)


_WEIGHTS_NAME = "otpose_weights.npz"


def _save_weights_npz(path: str, params: dict, model_state: dict):
    """Flat-dict weights -> npz.  npz round-trips bf16 as raw void bytes, so
    sub-f32 float dtypes are stored as uint16/uint8 views plus a dtype map
    (restored through ml_dtypes at load)."""
    import numpy as np

    arrays, dtypes = {}, {}
    for prefix, tree in (("params/", params), ("state/", model_state)):
        for k, v in tree.items():
            a = np.asarray(v)
            if a.dtype.kind not in "fiub":  # bf16 etc. report kind 'V'
                dtypes[prefix + k] = a.dtype.name
                a = a.view(np.uint16 if a.dtype.itemsize == 2 else np.uint8)
            arrays[prefix + k] = a
    np.savez(path, __dtypes__=json.dumps(dtypes), **arrays)


def _load_weights_npz(path: str):
    import ml_dtypes
    import numpy as np

    with np.load(path) as z:
        dtypes = json.loads(str(z["__dtypes__"]))
        params, model_state = {}, {}
        for k in z.files:
            if k == "__dtypes__":
                continue
            a = z[k]
            if k in dtypes:
                a = a.view(np.dtype(getattr(ml_dtypes, dtypes[k])))
            (params if k.startswith("params/") else model_state)[
                k.split("/", 1)[1]] = a
    return params, model_state


def save_exported(out_dir: str, blob, spec: OTPoseSpec, *,
                  batch_size: int, compute_dtype, flip: bool,
                  decoded: bool, platforms=_DEFAULT_PLATFORMS) -> str:
    """Write the artifact dir: the StableHLO blob + a json manifest (+ the
    ``weights.npz`` sidecar when ``blob`` is an external-weights
    :class:`ExportBundle`)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    external = isinstance(blob, ExportBundle)
    raw = blob.blob if external else blob
    with open(osp.join(out_dir, _BLOB_NAME), "wb") as f:
        f.write(raw)
    if external:
        _save_weights_npz(osp.join(out_dir, _WEIGHTS_NAME),
                          blob.params, blob.model_state)
    meta = {
        "batch_size": batch_size,
        "compute_dtype": jnp.dtype(compute_dtype).name,
        "flip": flip,
        "decoded": decoded,
        "weights": "external" if external else "baked",
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
    needed (the weights live inside the StableHLO module, or — external-
    weights artifacts — in the ``weights.npz`` sidecar, placed on device
    once here)."""
    with open(osp.join(artifact_dir, _BLOB_NAME), "rb") as f:
        exported = jax.export.deserialize(f.read())
    with open(osp.join(artifact_dir, _META_NAME)) as f:
        meta = json.load(f)
    fn = jax.jit(exported.call)
    if meta.get("weights") == "external":
        params, model_state = _load_weights_npz(
            osp.join(artifact_dir, _WEIGHTS_NAME))
        with null_mesh_context():
            params = jax.tree_util.tree_map(jnp.asarray, params)
            model_state = jax.tree_util.tree_map(jnp.asarray, model_state)
        inner = fn

        def fn(inputs, margin):  # noqa: F811 — weights closed over
            return inner(params, model_state, inputs, margin)
    return ExportedModel(meta=meta, _call=fn)
