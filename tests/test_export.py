"""AOT serving export (engine/export.py): serialize -> reload -> exact parity.

The artifact bakes the weights into the StableHLO module, so the loaded
callable must reproduce the live eval step bit-for-bit on the same backend,
with no otpose_tpu state passed at call time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otpose_tpu.engine.export import export_eval, load_exported, save_exported
from otpose_tpu.engine.trainer import make_decoded_eval_step
from otpose_tpu.models.otpose import OTPoseSpec, init_otpose
from otpose_tpu.utils.testing import tiny_otpose_cfg


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_otpose_cfg(image_size=32, heatmap_size=8)
    spec = OTPoseSpec.from_cfg(cfg)
    params, model_state = init_otpose(jax.random.PRNGKey(0), spec)
    return spec, params, model_state


def test_export_roundtrip_matches_live_step(tiny_model, tmp_path):
    spec, params, model_state = tiny_model
    b = 2
    # heatmap-level artifact for numerical parity (export/reimport compiles
    # a separate executable, so bit-exactness is not guaranteed; a random-
    # init model's near-zero heatmaps make argmax coords tie-unstable)
    blob = export_eval(spec, params, model_state, batch_size=b,
                       decoded=False)
    out_dir = save_exported(str(tmp_path / "artifact"), blob, spec,
                            batch_size=b, compute_dtype=jnp.float32,
                            flip=False, decoded=False)

    model = load_exported(out_dir)
    assert model.meta["batch_size"] == b
    assert model.meta["image_size"] == [32, 32]

    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(b, 32, 32, 15), jnp.float32)
    margin = jnp.ones((b, 4), jnp.float32)

    heat, teacher = model(inputs, margin)
    from otpose_tpu.engine.trainer import make_eval_step

    want_heat, want_teacher = make_eval_step(spec, fused=False)(
        params, model_state, {"inputs": inputs, "margin": margin})
    np.testing.assert_allclose(np.asarray(heat), np.asarray(want_heat),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(teacher), np.asarray(want_teacher),
                               rtol=1e-5, atol=1e-7)

    # decoded (serving) artifact: shapes/dtypes of the keypoint outputs
    blob_d = export_eval(spec, params, model_state, batch_size=b)
    model_d = load_exported(save_exported(
        str(tmp_path / "artifact_decoded"), blob_d, spec, batch_size=b,
        compute_dtype=jnp.float32, flip=False, decoded=True))
    coords, maxvals, raw = model_d(inputs, margin)
    j = spec.num_joints
    assert coords.shape == (b, j, 2)
    assert maxvals.shape == (b, j, 1)
    assert raw.shape == (b, j, 2)


def test_export_external_weights_roundtrip(tiny_model, tmp_path):
    """weights='external': code-only StableHLO + weights.npz sidecar must
    reproduce the baked artifact exactly (incl. bf16 sidecar dtypes, which
    npz cannot store natively).  Motivation: the baked flagship module is
    ~276 MB of constants — past compile-service request limits (the on-chip
    smoke's serve step died with HTTP 413 on it)."""
    import os

    spec, params, model_state = tiny_model
    b = 2
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(b, 32, 32, 15), jnp.float32)
    margin = jnp.ones((b, 4), jnp.float32)

    baked = load_exported(save_exported(
        str(tmp_path / "baked"),
        export_eval(spec, params, model_state, batch_size=b, decoded=False),
        spec, batch_size=b, compute_dtype=jnp.float32, flip=False,
        decoded=False))

    bundle = export_eval(spec, params, model_state, batch_size=b,
                         decoded=False, bake_weights=False, bf16_params=True)
    out = save_exported(str(tmp_path / "ext"), bundle, spec, batch_size=b,
                        compute_dtype=jnp.float32, flip=False, decoded=False)
    assert os.path.exists(os.path.join(out, "otpose_weights.npz"))
    # the code-only module must be much smaller than the baked one
    baked_sz = os.path.getsize(str(tmp_path / "baked" / "otpose_eval.stablehlo"))
    ext_sz = os.path.getsize(os.path.join(out, "otpose_eval.stablehlo"))
    assert ext_sz < baked_sz / 2, (ext_sz, baked_sz)
    ext = load_exported(out)
    assert ext.meta["weights"] == "external"

    want = baked(inputs, margin)
    got = ext(inputs, margin)
    for g, w in zip(got, want):
        # bf16 conv/dense weights in the sidecar: parity to bf16 tolerance
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32),
                                   rtol=2e-2, atol=2e-2)

    # exact parity when the sidecar stays f32
    ext_f32 = load_exported(save_exported(
        str(tmp_path / "ext32"),
        export_eval(spec, params, model_state, batch_size=b, decoded=False,
                    bake_weights=False),
        spec, batch_size=b, compute_dtype=jnp.float32, flip=False,
        decoded=False))
    got32 = ext_f32(inputs, margin)
    for g, w in zip(got32, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-7)


def test_export_and_serve_under_global_mesh(tiny_model, tmp_path):
    """Regression (round-3 full suite): a CLI process uses
    jax.sharding.set_mesh as a global setter (cli/train.py), so export and
    in-process serving can run under a leaked multi-device context mesh.
    export_eval/ExportedModel must neutralize it (null_mesh_context) — the
    artifact is single-device portable, and under the leaked mesh the call
    used to fail with incompatible-devices errors."""
    spec, params, model_state = tiny_model
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from otpose_tpu.parallel.mesh import make_mesh

    b = 2
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(b, 32, 32, 15), jnp.float32)
    margin = jnp.ones((b, 4), jnp.float32)

    clean_blob = export_eval(spec, params, model_state, batch_size=b,
                             decoded=False)
    want = load_exported(save_exported(
        str(tmp_path / "clean"), clean_blob, spec, batch_size=b,
        compute_dtype=jnp.float32, flip=False, decoded=False))(inputs, margin)

    ctx = jax.sharding.set_mesh(make_mesh())  # 'data': 8 global mesh
    ctx.__enter__()
    try:
        blob = export_eval(spec, params, model_state, batch_size=b,
                           decoded=False)
        # the actual failure mode: the artifact used to be exported FOR the
        # leaked mesh's 8 devices, so any 1-device caller (a serving thread
        # has no thread-local mesh) was rejected with "exported for 8
        # devices ... called in a context with 1 devices"
        assert jax.export.deserialize(blob).nr_devices == 1
        model = load_exported(save_exported(
            str(tmp_path / "meshed"), blob, spec, batch_size=b,
            compute_dtype=jnp.float32, flip=False, decoded=False))
        got = model(inputs, margin)
    finally:
        ctx.__exit__(None, None, None)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-7)


def test_export_wrong_batch_rejected(tiny_model):
    spec, params, model_state = tiny_model
    blob = export_eval(spec, params, model_state, batch_size=2)
    exported = jax.export.deserialize(blob)
    rng = np.random.RandomState(1)
    bad = jnp.asarray(rng.randn(3, 32, 32, 15), jnp.float32)
    with pytest.raises(ValueError, match="(?i)shape|rank|dim"):
        exported.call(bad, jnp.ones((3, 4), jnp.float32))
