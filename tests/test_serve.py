"""HTTP serving shim (tools/serve.py) over an exported artifact."""

import io
import json
import sys
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otpose_tpu.engine.export import export_eval, save_exported
from otpose_tpu.models.otpose import OTPoseSpec, init_otpose
from otpose_tpu.utils.testing import tiny_otpose_cfg


@pytest.fixture(scope="module", params=["baked", "external"])
def server(request, tmp_path_factory):
    cfg = tiny_otpose_cfg(image_size=32, heatmap_size=8)
    spec = OTPoseSpec.from_cfg(cfg)
    params, model_state = init_otpose(jax.random.PRNGKey(0), spec)
    blob = export_eval(spec, params, model_state, batch_size=2,
                       bake_weights=(request.param == "baked"))
    art = save_exported(str(tmp_path_factory.mktemp("srv") / "artifact"),
                        blob, spec, batch_size=2,
                        compute_dtype=jnp.float32, flip=False, decoded=True)

    sys.path.insert(0, "/root/repo")
    from tools.serve import make_server

    srv = make_server(art, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _post_npz(url, **arrays):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    req = urllib.request.Request(url + "/predict", data=buf.getvalue(),
                                 method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server):
    with urllib.request.urlopen(server + "/health") as r:
        meta = json.loads(r.read())
    assert meta["batch_size"] == 2
    assert meta["decoded"] is True


def test_predict_with_padding(server):
    rng = np.random.RandomState(0)
    # batch 1 < exported batch 2: exercises the zero-pad + slice-back path
    status, out = _post_npz(server,
                            inputs=rng.randn(1, 32, 32, 15).astype(np.float32),
                            margin=np.ones((1, 4), np.float32))
    assert status == 200
    assert np.asarray(out["coords"]).shape == (1, 17, 2)
    assert np.asarray(out["maxvals"]).shape == (1, 17, 1)
    assert np.isfinite(np.asarray(out["raw_coords"])).all()


def test_predict_oversized_batch_rejected(server):
    rng = np.random.RandomState(1)
    status, out = _post_npz(server,
                            inputs=rng.randn(3, 32, 32, 15).astype(np.float32),
                            margin=np.ones((3, 4), np.float32))
    assert status == 400
    assert "exported batch" in out["error"]
