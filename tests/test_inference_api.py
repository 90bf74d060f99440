import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otpose_tpu.cli.inference import PoseEstimator, inference_PE
from otpose_tpu.models.otpose import OTPoseSpec, init_otpose
from otpose_tpu.utils.testing import tiny_otpose_cfg

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def estimator():
    cfg = tiny_otpose_cfg(image_size=32, heatmap_size=8)
    spec = OTPoseSpec.from_cfg(cfg)
    params, state = init_otpose(jax.random.PRNGKey(0), spec)
    return PoseEstimator(cfg, params, state, compute_dtype=jnp.float32)


def test_infer_images(estimator):
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (60, 80, 3), dtype=np.uint8) for _ in range(5)]
    out = estimator.infer_images(imgs, bbox=[10, 10, 40, 40])
    assert out.shape == (17, 3)
    assert np.isfinite(out).all()


def test_inference_pe_from_paths(estimator, tmp_path):
    rng = np.random.RandomState(1)
    paths = []
    for i in range(5):
        img = rng.randint(0, 255, (60, 80, 3), dtype=np.uint8)
        p = str(tmp_path / f"{i}.jpg")
        cv2.imwrite(p, img)
        paths.append(p)
    out = inference_PE(estimator, *paths, bbox=[5, 5, 50, 50])
    assert out.shape == (17, 3)


def test_unreadable_path_raises(estimator, tmp_path):
    with pytest.raises(ValueError, match="Fail to read"):
        estimator([str(tmp_path / "missing.jpg")] * 5, bbox=[0, 0, 10, 10])
