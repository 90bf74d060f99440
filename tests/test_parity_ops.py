import numpy as np
import pytest

from otpose_tpu.ops.nms import nms_1d, nms_1d_device, softnms_1d
from otpose_tpu.utils.io import Registry, read_json_from_file, write_json_to_file


def test_nms_1d_basic():
    segs = np.array([[0, 10], [1, 11], [20, 30], [21, 29]], dtype=np.float32)
    scores = np.array([0.9, 0.8, 0.7, 0.95], dtype=np.float32)
    keep = nms_1d(segs, scores, 0.5)
    # order by score: 3, 0, 1, 2; 1 overlaps 0, 2 overlaps 3
    assert list(keep) == [3, 0]


def test_nms_1d_device_matches_host():
    rng = np.random.RandomState(0)
    starts = rng.uniform(0, 100, 32).astype(np.float32)
    segs = np.stack([starts, starts + rng.uniform(1, 20, 32).astype(np.float32)], 1)
    scores = rng.rand(32).astype(np.float32)
    keep_host = set(nms_1d(segs, scores, 0.3).tolist())
    mask = np.asarray(nms_1d_device(segs, scores, 0.3))
    assert set(np.flatnonzero(mask).tolist()) == keep_host


def test_softnms_gaussian_decays_overlaps():
    segs = np.array([[0, 10], [0, 10], [50, 60]], dtype=np.float32)
    scores = np.array([0.9, 0.85, 0.5], dtype=np.float32)
    out_segs, out_scores, inds = softnms_1d(segs, scores, sigma=0.5,
                                            min_score=0.001, method=2)
    assert inds[0] == 0
    # the duplicate seg keeps a decayed score
    dup_pos = list(inds).index(1)
    assert out_scores[dup_pos] < 0.85 * 0.5


def test_deform_psroi_pool_uniform_input():
    import jax.numpy as jnp

    from otpose_tpu.ops.deform_pool import deform_psroi_pool

    # constant feature map -> every pooled bin equals the constant
    x = jnp.full((1, 16, 16, 4), 3.0)
    rois = jnp.asarray([[0, 2, 2, 13, 13]], jnp.float32)
    out, count = deform_psroi_pool(x, rois, None, spatial_scale=1.0, out_size=2,
                                   output_dim=4, group_size=1, sample_per_part=2,
                                   no_trans=True)
    assert out.shape == (1, 2, 2, 4)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-6)
    assert np.asarray(count).min() > 0


def test_deform_psroi_pool_position_sensitive():
    import jax.numpy as jnp

    from otpose_tpu.ops.deform_pool import deform_psroi_pool

    # C = output_dim * group_size^2 = 1 * 4; each PS channel holds its index
    x = np.zeros((1, 8, 8, 4), np.float32)
    for c in range(4):
        x[..., c] = c
    rois = jnp.asarray([[0, 0, 0, 7, 7]], jnp.float32)
    out, _ = deform_psroi_pool(jnp.asarray(x), rois, None, spatial_scale=1.0,
                               out_size=2, output_dim=1, group_size=2,
                               sample_per_part=2, no_trans=True)
    # bin (ph, pw) reads channel gh*2+gw
    np.testing.assert_allclose(np.asarray(out)[0, :, :, 0],
                               [[0, 1], [2, 3]], atol=1e-6)


def test_registry():
    r = Registry("test")

    @r.register
    def foo():
        return 42

    assert r.get("foo")() == 42
    assert "foo" in r
    with pytest.raises(KeyError):
        r.get("bar")


def test_json_roundtrip(tmp_path):
    p = str(tmp_path / "x.json")
    write_json_to_file({"a": [1, 2]}, p)
    assert read_json_from_file(p) == {"a": [1, 2]}


def test_nms_1d_device_max_keep_caps_survivors():
    """max_keep must bound the keep mask to the top-scoring survivors (it
    used to be accepted and silently ignored)."""
    rng = np.random.RandomState(0)
    starts = rng.uniform(0, 100, 40).astype(np.float32)
    segs = np.stack([starts, starts + rng.uniform(1, 5, 40).astype(np.float32)],
                    axis=1)
    scores = rng.rand(40).astype(np.float32)
    full = np.asarray(nms_1d_device(segs, scores, 0.3))
    capped = np.asarray(nms_1d_device(segs, scores, 0.3, max_keep=3))
    assert full.sum() > 3 >= capped.sum() == 3
    # the capped set is the top-3 SCORING survivors of the uncapped set
    kept_scores = sorted(scores[full], reverse=True)[:3]
    assert sorted(scores[capped], reverse=True) == kept_scores
    assert not np.any(capped & ~full)
