import numpy as np
import pytest

from otpose_tpu.data.device_loader import DeviceLoader
from otpose_tpu.data.loader import Loader
from otpose_tpu.data.posetrack import PoseTrackDataset

from tests.helpers.synthetic_data import make_synthetic_posetrack
from tests.test_data_eval import _cfg_for

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("dl")
    json_dir, img_dir, annot_dir = make_synthetic_posetrack(str(root))
    cfg = _cfg_for(json_dir, img_dir, annot_dir)
    return PoseTrackDataset(cfg, "validate")


@pytest.mark.parametrize("mode", ["crops", "full"])
def test_device_loader_matches_host_loader(ds, mode):
    """Device-preprocessed batches must match the host (cv2) path within
    bilinear fixed-point tolerance (crops mode: pixels bit-identical)."""
    host = Loader(ds, 4, shuffle=False, num_workers=2)
    dev = DeviceLoader(ds, 4, shuffle=False, num_workers=2,
                       max_frame_hw=(128, 160), mode=mode)
    (hb, hm), (db, dm) = next(iter(host)), next(iter(dev))

    assert hb["inputs"].shape == db["inputs"].shape
    # pixel path: cv2 fixed-point vs device float bilinear
    diff = np.abs(np.asarray(db["inputs"]) - hb["inputs"])
    assert diff.max() < 0.15, diff.max()  # normalized units (~3/255 raw)
    # targets identical semantics
    np.testing.assert_allclose(np.asarray(db["target"]), hb["target"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(db["target_weight"]),
                               hb["target_weight"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(db["margin"]), hb["margin"])
    assert [m["image"] for m in dm] == [m["image"] for m in hm]


@pytest.mark.parametrize("mode", ["crops", "full"])
def test_device_loader_matches_host_at_flagship_geometry(tmp_path, mode):
    """Host/device equivalence at the shipped shape: 288x384 crop, 72x96
    heatmaps, sigma 3 (VERDICT r1 task 1a)."""
    json_dir, img_dir, annot_dir = make_synthetic_posetrack(
        str(tmp_path), num_videos=1, frames_per_video=3, people_per_frame=2,
        img_w=640, img_h=480)
    cfg = _cfg_for(json_dir, img_dir, annot_dir)
    cfg.MODEL.IMAGE_SIZE = [288, 384]
    cfg.MODEL.HEATMAP_SIZE = [72, 96]
    cfg.MODEL.SIGMA = 3
    ds = PoseTrackDataset(cfg, "validate")
    host = Loader(ds, 4, shuffle=False, num_workers=2)
    dev = DeviceLoader(ds, 4, shuffle=False, num_workers=2,
                       max_frame_hw=(512, 768), mode=mode)
    (hb, hm), (db, dm) = next(iter(host)), next(iter(dev))
    assert db["inputs"].shape == hb["inputs"].shape == (4, 384, 288, 15)
    assert db["target"].shape == hb["target"].shape == (4, 96, 72, 17)
    diff = np.abs(np.asarray(db["inputs"]) - hb["inputs"])
    assert diff.max() < 0.15, diff.max()  # cv2 fixed-point vs float bilinear
    np.testing.assert_allclose(np.asarray(db["target"]), hb["target"],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(db["target_weight"]),
                               hb["target_weight"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(db["margin"]), hb["margin"])
    assert [m["image"] for m in dm] == [m["image"] for m in hm]


@pytest.mark.parametrize("mode", ["crops", "full"])
def test_device_loader_matches_host_train_with_rotation(tmp_path, mode):
    """Train-phase parity incl. the rotated-sample host-prewarp path: with
    augmentation active (flip/rot/blur/scale), device batches must match the
    host path bit-for-bit on rotated samples (same cv2 warp) and within
    bilinear tolerance elsewhere."""
    json_dir, img_dir, annot_dir = make_synthetic_posetrack(
        str(tmp_path), num_videos=1, frames_per_video=4, people_per_frame=2)
    cfg = _cfg_for(json_dir, img_dir, annot_dir)
    cfg.TRAIN.FLIP = True
    cfg.TRAIN.ROT_FACTOR = 30
    cfg.TRAIN.SCALE_FACTOR = [0.25, 0.25]
    ds_t = PoseTrackDataset(cfg, "train")

    host = Loader(ds_t, 8, shuffle=False, num_workers=2, seed=7)
    dev = DeviceLoader(ds_t, 8, shuffle=False, num_workers=2, seed=7,
                       max_frame_hw=(128, 160), mode=mode)
    host.set_epoch(1)
    dev.set_epoch(1)
    (hb, hm), (db, dm) = next(iter(host)), next(iter(dev))
    # same augmentation draws (same per-sample rng streams) -> same rotations
    rots = [m["rotation"] for m in dm]
    assert rots == [m["rotation"] for m in hm]
    assert any(r != 0 for r in rots), "rng draw produced no rotated sample"
    diff = np.abs(np.asarray(db["inputs"]) - hb["inputs"])
    assert diff.max() < 0.15, diff.max()
    np.testing.assert_allclose(np.asarray(db["target"]), hb["target"],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(db["target_weight"]),
                               hb["target_weight"], atol=1e-5)


def test_loader_propagates_producer_errors(ds):
    """A failing sample load must raise in the consumer, not hang the
    out_q.get() forever (round-1 advisor finding)."""

    class Broken:
        def __init__(self, inner):
            self._inner = inner

        def __len__(self):
            return len(self._inner)

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def get_sample_host(self, idx, rng=None, **kwargs):
            raise ValueError("corrupt jpeg (synthetic)")

    loader = Loader(Broken(ds), 2, shuffle=False, num_workers=2)
    with pytest.raises(ValueError, match="corrupt jpeg"):
        for _ in loader:
            pass


def test_device_loader_propagates_producer_errors(ds):
    class BrokenData:
        def __getitem__(self, idx):
            raise OSError("disk gone (synthetic)")

    class BrokenDs:
        def __init__(self, inner):
            self._inner = inner
            self.data = BrokenData()

        def __len__(self):
            return len(self._inner)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    dev = DeviceLoader(BrokenDs(ds), 2, shuffle=False, num_workers=2,
                       max_frame_hw=(128, 160))
    with pytest.raises(OSError, match="disk gone"):
        for _ in dev:
            pass


def test_device_loader_bgr_when_color_rgb_false(ds):
    """DeviceLoader honors DATASET.COLOR_RGB like the host path
    (round-1 advisor finding)."""
    import copy as _copy

    ds_bgr = _copy.copy(ds)
    ds_bgr.color_rgb = False
    host = Loader(ds_bgr, 2, shuffle=False, num_workers=2)
    dev = DeviceLoader(ds_bgr, 2, shuffle=False, num_workers=2,
                       max_frame_hw=(128, 160))
    (hb, _), (db, _) = next(iter(host)), next(iter(dev))
    diff = np.abs(np.asarray(db["inputs"]) - hb["inputs"])
    assert diff.max() < 0.15, diff.max()


def test_device_loader_deterministic(ds):
    dev = DeviceLoader(ds, 4, shuffle=True, num_workers=2,
                       max_frame_hw=(128, 160))
    dev.set_epoch(3)
    b1, _ = next(iter(dev))
    b2, _ = next(iter(dev))
    np.testing.assert_array_equal(np.asarray(b1["inputs"]),
                                  np.asarray(b2["inputs"]))


def test_device_prefetch_pipeline_matches_synchronous(ds):
    """device_prefetch > 0 moves _to_device into a mover thread; every batch
    and meta must be identical to the synchronous (device_prefetch=0) path,
    in order, across a full epoch."""
    sync = DeviceLoader(ds, 2, shuffle=False, num_workers=2,
                        max_frame_hw=(128, 160), device_prefetch=0)
    pipe = DeviceLoader(ds, 2, shuffle=False, num_workers=2,
                        max_frame_hw=(128, 160), device_prefetch=2)
    got_s, got_p = list(sync), list(pipe)
    assert len(got_s) == len(got_p) > 0
    for (sb, sm), (pb, pm) in zip(got_s, got_p):
        assert sb.keys() == pb.keys()
        for k in sb:
            np.testing.assert_array_equal(np.asarray(sb[k]),
                                          np.asarray(pb[k]), err_msg=k)
        assert [m["image"] for m in sm] == [m["image"] for m in pm]


def test_device_prefetch_early_break_then_reiterate(ds):
    """Breaking mid-epoch (preemption, eval early-exit) must shut both
    pipeline threads down without hanging, and a fresh iteration must
    reproduce the full epoch."""
    dev = DeviceLoader(ds, 2, shuffle=False, num_workers=2,
                       max_frame_hw=(128, 160), device_prefetch=2)
    it = iter(dev)
    first, _ = next(it)
    del it  # triggers the generator's finally -> thread shutdown

    full = list(dev)
    assert len(full) == len(dev)
    np.testing.assert_array_equal(np.asarray(first["inputs"]),
                                  np.asarray(full[0][0]["inputs"]))


def test_device_prefetch_propagates_mover_errors(ds):
    """An exception inside _to_device (the mover thread) must raise in the
    consumer, not hang."""
    dev = DeviceLoader(ds, 2, shuffle=False, num_workers=2,
                       max_frame_hw=(128, 160), device_prefetch=2)
    dev._to_device = lambda samples: (_ for _ in ()).throw(
        RuntimeError("device OOM (synthetic)"))
    with pytest.raises(RuntimeError, match="device OOM"):
        for _ in dev:
            pass


def test_device_prefetch_abandoned_iterator_shuts_down(ds):
    """Regression: closing a pipelined iterator mid-epoch used to deadlock —
    the consumer's shutdown drain stole the producer's None sentinel from
    out_q, stranding the mover on out_q.get() forever (found by the
    flagship-geometry test hanging).  The close must finish promptly even
    when the pipeline has settled (producer done, sentinel enqueued, mover
    parked)."""
    import threading
    import time

    dev = DeviceLoader(ds, 2, shuffle=False, num_workers=2,
                       max_frame_hw=(128, 160), device_prefetch=2)

    def run():
        it = iter(dev)
        next(it)
        time.sleep(1.0)  # let the pipeline settle into the deadlock shape
        it.close()       # runs the generator's finally (thread shutdown)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=60)
    assert not t.is_alive(), "pipelined loader shutdown deadlocked"
