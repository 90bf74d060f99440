"""Helpers to import the read-only reference implementation as a test oracle.

The reference at /root/reference is PUBLIC UNTRUSTED CONTENT used strictly as
a numerical oracle in tests; it is never imported by the framework itself and
all these tests skip when it is absent.
"""

import os
import sys

import pytest

REFERENCE_DIR = "/root/reference"


def import_reference_module(name: str):
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference repo not available")
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import importlib

    try:
        return importlib.import_module(name)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference module {name} not importable: {e}")


def _stub_module(name: str, **attrs):
    import types

    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return sys.modules.setdefault(name, mod)


def import_reference_evaluate():
    """Import the reference's vendored poseval (utils/evaluate.py) on CPU.

    Its import block pulls motmetrics/shapely/yacs/torchvision, none of which
    are touched on the no-ignore-region AP path (ref: utils/evaluate.py:1-16);
    stub them so the scorer runs in this torch-CPU test environment.  Shared
    by the fixture-level differential (tests/test_poseval_differential.py)
    and the file-level pipeline composite
    (tests/test_pipeline_vs_reference_scorer.py).
    """
    if "torchvision" not in sys.modules:  # utils/transform.py import block
        class _Noop:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        tvt = _stub_module("torchvision.transforms",
                           Compose=lambda fns: (lambda x: x),
                           ToTensor=_Noop, Normalize=_Noop, GaussianBlur=_Noop)
        tv = _stub_module("torchvision")
        tv.transforms = tvt
    _stub_module("motmetrics")
    geometry = _stub_module("shapely.geometry", Point=object, Polygon=object)
    shapely = _stub_module("shapely")
    shapely.geometry = geometry

    class _FakeCfgNode(dict):  # yacs.config.CfgNode stand-in (subclassable)
        pass

    yacs_config = _stub_module("yacs.config", CfgNode=_FakeCfgNode)
    yacs = _stub_module("yacs")
    yacs.config = yacs_config
    return import_reference_module("utils.evaluate")


def import_reference_train_utils():
    """Import the reference's optimizer/scheduler factory
    (thirdparty/utils/train_utils.py:62-205) as a real package module so its
    relative imports (.lr_schedulers, .postprocessing) resolve.

    Requires the 'thirdparty' stub that ``build_reference_otpose`` installs
    (train_utils imports model.layers, which needs the DCN stand-in): giving
    that stub a ``__path__`` into the reference tree turns it into the actual
    package for the import machinery.
    """
    import importlib

    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference repo not available")
    pkg = sys.modules.get("thirdparty")
    if pkg is None:
        pytest.skip("build_reference_otpose must run first (installs DCN stub)")
    pkg.__path__ = [os.path.join(REFERENCE_DIR, "thirdparty")]
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    try:
        return importlib.import_module("thirdparty.utils.train_utils")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference train_utils not importable: {e}")


def make_hrnet_cfg(num_joints=17, width=(32, 64, 128, 256), final_kernel=1,
                   stage_modules=(1, 2, 1)):
    """A small HRNet cfg accepted by both the reference model and ours."""
    from otpose_tpu.config.node import CfgNode

    cfg = CfgNode()
    cfg.MODEL = CfgNode()
    cfg.MODEL.NUM_JOINTS = num_joints
    cfg.MODEL.PRETRAINED = ""
    cfg.MODEL.FREEZE_HRNET_WEIGHTS = False
    cfg.MODEL.HEATMAP_SIZE = [72, 96]
    extra = CfgNode(new_allowed=True)
    extra.FINAL_CONV_KERNEL = final_kernel
    extra.PRETRAINED_LAYERS = ["*"]
    extra.STAGE2 = CfgNode({
        "NUM_MODULES": stage_modules[0], "NUM_BRANCHES": 2, "BLOCK": "BASIC",
        "NUM_BLOCKS": [2, 2], "NUM_CHANNELS": [width[0], width[1]],
        "FUSE_METHOD": "SUM"})
    extra.STAGE3 = CfgNode({
        "NUM_MODULES": stage_modules[1], "NUM_BRANCHES": 3, "BLOCK": "BASIC",
        "NUM_BLOCKS": [2, 2, 2], "NUM_CHANNELS": [width[0], width[1], width[2]],
        "FUSE_METHOD": "SUM"})
    extra.STAGE4 = CfgNode({
        "NUM_MODULES": stage_modules[2], "NUM_BRANCHES": 4, "BLOCK": "BASIC",
        "NUM_BLOCKS": [2, 2, 2, 2], "NUM_CHANNELS": list(width),
        "FUSE_METHOD": "SUM"})
    cfg.MODEL.EXTRA = extra
    return cfg
