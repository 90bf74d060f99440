"""Test config: force CPU with an 8-device virtual topology before jax loads,
so mesh/sharding tests run anywhere (the driver validates real-TPU paths
separately via __graft_entry__.py)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin ignores JAX_PLATFORMS; the config flag wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is jit-compile-dominated (a full run
# recompiles ~1h of XLA programs), and cached executables load in seconds.
# Keyed by program+topology+compile options, stored per-user outside the
# repo.  Opt out with OTPOSE_NO_JAX_CACHE=1 (e.g. when timing cold compiles).
# Note: XLA:CPU logs a noisy-but-benign "machine feature mismatch" line per
# cache hit (the +prefer-no-{scatter,gather} pseudo-features never appear in
# host feature detection); numerics are unaffected and every parity test
# would catch a corrupt executable.
if os.environ.get("OTPOSE_NO_JAX_CACHE") != "1":
    _cache_dir = os.path.join(
        os.path.expanduser("~"), ".cache", "otpose_tpu", "jax")
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


@pytest.fixture(autouse=True)
def _isolate_global_mesh():
    """The CLI classes intentionally set the process-global mesh
    (jax.sharding.set_mesh used as a global setter, cli/train.py) — restore
    the thread-local mesh context around every test so a CLI test cannot
    leak its mesh into later tests (a leaked 'data':8 mesh makes any test
    that enters a different mesh fail with ShardingTypeError: 'Mesh for all
    inputs should be equal').  The save/restore helpers live in
    otpose_tpu.parallel.mesh — one site to update when jax internals move."""
    from otpose_tpu.parallel.mesh import restore_mesh_context, save_mesh_context

    saved = save_mesh_context()
    yield
    restore_mesh_context(saved)


@pytest.fixture(autouse=True, scope="module")
def _isolate_global_mesh_per_module():
    """Module-scoped counterpart of _isolate_global_mesh.  Module-scoped
    fixtures that construct CLI objects (e.g. test_checkpoint_ingestion's
    Eval) run BEFORE the function-scoped fixture saves state, so their
    set_mesh leak poisons the per-test baseline and survives restoration for
    the rest of the session (round-3 full run: 3 cross-file failures —
    preempt resume, seq-parallel trainer, serve padding — all from a leaked
    'data':8 context mesh).  Saving at module setup (autouse fixtures order
    before requested ones within a scope, so this runs before any module
    fixture leaks) and restoring at module teardown keeps the leak visible
    to the module's own tests (their Eval/Train objects rely on it) while
    guaranteeing every module starts pristine."""
    from otpose_tpu.parallel.mesh import restore_mesh_context, save_mesh_context

    saved = save_mesh_context()
    yield
    restore_mesh_context(saved)
