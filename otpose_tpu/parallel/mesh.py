"""Device mesh and sharding helpers.

Supersedes the reference's entire parallelism story (a single-process
``nn.DataParallel`` wrap, ref: train.py:78-79, eval.py:112-113) with SPMD
over a ``jax.sharding.Mesh``: the batch is sharded on the ``data`` axis,
parameters are replicated, and XLA emits the gradient all-reduce over ICI.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _mesh_context_vars():
    """The two thread-locals ``jax.sharding.set_mesh`` mutates (verified
    against this JAX version: set_mesh swaps abstract_mesh_context_manager
    and device_context and nothing else).  Single source of truth — the test
    suite's mesh-isolation fixtures import these helpers too, so a jax
    upgrade breaks exactly one site (loudly, via export tests)."""
    from jax._src import config as _jcfg

    return _jcfg.abstract_mesh_context_manager, _jcfg.device_context


def save_mesh_context():
    """Snapshot the thread-local mesh context (see restore_mesh_context)."""
    abs_var, dev_var = _mesh_context_vars()
    return abs_var.get_local(), dev_var.get_local()


def restore_mesh_context(saved) -> None:
    abs_var, dev_var = _mesh_context_vars()
    abs_var.set_local(saved[0])
    dev_var.set_local(saved[1])


def _unset_sentinel():
    """The sentinel jax's Config thread-locals hold when nothing was set.

    Primary source: the ``config_ext`` module jax._src.config itself imports
    (tracks jax's internals across jaxlib relayouts).  Fallback: read a fresh
    thread's view of the variable — a new thread has never had set_local
    called, so get_local() returns the sentinel without importing anything
    private beyond the Config objects we already hold.  If both fail, raise:
    silently keeping a leaked context mesh would bake N-device shardings
    into export artifacts that must stay single-device portable."""
    from jax._src import config as _jcfg

    unset = getattr(getattr(_jcfg, "config_ext", None), "unset", None)
    if unset is not None:
        return unset
    import threading

    out = {}

    def _read():
        out["v"] = _mesh_context_vars()[1].get_local()

    t = threading.Thread(target=_read)
    t.start()
    t.join()
    if "v" in out:
        return out["v"]
    raise RuntimeError(
        "cannot determine jax's unset-mesh sentinel (jax internals changed); "
        "refusing to trace with a possibly-leaked global mesh context")


@contextlib.contextmanager
def null_mesh_context():
    """Temporarily clear the process-global mesh set by jax.sharding.set_mesh.

    The CLI classes use ``set_mesh`` as a global setter (cli/train.py,
    cli/eval.py), so any tracing that happens later in the same process —
    most importantly ``engine.export.export_eval`` — would otherwise inherit
    that mesh as jit's context mesh and bake multi-device shardings into an
    artifact that must stay single-device portable.  This swaps both
    thread-locals to the library's own unset sentinel and puts the caller's
    values back on exit; if the sentinel cannot be determined it raises
    rather than silently exporting under the leaked mesh."""
    unset = _unset_sentinel()
    abs_var, dev_var = _mesh_context_vars()
    prev_abs = abs_var.swap_local(unset)
    prev_dev = dev_var.swap_local(unset)
    try:
        yield
    finally:
        abs_var.set_local(prev_abs)
        dev_var.set_local(prev_dev)


def make_mesh(cfg=None, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the mesh from cfg.TPU.MESH_AXES/MESH_SHAPE (-1 = all devices)."""
    devices = list(devices if devices is not None else jax.devices())
    axes = list(cfg.TPU.MESH_AXES) if cfg is not None else ["data"]
    shape = list(cfg.TPU.MESH_SHAPE) if cfg is not None else [-1]
    n = len(devices)
    fixed = int(np.prod([s for s in shape if s != -1])) or 1
    shape = [n // fixed if s == -1 else s for s in shape]
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch axis sharded on 'data'.

    Multi-process jobs (``jax.process_count() > 1``): each process passes its
    LOCAL row block (the loader's ``process_index/process_count`` sharding,
    ``parallel/distributed.py::local_row_block``) and the global array is
    assembled across hosts — the global batch is ``local * process_count``
    rows.  Single-process: a plain device_put."""
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
    count = jax.process_count()

    def put(x):
        x = np.asarray(x)
        gshape = (x.shape[0] * count,) + x.shape[1:]
        return jax.make_array_from_process_local_data(s, x, gshape)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate host arrays over every device of the (possibly multi-host)
    mesh.  Multihost callers must pass identical values on every process
    (same seed / same checkpoint — both already guaranteed by the CLIs)."""
    s = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(s, x, x.shape)

    return jax.tree_util.tree_map(put, tree)


def make_eval_shard_fn(mesh: Mesh):
    """Batch-sharding placement for eval loops.  The last eval batch may not
    divide the device count (eval loaders don't drop_last); such a batch is
    placed replicated instead — correctness is unaffected, only that one
    batch loses the parallelism.

    Multi-process jobs: the eval loop runs with FULL (global) host batches on
    every process — the host-side bookkeeping (meta accumulation, affine
    back-projection, poseval writing) needs every row — so this shard_fn
    slices out the local row block before assembling the global array."""
    # batches shard on the 'data' axis only, so divisibility is against that
    # axis size — not the total device count (they differ under a dp x sp
    # mesh, where e.g. (data=4, seq=2) must shard any batch divisible by 4)
    n = dict(zip(mesh.axis_names, mesh.devices.shape)).get("data",
                                                          mesh.devices.size)

    def shard_fn(batch):
        bs = next(iter(batch.values())).shape[0]
        if jax.process_count() == 1:
            if bs % n == 0:
                return shard_batch(mesh, batch)
            return replicate(mesh, batch)
        from otpose_tpu.parallel.distributed import local_row_block

        if bs % n == 0 and bs % jax.process_count() == 0:
            lo, hi = local_row_block(bs)
            return shard_batch(mesh, jax.tree_util.tree_map(
                lambda x: np.asarray(x)[lo:hi], batch))
        return replicate(mesh, jax.tree_util.tree_map(np.asarray, batch))

    return shard_fn
