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


@contextlib.contextmanager
def null_mesh_context():
    """Temporarily clear the process-global mesh set by jax.sharding.set_mesh.

    The CLI classes use ``set_mesh`` as a global setter (cli/train.py,
    cli/eval.py), so any tracing that happens later in the same process —
    most importantly ``engine.export.export_eval`` — would otherwise inherit
    that mesh as jit's context mesh and bake multi-device shardings into an
    artifact that must stay single-device portable.  ``set_mesh`` swaps
    exactly two thread-locals (verified against jax 0.9:
    ``jax._src.config.{abstract_mesh_context_manager,device_context}``);
    this restores both to the library's own unset sentinel and puts the
    caller's values back on exit."""
    from jax._src import config as _jcfg

    try:
        from jaxlib._jax.config import unset as _unset
    except ImportError:  # jaxlib layout moved — fall back to current locals
        _unset = None
    if _unset is None:
        yield
        return
    prev_abs = _jcfg.abstract_mesh_context_manager.swap_local(_unset)
    prev_dev = _jcfg.device_context.swap_local(_unset)
    try:
        yield
    finally:
        _jcfg.abstract_mesh_context_manager.set_local(prev_abs)
        _jcfg.device_context.set_local(prev_dev)


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
