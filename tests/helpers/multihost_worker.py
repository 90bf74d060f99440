"""Subprocess body for the multi-host (multi-process) integration test.

Run with OTPOSE_COORDINATOR/OTPOSE_NUM_PROCESSES/OTPOSE_PROCESS_ID set for
the 2-process Gloo run, or with none of them for the single-process
reference.  Both runs see the same number of GLOBAL devices
(OTPOSE_LOCAL_DEVICES x processes), build the same tiny OTPose train state,
consume the same global batches, and dump the final parameters — the test
then asserts the multi-process run reproduces the single-process numerics.

Usage: python multihost_worker.py <out.npz>
"""

import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", int(os.environ["OTPOSE_LOCAL_DEVICES"]))
# same persistent compile cache the test suite uses (tests/conftest.py) —
# jax.config does not cross the process boundary
if os.environ.get("OTPOSE_NO_JAX_CACHE") != "1":
    _cache = os.path.join(os.path.expanduser("~"), ".cache", "otpose_tpu", "jax")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)

sys.path.insert(0, os.environ["OTPOSE_REPO"])

from otpose_tpu.parallel import distributed


def make_batch(seed, b, img=32, hm=8, j=17):
    rng = np.random.RandomState(seed)
    return {
        "inputs": rng.randn(b, img, img, 15).astype(np.float32),
        "margin": np.ones((b, 4), np.float32),
        "target": rng.rand(b, hm, hm, j).astype(np.float32),
        "target_weight": np.ones((b, j, 1), np.float32),
    }


def flagship_compile(pid, count):
    """Compile-only gate: the FLAGSHIP-spec train step lowered + compiled
    for the 2-process (4-global-device) mesh.  Execution at this scale is
    impossible on CPU (XLA's hardcoded collective-rendezvous watchdog, see
    __graft_entry__.dryrun_multichip) — the multi-host gate hardware permits
    is that the sharded program BUILDS for a multi-process device
    assignment (VERDICT r2 task 4)."""
    from otpose_tpu.engine.optim import make_optimizer, make_schedule
    from otpose_tpu.engine.trainer import init_train_state, make_train_step
    from otpose_tpu.models.otpose import OTPoseSpec, init_otpose
    from otpose_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from otpose_tpu.utils.testing import flagship_otpose_cfg

    cfg = flagship_otpose_cfg()
    cfg.TPU.REMAT = True
    spec = OTPoseSpec.from_cfg(cfg)
    params, model_state = init_otpose(jax.random.PRNGKey(0), spec)
    optimizer = make_optimizer(params, cfg, make_schedule(cfg, 4))
    step_fn = make_train_step(spec, optimizer, donate=False, remat=True)
    mesh = make_mesh(cfg)
    with jax.sharding.set_mesh(mesh):
        ts = init_train_state(replicate(mesh, params),
                              replicate(mesh, model_state), optimizer)
        b = jax.device_count()  # one clip per global device
        lo, hi = distributed.local_row_block(b)
        host = make_batch(7, b, img=384, hm=96)
        # the flagship batch dims are (B, 384, 288, 15)/(B, 96, 72, 17):
        host["inputs"] = host["inputs"][..., :288, :]
        host["target"] = host["target"][..., :72, :]
        local = {k: v[lo:hi] for k, v in host.items()}
        batch = shard_batch(mesh, local)
        compiled = step_fn.lower(ts, batch, jax.random.PRNGKey(1)).compile()
        cost = compiled.cost_analysis() or {}
        # generous skew allowance: one process may hit the compile cache the
        # other is still writing (concurrent ~10-min XLA CPU compiles)
        distributed.barrier("flagship-compiled", timeout_s=2400)
    print(f"FLAGSHIP_COMPILE_OK pid={pid}/{count} "
          f"flops={cost.get('flops', float('nan')):.3e}", flush=True)


def main(out_path):
    pid, count = distributed.maybe_initialize()
    assert jax.device_count() == 4, jax.devices()

    if os.environ.get("OTPOSE_FLAGSHIP_COMPILE") == "1":
        flagship_compile(pid, count)
        return

    from otpose_tpu.engine.optim import make_optimizer, make_schedule
    from otpose_tpu.engine.trainer import init_train_state, make_train_step
    from otpose_tpu.models.otpose import OTPoseSpec, init_otpose
    from otpose_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from otpose_tpu.utils.testing import tiny_otpose_cfg

    cfg = tiny_otpose_cfg(image_size=32, heatmap_size=8)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    spec = OTPoseSpec.from_cfg(cfg)
    params, model_state = init_otpose(jax.random.PRNGKey(0), spec)
    optimizer = make_optimizer(params, cfg, make_schedule(cfg, 4))
    step_fn = make_train_step(spec, optimizer, donate=False)

    mesh = make_mesh(cfg)
    with jax.sharding.set_mesh(mesh):
        ts = init_train_state(replicate(mesh, params),
                              replicate(mesh, model_state), optimizer)
        global_b = 8

        def local(batch):
            if count == 1:
                return batch
            lo, hi = distributed.local_row_block(global_b)
            return {k: v[lo:hi] for k, v in batch.items()}

        # AOT-compile, THEN rendezvous, THEN dispatch: Gloo's ~30s context
        # init deadline cannot absorb a compile-cache skew between processes
        # (parallel/distributed.py::barrier)
        batch0 = shard_batch(mesh, local(make_batch(100, global_b)))
        compiled = step_fn.lower(ts, batch0, jax.random.PRNGKey(0)).compile()
        distributed.barrier("train-step-compiled")

        losses, grad_norms = [], []
        for step in range(2):
            host_batch = local(make_batch(100 + step, global_b))
            ts, metrics = compiled(ts, shard_batch(mesh, host_batch),
                                   jax.random.PRNGKey(step))
            losses.append(float(metrics["final_loss"]))
            grad_norms.append(float(metrics["grad_norm"]))
        final_loss = losses[-1]

        # fetch(): a data-sharded jit output must assemble the full global
        # value on every process
        doubled = jax.jit(lambda b: b["margin"] * 2)(
            shard_batch(mesh, host_batch))
        gathered = distributed.fetch(doubled)
        assert gathered.shape[0] == (global_b // count if count > 1 else global_b) \
            * (count if count > 1 else 1), gathered.shape
        assert np.all(gathered == 2.0)

        # broadcast_scalar(): primary's value reaches every process
        val = 3.25 if distributed.is_primary() else None
        assert distributed.broadcast_scalar(val) == 3.25
        assert distributed.broadcast_scalar(
            None if distributed.is_primary() else 1.0) is None

        # multihost checkpoint save + resume round-trip (orbax coordinates
        # all processes through the jax.distributed client; shared tmpdir)
        folder = os.environ.get("OTPOSE_CKPT_DIR")
        if folder:
            from otpose_tpu.engine import checkpoints as ckpt

            ckpt.save_checkpoint(folder, 0, ts, tensorboard_global_steps=2)
            fresh = init_train_state(replicate(mesh, params),
                                     replicate(mesh, model_state), optimizer)
            ts2, begin_epoch, tb, start_it = ckpt.resume(folder, fresh)
            assert (begin_epoch, tb, start_it) == (1, 2, 0)
            np.testing.assert_array_equal(
                distributed.fetch(ts2.params["final_layer1.weight"]),
                distributed.fetch(ts.params["final_layer1.weight"]))

        # cluster preemption: SIGTERM on ONE process must stop BOTH at the
        # SAME iteration (engine/preempt.py::ClusterPreemptionGuard)
        if count > 1:
            import signal

            from otpose_tpu.engine import checkpoints as ckpt
            from otpose_tpu.engine.preempt import make_preemption_guard

            guard = make_preemption_guard(start_step=1000)
            assert type(guard).__name__ == "ClusterPreemptionGuard"
            ts_p = ts  # keep ts untouched: the npz compare below must match
            stop_at = -1
            for it in range(50):
                ts_p, _ = compiled(ts_p, shard_batch(mesh, local(
                    make_batch(200 + it, global_b))), jax.random.PRNGKey(it))
                if pid == 1 and it == 1:
                    os.kill(os.getpid(), signal.SIGTERM)
                    print("proc1: self-SIGTERM at it=1", flush=True)
                if guard.check():
                    stop_at = it
                    break
            assert guard.requested and stop_at >= 1, stop_at
            # cross-check both processes stopped at the same iteration
            from jax._src.distributed import global_state

            client = global_state.client
            client.key_value_set(f"preempt_stop/{pid}", str(stop_at))
            other = client.blocking_key_value_get(
                f"preempt_stop/{1 - pid}", 120_000)
            assert int(other) == stop_at, (other, stop_at)
            # the collective checkpoint save still works post-agreement
            if folder:
                ckpt.save_checkpoint(folder, 1, ts_p,
                                     tensorboard_global_steps=3,
                                     iteration=stop_at)
            print(f"preempt phase ok: stop_at={stop_at}", flush=True)

    leaves = {k: distributed.fetch(v) for k, v in sorted(ts.params.items())}
    if distributed.is_primary():
        np.savez(out_path, losses=np.float64(losses),
                 grad_norms=np.float64(grad_norms), **leaves)
    print(f"WORKER_OK pid={pid}/{count} loss={final_loss}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
