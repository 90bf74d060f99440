"""Benchmark: flagship OTPose eval-forward throughput (clips/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric of record (BASELINE.json): PoseTrack17 val clips/sec/chip.  A "clip"
is one 5-frame person sample at full geometry (384x288 input, 96x72
heatmaps).  ``vs_baseline`` is measured-clips/sec divided by the target
(5x the CPU-reference throughput).  The CPU reference is the ACTUAL torch
reference OTPose run on host CPU (its CUDA deform op swapped for an
equivalence-tested F.grid_sample implementation — the reference cannot run
at all without CUDA otherwise); when torch or /root/reference is absent
the committed legacy self-proxy cache (.bench_cpu_baseline.json, measured
round 1) is the fallback denominator.  Both caches ship with the repo —
only a missing torch cache is ever re-measured (post-print, bounded);
BENCH_SKIP_CPU=1 skips that too.

``BENCH_MODE=train`` instead measures END-TO-END training throughput —
jpeg decode, device-side warp/normalize/target-gen (DeviceLoader), forward,
loss, backward, AdamW — on a synthetic flagship-geometry PoseTrack dataset
(clips/sec incl. the input pipeline; VERDICT r1 task 1b).

Un-hangable by construction (VERDICT r2 task 1): a daemon watchdog thread
emits a diagnostic JSON line ``{"metric", "value": null, "error": "timeout
at <phase>"}`` and hard-exits if the global deadline (BENCH_WATCHDOG_SECS,
default 560 s — see _DEFAULT_DEADLINE) or the pre-flight phase deadline
(BENCH_PREFLIGHT_SECS, default 270 s — axon backend init is ~135 s on a
healthy tunnel) expires.  Paths with known-legitimate long compiles widen
the default deadline once the backend is known (train mode 1800 s; the
CPU-backend fallback 3600 s — a cold flagship CPU compile+measure is tens
of minutes); an explicit BENCH_WATCHDOG_SECS always wins.  The pre-flight
is a tiny jitted fetch in-process *before* the flagship compile, so a
wedged chip/tunnel dies at the short deadline with a named phase instead
of burning the whole budget.  Once the flagship is compiled, a 4-iter
provisional burst records a live measurement into the watchdog — a
deadline fire after that point emits the REAL line with the provisional
value (annotated via ``note``) instead of a value:null diagnostic, so a
slow-axon day still produces a live number (VERDICT r4 task 1).  A wedged chip cannot be "downgraded"
mid-process (backend init is process-global), so the diagnostic line IS
the fallback artifact; a *dead relay* (port closed) still downgrades to
the CPU-tagged path before JAX initializes, as before.  The measured value
is printed immediately after measurement — baseline lookups only read the
committed caches; fresh baseline measurement happens after the line is
out, under its own bounded phase (no second JSON line is ever printed once
the real one is out — on a post-print hang the watchdog just exits).
"""

from __future__ import annotations

import json
import os
import threading
import time

import numpy as np

# ---------------------------------------------------------------------------
# Watchdog: guarantees ONE parseable JSON line no matter where we hang.
_WATCHDOG = {
    "t0": None,            # monotonic start
    "phase": "startup",
    "phase_deadline": None,  # absolute monotonic, or None
    "metric": "posetrack17_eval_forward_clips_per_sec_per_chip",
    "deadline": 480.0,     # global, seconds from t0 (mutable: see _widen)
    "printed": False,      # the ONE real JSON line is already out
    "last_cache": None,    # per-metric last-onchip cache path (set in main)
    "phase_log": [],       # [(name, t_enter)] for per-phase timings
    "done": False,
    # set after the first short measured burst: {"value", "iters"}.  A
    # watchdog fire AFTER this point emits the real-shaped JSON line with
    # the provisional value (a live number) instead of a value:null
    # diagnostic (VERDICT r4 task 1).
    "provisional": None,
    "baseline_clips": None,  # cached denominator, stashed pre-measure
    "lock": threading.Lock(),
}


def _emit(line: dict) -> None:
    """Print THE one JSON line.  Serialize first, flip ``printed`` under the
    lock, then write in a single ``os.write`` — so a mid-print watchdog fire
    can never produce a second line, and a failed/blocked stdout leaves a
    distinct stderr diagnostic instead of a silent exit (ADVICE r4)."""
    data = (json.dumps(line) + "\n").encode()
    with _WATCHDOG["lock"]:
        if _WATCHDOG["printed"]:
            return
        _WATCHDOG["printed"] = True
    try:
        os.write(1, data)
    except Exception:
        try:
            os.write(2, b"bench: result line write to stdout FAILED\n")
        except Exception:
            pass
# Default global deadline: 560 s.  Evidence for the driver's budget: in
# round 3 the driver recorded our watchdog line emitted at t=482 s (rc=0),
# so it waits >482 s; its multichip check dies rc=124 consistent with a
# `timeout 600`.  560 leaves ~40 s to flush/exit under a 600 s kill while
# giving the cold-compile path (preflight ~80-135 s + flagship compile
# ~190-300 s + measure) the headroom round 3 lacked at 480.  A warm
# persistent cache (axon serializes TPU executables — receipt in STATUS
# round 4) makes the common case ~90 s total.
_DEFAULT_DEADLINE = 560.0


def _set_phase(name: str, timeout: float | None = None) -> None:
    _WATCHDOG["phase"] = name
    _WATCHDOG["phase_log"].append((name, time.monotonic()))
    _WATCHDOG["phase_deadline"] = (
        time.monotonic() + timeout if timeout else None)


def _phase_durations() -> dict:
    """Elapsed seconds per completed/current phase (VERDICT r3 task 2: both
    the diagnostic and the real JSON line carry where the time went)."""
    log = _WATCHDOG["phase_log"]
    now = time.monotonic()
    out = {}
    for i, (name, t_in) in enumerate(log):
        t_out = log[i + 1][1] if i + 1 < len(log) else now
        out[name] = round(t_out - t_in, 1)
    return out


def _widen_deadline(seconds: float) -> None:
    """Raise the global deadline for a path with known-long compiles (train
    mode / CPU-backend fallback) — unless the operator pinned it via
    BENCH_WATCHDOG_SECS, which always wins."""
    if os.environ.get("BENCH_WATCHDOG_SECS") is None:
        _WATCHDOG["deadline"] = max(_WATCHDOG["deadline"], seconds)


def _watchdog_loop() -> None:
    while not _WATCHDOG["done"]:
        time.sleep(2.0)
        now = time.monotonic()
        elapsed = now - _WATCHDOG["t0"]
        phase_dl = _WATCHDOG["phase_deadline"]
        if _WATCHDOG["done"]:
            return
        if elapsed > _WATCHDOG["deadline"] or (phase_dl and now > phase_dl):
            if not _WATCHDOG["printed"]:
                _emit(_deadline_line(elapsed))
            # hard exit: a hung backend thread cannot be joined; rc 0 so the
            # driver records the diagnostic line rather than a bare timeout.
            # If the real line is already printed (post-print baseline
            # refresh hung), exit silently — never emit a second JSON line.
            os._exit(0)


def _deadline_line(elapsed: float) -> dict:
    """The ONE line for a deadline fire.  With a completed provisional burst
    it is the REAL result (live value, annotated); otherwise the value:null
    diagnostic carrying the last on-chip reading (VERDICT r4 task 1)."""
    prov = _WATCHDOG["provisional"]
    if prov is not None:
        base = _WATCHDOG["baseline_clips"]
        return {
            "metric": _WATCHDOG["metric"],
            "value": round(prov["value"], 3),
            "unit": "clips/sec",
            "vs_baseline": (round(prov["value"] / (5 * base), 3)
                            if base else None),
            "note": "provisional after %d iters; watchdog fired at %s "
                    "after %.0fs" % (prov["iters"], _WATCHDOG["phase"],
                                     elapsed),
            "phases": _phase_durations(),
        }
    line = {
        "metric": _WATCHDOG["metric"],
        "value": None,
        "unit": "clips/sec",
        "vs_baseline": None,
        "error": "timeout at %s after %.0fs" % (_WATCHDOG["phase"], elapsed),
        "phases": _phase_durations(),
    }
    try:
        line["last_onchip"] = json.load(open(_WATCHDOG["last_cache"]))
    except Exception:
        pass
    return line


def _start_watchdog(metric: str, global_deadline: float) -> None:
    _WATCHDOG["t0"] = time.monotonic()
    _WATCHDOG["metric"] = metric
    _WATCHDOG["deadline"] = global_deadline
    threading.Thread(target=_watchdog_loop, daemon=True).start()

CPU_BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".bench_cpu_baseline.json")
# last successful on-chip reading (written after every TPU-backed run, one
# cache per metric so a train-mode diagnostic never embeds an eval reading);
# surfaced in the watchdog's diagnostic line so a wedged-chip timeout still
# reports the most recent real measurement of the SAME metric
LAST_ONCHIP_CACHE = os.path.join(os.path.dirname(__file__),
                                 ".bench_last_onchip.json")
LAST_ONCHIP_TRAIN_CACHE = os.path.join(os.path.dirname(__file__),
                                       ".bench_last_onchip_train.json")
# the ACTUAL torch reference model on host CPU (built via the oracle
# machinery from the parity tests, with the efficient grid_sample DCNv2) —
# the honest "CPU-reference" denominator; the self-proxy above is the
# fallback when torch or /root/reference is unavailable
TORCH_BASELINE_CACHE = os.path.join(os.path.dirname(__file__),
                                    ".bench_torch_cpu_baseline.json")
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))


def _build(compute_dtype):
    import jax
    import jax.numpy as jnp

    from otpose_tpu.models.core import Ctx
    from otpose_tpu.models.otpose import OTPoseSpec, init_otpose, otpose_forward
    from otpose_tpu.utils.testing import flagship_otpose_cfg

    if compute_dtype is None:
        compute_dtype = jnp.float32
    from otpose_tpu.models.otpose import prepare_eval_params

    spec = OTPoseSpec.from_cfg(flagship_otpose_cfg())

    # eval fast path: bf16 conv/dense weights, prepared once outside the
    # step (models/otpose.py::prepare_eval_params).  Build EVERYTHING on the
    # host CPU backend and ship one ~130 MB batched transfer: compiling the
    # init/cast programs on the TPU paid a ~340 s cold compile under
    # drift-prone axon cache keys (r5 phase receipt, STATUS.md), while the
    # CPU compile is local and persistently cached.
    pdt = compute_dtype if compute_dtype != jnp.float32 else None
    dev = jax.local_devices()[0]
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        cpu = None
    if cpu is not None and dev.platform != "cpu":
        with jax.default_device(cpu):
            params, state = init_otpose(jax.random.PRNGKey(0), spec)
            params = prepare_eval_params(params, param_dtype=pdt)
        params, state = jax.device_put((params, state), dev)
    else:
        params, state = init_otpose(jax.random.PRNGKey(0), spec)
        params = prepare_eval_params(params, param_dtype=pdt)

    def f(params, state, x, margin):
        ctx = Ctx(params, state, train=False, compute_dtype=compute_dtype)
        return otpose_forward(ctx, x, margin, spec)[0]

    return jax.jit(f), params, state


def _measure(batch: int, iters: int, compute_dtype) -> float:
    """Clips/sec via N enqueued forwards fenced by ONE scalar fetch of the
    last output.  (block_until_ready does not actually synchronize under
    the axon tunnel, and a per-call scalar fetch pays the tunnel RTT each
    time — a single tail fetch amortizes it, and the device executes the
    enqueued programs in order on its single stream, so the tail fences
    everything before it.  NOTE: in-order execution is a single-device
    property; a multi-device variant would need explicit chaining.)"""
    import jax
    import jax.numpy as jnp

    # fine-grained phases: the warm-cache "compile + measure" still ran
    # ~137 s in round 4 and the buckets below say where such time goes in
    # any future diagnostic line (VERDICT r4 task 1)
    _set_phase("flagship build (param init)")
    fn, params, state = _build(compute_dtype)
    x = jnp.asarray(np.random.RandomState(0).randn(batch, 384, 288, 15),
                    jnp.float32)
    margin = jnp.ones((batch, 4), jnp.float32)

    def fetch(out):
        # device executes enqueued programs in order; fetching one element of
        # the last output fences everything before it
        return float(np.asarray(out[:1, :1, :1, :1]).ravel()[0])

    _set_phase("flagship compile")
    fetch(fn(params, state, x, margin))  # compile
    fetch(fn(params, state, x, margin))  # warm

    # provisional liveness burst: 4 measured iters recorded into the
    # watchdog BEFORE the RTT probe + full burst, so a late deadline fire
    # still carries a live number.  No RTT subtraction here — the estimate
    # is conservatively LOW (honest) by one tunnel round-trip over ~4 steps.
    _set_phase("measure (provisional burst)")
    t0 = time.perf_counter()
    outs = [fn(params, state, x, margin) for _ in range(4)]
    fetch(outs[-1])
    _WATCHDOG["provisional"] = {
        "value": batch * 4 / max(time.perf_counter() - t0, 1e-6), "iters": 4}

    _set_phase("measure (full burst)")
    # RTT probe: reuse the ALREADY-COMPILED preflight scalar program (set in
    # main) rather than jitting a fresh one here — a new compile after the
    # flagship cost 200 s on a congested-tunnel day (r5 phase receipt) and
    # the probe only needs a round-trip of negligible compute.  Probe warmth
    # comes from the preflight itself (round-4 fix: a cold first timed call
    # would inflate the subtracted RTT and the reported clips/sec).
    rtt_probe = _WATCHDOG.get("rtt_probe") or (
        lambda: float(np.asarray(jax.jit(lambda a: a + 1.0)(
            jnp.float32(1.0)))))
    rtt_probe()  # warm (no-op when the preflight already ran it)
    rtt = 0.0
    for _ in range(3):
        s = time.perf_counter()
        rtt_probe()
        rtt += (time.perf_counter() - s) / 3

    t0 = time.perf_counter()
    outs = [fn(params, state, x, margin) for _ in range(iters)]
    fetch(outs[-1])
    dt = max(time.perf_counter() - t0 - rtt, 1e-6)
    return batch * iters / dt


def _measure_torch_reference_cpu(iters: int = 2) -> float:
    """Clips/sec of the *reference torch OTPose* on host CPU at flagship
    geometry (batch 1, eval mode).  The CUDA deform op is replaced by a
    float32 F.grid_sample DCNv2 with identical semantics
    (tests/helpers/torch_otpose.py::get_dcn_classes, equivalence-tested) —
    the realistic efficient CPU implementation, so this measures the
    reference network fairly rather than an oracle stand-in."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import torch

    from tests.helpers.reference import make_hrnet_cfg
    from tests.helpers.torch_otpose import build_reference_otpose

    cfg = make_hrnet_cfg(num_joints=17, width=(48, 96, 192, 384),
                         stage_modules=(1, 4, 3))
    for s, nb in (("STAGE2", 2), ("STAGE3", 3), ("STAGE4", 4)):
        cfg.MODEL.EXTRA[s]["NUM_BLOCKS"] = [4] * nb
    cfg.MODEL.HEATMAP_SIZE = [72, 96]
    cfg.MODEL.FREEZE_HRNET_WEIGHTS = False
    cfg.MODEL.DEFORMABLE_CONV = {"DILATION": [3, 6, 9, 12, 15],
                                 "AGGREGATION_TYPE": "weighted_sum"}
    cfg.MODEL.DEFORMABLE_CONV_CH = 32
    cfg.MODEL.OFFSET_MASK_COMBINE_CONV = 2
    cfg.LOSS = {"NAME": "ST_OHKW_MSELoss", "USE_TARGET_WEIGHT": True}

    torch.manual_seed(0)
    ref = build_reference_otpose(cfg, dcn_impl="fast")
    ref.eval()
    x = torch.randn(1, 15, 384, 288)
    margin = torch.ones(1, 4)
    with torch.no_grad():
        ref(x, margin=margin)  # warm (torch autotune/alloc)
        t0 = time.perf_counter()
        for _ in range(iters):
            ref(x, margin=margin)
    return iters / (time.perf_counter() - t0)


def _measure_train_e2e(batch: int, iters: int) -> float:
    """End-to-end training clips/sec: DeviceLoader (host jpeg decode + device
    preprocessing) feeding the jit train step, timed over full epochs so the
    input pipeline is on the clock."""
    import sys

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import shutil
    import tempfile

    from tests.helpers.synthetic_data import make_synthetic_posetrack

    from otpose_tpu.data.device_loader import DeviceLoader
    from otpose_tpu.data.posetrack import PoseTrackDataset
    from otpose_tpu.engine.optim import make_optimizer, make_schedule
    from otpose_tpu.engine.trainer import init_train_state, make_train_step
    from otpose_tpu.models.otpose import OTPoseSpec, init_otpose
    from otpose_tpu.utils.testing import flagship_otpose_cfg

    backend = jax.default_backend()
    root = tempfile.mkdtemp(prefix="otpose_bench_")
    try:
        n_samples = max(batch * 8, 64)
        json_dir, img_dir, annot_dir = make_synthetic_posetrack(
            root, num_videos=2,
            frames_per_video=max(4, n_samples // (2 * 4)),
            people_per_frame=4, img_w=1280, img_h=720)
        cfg = flagship_otpose_cfg()
        cfg.DATASET.JSON_DIR = json_dir
        cfg.DATASET.IMG_DIR = img_dir
        cfg.DATASET.COLOR_RGB = True
        cfg.TRAIN.PROB_HALF_BODY = 0.0
        # batch 8 fits without remat since the bf16/(B,C,T) work and runs
        # 13.7% faster (tools/time_train_step.py receipts in STATUS.md).
        # Batches above 8 use gradient ACCUMULATION at micro-batch 8, not
        # remat: the round-4 sweep measured b16+remat OOM (16.23G of the
        # 15.75G HBM — the f32 deform tent buffer's remat copies alone are
        # 1.5G) while accum2@16 runs at 910 ms/update and beats 2x b8
        # steps by ~20% per clip (STATUS.md round-4 sweep).
        cfg.TPU.REMAT = False
        # smallest DIVISOR of batch with micro-batch <= 8 (accum_steps must
        # divide the batch or make_train_step rejects it; worst case a prime
        # batch runs micro-batch 1)
        cfg.TPU.ACCUM_STEPS = next(
            (k for k in range(1, batch + 1)
             if batch % k == 0 and batch // k <= 8), batch)

        spec = OTPoseSpec.from_cfg(cfg)
        params, state = init_otpose(jax.random.PRNGKey(0), spec)
        ds = PoseTrackDataset(cfg, "train")
        loader = DeviceLoader(ds, batch, shuffle=True, num_workers=cfg.WORKERS,
                              drop_last=True, prefetch=2)
        schedule = make_schedule(cfg, max(1, len(loader)))
        optimizer = make_optimizer(params, cfg, schedule)
        ts = init_train_state(params, state, optimizer)
        compute = jnp.bfloat16 if backend == "tpu" else jnp.float32
        step_fn = make_train_step(spec, optimizer, compute_dtype=compute,
                                  donate=True, remat=cfg.TPU.REMAT,
                                  accum_steps=cfg.TPU.ACCUM_STEPS)

        def fence(t):
            float(np.asarray(jax.device_get(t.step)))

        # warm: one epoch pass compiles step + preprocess programs
        rng = jax.random.PRNGKey(0)
        for i, (b, _) in enumerate(loader):
            ts, m = step_fn(ts, {k: b[k] for k in ("inputs", "margin", "target",
                                                   "target_weight")}, rng)
            if i >= 1:
                break
        fence(ts)

        done = 0
        t0 = time.perf_counter()
        epoch = 0
        while done < iters:
            epoch += 1
            loader.set_epoch(epoch)
            for b, _ in loader:
                # fresh dropout/drop-path masks per step, as train_epoch does
                ts, m = step_fn(ts, {k: b[k] for k in
                                     ("inputs", "margin", "target",
                                      "target_weight")},
                                jax.random.fold_in(rng, done))
                done += 1
                if done % 8 == 0:
                    # fence + provisional update so a watchdog fire mid-run
                    # still carries a live e2e number (one scalar fetch per
                    # 8 steps ~ negligible vs the 300+ ms steps)
                    fence(ts)
                    _WATCHDOG["provisional"] = {
                        "value": batch * done /
                        max(time.perf_counter() - t0, 1e-6),
                        "iters": done}
                if done >= iters:
                    break
        fence(ts)
        dt = max(time.perf_counter() - t0, 1e-6)
        return batch * done / dt
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _cached_baseline_clips() -> float | None:
    """Read-only baseline lookup — both caches are committed to the repo, so
    this is instant; fresh measurement is deliberately NOT done here (it runs
    after the JSON line is printed, see main)."""
    if os.path.exists(TORCH_BASELINE_CACHE):
        return json.load(open(TORCH_BASELINE_CACHE))["torch_cpu_clips_per_sec"]
    if os.path.exists(CPU_BASELINE_CACHE):
        return json.load(open(CPU_BASELINE_CACHE))["cpu_clips_per_sec"]
    return None


def _refresh_baseline_caches() -> None:
    """Measure a missing baseline cache (post-print; never on the driver's
    critical path since both caches ship with the repo)."""
    if os.environ.get("BENCH_SKIP_CPU") == "1":
        return
    if not os.path.exists(TORCH_BASELINE_CACHE) and os.path.isdir("/root/reference"):
        try:
            torch_clips = _measure_torch_reference_cpu()
            json.dump({"torch_cpu_clips_per_sec": torch_clips},
                      open(TORCH_BASELINE_CACHE, "w"))
        except Exception:
            pass


def _write_last_onchip(path: str, metric: str, value: float) -> None:
    try:
        json.dump({"value": round(value, 3), "unit": "clips/sec",
                   "metric": metric,
                   "recorded": time.strftime("%Y-%m-%d %H:%M UTC",
                                             time.gmtime())},
                  open(path, "w"))
    except Exception:
        pass


def main():
    train_mode = os.environ.get("BENCH_MODE") == "train"
    metric_base = ("posetrack17_train_e2e_clips_per_sec_per_chip" if train_mode
                   else "posetrack17_eval_forward_clips_per_sec_per_chip")
    last_cache = LAST_ONCHIP_TRAIN_CACHE if train_mode else LAST_ONCHIP_CACHE
    _WATCHDOG["last_cache"] = last_cache
    _start_watchdog(metric_base,
                    float(os.environ.get("BENCH_WATCHDOG_SECS",
                                         str(_DEFAULT_DEADLINE))))
    if train_mode:
        # the flagship train step is a much longer compile than the eval
        # forward (15-20 min cold); don't kill a healthy first-ever run
        _widen_deadline(1800.0)

    # a dead axon relay makes backend init hang forever; the port probe runs
    # before any JAX import and pins CPU if the relay is gone
    _set_phase("relay port probe")
    from otpose_tpu.utils.backend import ensure_live_backend

    ensure_live_backend()

    # pre-flight: a tiny jitted fetch is the first device op.  On a healthy
    # tunnel this completes in ~135 s (axon init) + ms; a wedged chip hangs
    # here and the watchdog emits "timeout at preflight..." at the short
    # deadline instead of eating the global budget.
    _set_phase("preflight tiny jit fetch (backend init)",
               timeout=float(os.environ.get("BENCH_PREFLIGHT_SECS", "270")))
    import jax
    import jax.numpy as jnp

    _preflight_fn = jax.jit(lambda a: a + 1.0)
    float(np.asarray(_preflight_fn(jnp.float32(1.0))))
    # keep the compiled scalar program around as the measure-phase RTT probe
    # (compiling a fresh probe after the flagship cost 200 s on a congested
    # tunnel — r5 receipt)
    _WATCHDOG["rtt_probe"] = (
        lambda: float(np.asarray(_preflight_fn(jnp.float32(1.0)))))
    backend = jax.default_backend()
    _WATCHDOG["metric"] = f"{metric_base}[{backend}]"
    if backend != "tpu":
        # the dead-relay CPU fallback pays a cold flagship CPU compile plus a
        # CPU-speed measurement — tens of minutes, still a legitimate run
        _widen_deadline(3600.0)

    if train_mode:
        _set_phase("train e2e compile + measure")
        value = _measure_train_e2e(int(os.environ.get("BENCH_BATCH", "8")),
                                   int(os.environ.get("BENCH_ITERS", "24")))
        # _emit serializes with the watchdog thread: one line, ever
        _emit({
            "metric": f"{metric_base}[{backend}]",
            "value": round(value, 3),
            "unit": "clips/sec",
            "vs_baseline": None,
            "phases": _phase_durations(),
        })
        if backend == "tpu":
            _write_last_onchip(last_cache, f"{metric_base}[{backend}]", value)
        _WATCHDOG["done"] = True
        return

    # stash the cached denominator BEFORE measuring so a provisional line
    # emitted by the watchdog carries vs_baseline too (instant file read)
    baseline_clips = _cached_baseline_clips()
    _WATCHDOG["baseline_clips"] = baseline_clips
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    value = _measure(BATCH, ITERS, dtype)  # sets its own fine-grained phases

    # emit the measured value IMMEDIATELY — vs_baseline from caches only;
    # _emit serializes with the watchdog thread (one line, ever)
    vs_baseline = value / (5 * baseline_clips) if baseline_clips else None
    _emit({
        "metric": f"{metric_base}[{backend}]",
        "value": round(value, 3),
        "unit": "clips/sec",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "phases": _phase_durations(),
    })

    if backend == "tpu":
        _write_last_onchip(last_cache, f"{metric_base}[{backend}]", value)
    # baseline refresh stays under the watchdog (bounded phase): a hang here
    # can no longer keep the process alive forever — but since the real line
    # is out, an expiry exits silently instead of printing a second line
    _set_phase("post-print baseline refresh", timeout=900.0)
    _refresh_baseline_caches()
    _WATCHDOG["done"] = True


if __name__ == "__main__":
    main()
