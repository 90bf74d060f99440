"""Tests for the axon relay liveness guard (otpose_tpu/utils/backend.py)."""

import json
import os
import socket
import subprocess
import sys
import threading

from otpose_tpu.utils import backend


def test_relay_alive_detects_listener():
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def accept_loop():
        srv.settimeout(0.2)
        while not stop.is_set():
            try:
                c, _ = srv.accept()
                c.close()
            except OSError:
                pass

    t = threading.Thread(target=accept_loop, daemon=True)
    t.start()
    try:
        assert backend.axon_relay_alive(port=port)
    finally:
        stop.set()
        t.join()
        srv.close()
    # now closed
    assert not backend.axon_relay_alive(port=port, timeout=0.2)


def test_axon_requested_parsing(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert not backend._axon_requested()
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert backend._axon_requested()
    monkeypatch.delenv("JAX_PLATFORMS")
    monkeypatch.delenv("PALLAS_AXON_TPU_GEN", raising=False)
    assert not backend._axon_requested()
    monkeypatch.setenv("PALLAS_AXON_TPU_GEN", "v5e")
    assert backend._axon_requested()


def test_ensure_live_backend_falls_back_to_cpu(monkeypatch):
    # axon requested but nothing listens on the probed port -> cpu pin
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(backend, "_AXON_RELAY_PORT", _free_port())
    assert backend.ensure_live_backend(verbose=False) == "cpu"
    import jax

    assert jax.config.jax_platforms == "cpu"


def test_ensure_live_backend_noop_when_cpu(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert backend.ensure_live_backend(verbose=False) == "cpu"


def test_bench_watchdog_emits_parseable_line():
    """bench.py must ALWAYS produce one parseable JSON line (VERDICT r2
    task 1): with a deliberately tiny global deadline on CPU, the watchdog
    fires during the flagship compile and prints a diagnostic line with
    value=null + a named phase, exiting 0."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_WATCHDOG_SECS="15",
               BENCH_SKIP_CPU="1")
    env.pop("XLA_FLAGS", None)  # no virtual-device mesh in the subprocess
    out = subprocess.run([sys.executable, os.path.join(repo, "bench.py")],
                         capture_output=True, text=True, timeout=300,
                         cwd=repo, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert rec["value"] is None
    assert "timeout at" in rec["error"]
    assert rec["metric"].startswith("posetrack17_eval_forward")
    # the diagnostic surfaces the last real on-chip reading from the
    # committed .bench_last_onchip.json cache (written on every TPU run)
    assert rec["last_onchip"]["value"] > 0
    assert rec["last_onchip"]["unit"] == "clips/sec"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_axon_requested_ignores_non_cpu_platform_values(monkeypatch):
    """The axon plugin ignores JAX_PLATFORMS entirely, so with the plugin
    installed ANY value except an explicit cpu-only request must still
    trigger the relay probe — 'JAX_PLATFORMS=tpu' on a dead relay used to
    skip both the probe and the cpu pin and hang backend init forever."""
    monkeypatch.setenv("PALLAS_AXON_TPU_GEN", "1")
    for value in ("tpu", "cpu,tpu", " axon", "nonsense"):
        monkeypatch.setenv("JAX_PLATFORMS", value)
        assert backend._axon_requested(), value
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert not backend._axon_requested()
    monkeypatch.delenv("JAX_PLATFORMS")
    assert backend._axon_requested()
    monkeypatch.delenv("PALLAS_AXON_TPU_GEN")
    monkeypatch.setenv("JAX_PLATFORMS", "tpu")
    assert not backend._axon_requested()  # no plugin installed
