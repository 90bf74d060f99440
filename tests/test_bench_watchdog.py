"""Unit tests for bench.py's watchdog emit path (no JAX, no device).

The invariants under test are driver-facing: exactly ONE JSON line on
stdout no matter how the watchdog and the main thread race, and a deadline
fire after the provisional burst carries a live value instead of null
(VERDICT r4 task 1; ADVICE r4 single-os.write emit).
"""

import json
import sys
import threading

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
import bench


def _reset(monkeypatch, **over):
    fresh = {
        "t0": 0.0, "phase": "flagship compile", "phase_deadline": None,
        "metric": "m[tpu]", "deadline": 560.0, "printed": False,
        "last_cache": "/nonexistent/cache.json", "phase_log": [],
        "done": False, "provisional": None, "baseline_clips": None,
        "lock": threading.Lock(),
    }
    fresh.update(over)
    monkeypatch.setattr(bench, "_WATCHDOG", fresh)
    return fresh


def test_emit_writes_exactly_one_line(monkeypatch, capfd):
    _reset(monkeypatch)
    bench._emit({"value": 1})
    bench._emit({"value": 2})  # second call must be swallowed
    out, _ = capfd.readouterr()
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) == 1
    assert json.loads(lines[0]) == {"value": 1}


def test_emit_concurrent_single_winner(monkeypatch, capfd):
    """N threads racing _emit produce exactly one stdout line."""
    _reset(monkeypatch)
    threads = [threading.Thread(target=bench._emit, args=({"value": i},))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    out, _ = capfd.readouterr()
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) == 1
    json.loads(lines[0])  # parseable


def test_deadline_line_without_provisional_is_diagnostic(monkeypatch, tmp_path):
    cache = tmp_path / "last.json"
    cache.write_text(json.dumps({"value": 115.3, "unit": "clips/sec"}))
    _reset(monkeypatch, last_cache=str(cache))
    line = bench._deadline_line(500.0)
    assert line["value"] is None
    assert "timeout at flagship compile" in line["error"]
    assert line["last_onchip"]["value"] == 115.3


def test_deadline_line_with_provisional_is_live(monkeypatch):
    _reset(monkeypatch,
           provisional={"value": 110.27, "iters": 4},
           baseline_clips=0.1837)  # torch CPU reference cache value shape
    line = bench._deadline_line(540.0)
    assert line["value"] == 110.27
    assert line["vs_baseline"] == round(110.27 / (5 * 0.1837), 3)
    assert "provisional after 4 iters" in line["note"]
    assert "error" not in line


def test_deadline_line_provisional_without_baseline(monkeypatch):
    _reset(monkeypatch, provisional={"value": 20.5, "iters": 8})
    line = bench._deadline_line(1700.0)
    assert line["value"] == 20.5
    assert line["vs_baseline"] is None
