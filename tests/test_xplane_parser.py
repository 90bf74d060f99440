"""Unit tests for the hand-rolled XSpace/XPlane wire-format reader.

``tools/xplane.py`` decodes profiler ``*.xplane.pb`` files directly (the
vendored tensorboard protos don't load here) and its aggregations are the
basis of the perf receipts of record (per-op budgets, the round-5
hlo_category/flops step budget, the async-DMA exclusion).  These tests
build an XSpace buffer byte-by-byte from the canonical schema
(tsl/profiler/protobuf/xplane.proto) and pin the parser's aggregation
semantics: host planes and async lines excluded, Steps-line wall per
step, per-category ms+flops, and the field-4/field-6 XLine.events
compatibility.
"""

import struct

from tools.xplane import device_op_totals, device_step_budget, iter_planes


# --- minimal protobuf wire-format writers --------------------------------

def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _vint(field: int, v: int) -> bytes:        # wire type 0
    return _varint((field << 3) | 0) + _varint(v)


def _ld(field: int, payload: bytes) -> bytes:  # wire type 2
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _d64(field: int, v: float) -> bytes:       # wire type 1 (double)
    return _varint((field << 3) | 1) + struct.pack("<d", v)


def _stat_metadata_entry(sid: int, name: str) -> bytes:
    # XPlane.stat_metadata map entry: key=1, value=XStatMetadata(id=1, name=2)
    meta = _vint(1, sid) + _ld(2, name.encode())
    return _ld(5, _vint(1, sid) + _ld(2, meta))


def _stat(sid: int, *, u64: int = None, dbl: float = None) -> bytes:
    # XStat: metadata_id=1, double_value=2, uint64_value=3
    body = _vint(1, sid)
    if u64 is not None:
        body += _vint(3, u64)
    if dbl is not None:
        body += _d64(2, dbl)
    return body


def _event_metadata_entry(mid: int, name: str, stats=()) -> bytes:
    # XPlane.event_metadata map entry: key=1, value=XEventMetadata
    # XEventMetadata: id=1, name=2, stats=5 (repeated XStat)
    meta = _vint(1, mid) + _ld(2, name.encode())
    for st in stats:
        meta += _ld(5, st)
    return _ld(4, _vint(1, mid) + _ld(2, meta))


def _event(mid: int, dur_ps: int) -> bytes:
    # XEvent: metadata_id=1, duration_ps=3
    return _vint(1, mid) + _vint(3, dur_ps)


def _line(name: str, events, events_field: int = 4) -> bytes:
    # XLine: name=2, events=4 (canonical; 6 accepted for compatibility)
    body = _ld(2, name.encode())
    for ev in events:
        body += _ld(events_field, ev)
    return _ld(3, body)


def _plane(name: str, parts) -> bytes:
    return _ld(1, _ld(2, name.encode()) + b"".join(parts))


MS = 10**9  # ps per ms


def _write_space(tmp_path, planes) -> str:
    path = str(tmp_path / "trace.xplane.pb")
    with open(path, "wb") as f:
        f.write(b"".join(planes))
    return path


def _device_plane_full() -> bytes:
    """A TPU device plane: two ops (one with hlo_category/flops stats, one
    bare), a Steps line, a sync XLA Ops line, and an async DMA line.
    Event metadata is emitted BEFORE stat_metadata, exercising the parser's
    second-pass stat-name resolution."""
    cat = _stat(7) + _ld(5, b"convolution fusion")  # str_value=5
    flops = _stat(8, u64=5_000_000)
    return _plane("/device:TPU:0 (stats)", [
        _event_metadata_entry(1, "fusion.1", stats=[cat, flops]),
        _event_metadata_entry(2, "copy.2"),
        _stat_metadata_entry(7, "hlo_category"),
        _stat_metadata_entry(8, "flops"),
        _line("Steps", [_event(9, 380 * MS), _event(9, 390 * MS)]),
        _line("XLA Ops", [_event(1, 2 * MS), _event(2, MS // 2)]),
        _line("Async XLA Ops #1", [_event(2, 100 * MS)]),
    ])


def _host_plane() -> bytes:
    return _plane("/host:CPU", [
        _event_metadata_entry(1, "python_call"),
        _line("XLA Ops", [_event(1, 50 * MS)]),
    ])


def test_iter_planes_names_lines_metadata(tmp_path):
    path = _write_space(tmp_path, [_device_plane_full(), _host_plane()])
    planes = list(iter_planes(path))
    assert [p[0] for p in planes] == ["/device:TPU:0 (stats)", "/host:CPU"]
    name, lines, metadata = planes[0]
    assert metadata == {1: "fusion.1", 2: "copy.2"}
    assert [ln for ln, _ in lines] == ["Steps", "XLA Ops", "Async XLA Ops #1"]
    assert dict(lines)["XLA Ops"] == [(1, 2 * MS), (2, MS // 2)]


def test_device_op_totals_excludes_host_and_async(tmp_path):
    path = _write_space(tmp_path, [_device_plane_full(), _host_plane()])
    agg = device_op_totals(path)
    # host plane's python_call and the async DMA must not appear; the sync
    # line aggregates in ms
    assert set(agg) == {"fusion.1", "copy.2"}
    assert abs(agg["fusion.1"] - 2.0) < 1e-9
    assert abs(agg["copy.2"] - 0.5) < 1e-9


def test_step_budget_categories_flops_async(tmp_path):
    path = _write_space(tmp_path, [_device_plane_full(), _host_plane()])
    budget = device_step_budget(path)
    assert budget["steps_ms"] == [380.0, 390.0]
    # op 1 carries hlo_category + flops; op 2 has no stats -> uncategorized
    ms, fl = budget["categories"]["convolution fusion"]
    assert abs(ms - 2.0) < 1e-9 and fl == 5_000_000
    ms2, fl2 = budget["categories"]["uncategorized"]
    assert abs(ms2 - 0.5) < 1e-9 and fl2 == 0.0
    assert budget["flops"] == 5_000_000
    # async DMA is reported separately, never summed into categories
    assert abs(budget["async_ms"] - 100.0) < 1e-9
    assert "Async" not in str(set(budget["categories"]))


def test_xline_events_field6_compatibility(tmp_path):
    """Early traces were read with XLine.events guessed as field 6; the
    parser accepts both 4 and 6."""
    plane6 = _plane("/device:TPU:0", [
        _event_metadata_entry(1, "fusion.1"),
        _line("XLA Ops", [_event(1, 3 * MS)], events_field=6),
    ])
    path = _write_space(tmp_path, [plane6])
    agg = device_op_totals(path)
    assert abs(agg["fusion.1"] - 3.0) < 1e-9


def test_multibyte_varint_roundtrip(tmp_path):
    """Durations/flops above 2^28 exercise multi-byte varints."""
    big = 123_456_789_012  # ps
    plane = _plane("/device:TPU:0", [
        _event_metadata_entry(1, "dot.9"),
        _line("XLA Ops", [_event(1, big)]),
    ])
    path = _write_space(tmp_path, [plane])
    agg = device_op_totals(path)
    assert abs(agg["dot.9"] - big / 1e9) < 1e-9
