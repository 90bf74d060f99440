"""Minimal XPlane (tsl profiler) protobuf reader.

jax.profiler.trace writes ``*.xplane.pb`` (XSpace proto).  The vendored
tensorboard_plugin_profile protos don't load under this protobuf version, so
this module decodes the wire format directly — enough to aggregate device-op
durations for perf work (no TensorBoard needed).

Schema (tsl/profiler/protobuf/xplane.proto):
  XSpace.planes = 1 (XPlane)
  XPlane: name=2, lines=3 (XLine), event_metadata=4 (map<int64, XEventMetadata>)
  XLine:  name=2, events=6 (XEvent)
  XEvent: metadata_id=1, duration_ps=3
  XEventMetadata: id=1, name=2, display_name=3
"""

from __future__ import annotations

import collections
import struct
from typing import Dict, Iterator, Tuple


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 1:
            val = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _parse_event_metadata(buf: bytes) -> Tuple[int, str]:
    mid, name, display = 0, "", ""
    for field, _wt, val in _fields(buf):
        if field == 1:
            mid = val
        elif field == 2:
            name = val.decode("utf-8", "replace")
        elif field == 3:
            display = val.decode("utf-8", "replace")
    return mid, (display or name)


def _parse_map_entry(buf: bytes) -> Tuple[int, bytes]:
    key, value = 0, b""
    for field, _wt, val in _fields(buf):
        if field == 1:
            key = val
        elif field == 2:
            value = val
    return key, value


def _parse_event_metadata_stats(buf: bytes, stat_names: Dict[int, str]):
    """XEventMetadata.stats (field 5, repeated XStat) -> {stat_name: value}.

    XStat: metadata_id=1, double=2, uint64=3, int64=4, str=5, bytes=6."""
    out = {}
    for field, _wt, val in _fields(buf):
        if field != 5 or not isinstance(val, (bytes, bytearray)):
            continue
        sid, sval = None, None
        for sf, _sw, sv in _fields(val):
            if sf == 1:
                sid = sv
            elif sf in (2, 3, 4):
                sval = sv
            elif sf in (5, 6):
                sval = sv.decode("utf-8", "replace") if sf == 5 else sv
        nm = stat_names.get(sid)
        if nm is not None:
            out[nm] = sval
    return out


def parse_plane(buf: bytes, want_stats: bool = False):
    """-> (name, [(line_name, [(metadata_id, duration_ps)])], {id: op_name})
    or, with ``want_stats``, a 4th element {id: {stat_name: value}} holding
    each op's XEventMetadata stats (hlo_category, flops, ...)."""
    name = ""
    lines = []
    metadata: Dict[int, str] = {}
    stat_names: Dict[int, str] = {}
    md_entries = []
    md_stats: Dict[int, dict] = {}
    for field, _wt, val in _fields(buf):
        if field == 5:
            # stat_metadata map entry: value is XStatMetadata (id=1, name=2)
            _k, entry = _parse_map_entry(val)
            sid, snm = 0, ""
            for sf, _sw, sv in _fields(entry):
                if sf == 1:
                    sid = sv
                elif sf == 2:
                    snm = sv.decode("utf-8", "replace")
            stat_names[sid] = snm
        if field == 2:
            name = val.decode("utf-8", "replace")
        elif field == 3:
            lname, events = "", []
            for f2, _w2, v2 in _fields(val):
                if f2 == 2:
                    lname = v2.decode("utf-8", "replace")
                elif f2 in (4, 6):
                    # XLine.events is field 4 in the canonical tsl
                    # xplane.proto (fields 5-8 reserved); 6 was an early
                    # incorrect guess kept for compatibility — accept both
                    # (XEvent fields are identical)
                    mid, dur = 0, 0
                    for f3, _w3, v3 in _fields(v2):
                        if f3 == 1:
                            mid = v3
                        elif f3 == 3:
                            dur = v3
                    events.append((mid, dur))
            lines.append((lname, events))
        elif field == 4:
            _key, entry = _parse_map_entry(val)
            mid, mname = _parse_event_metadata(entry)
            metadata[mid] = mname
            if want_stats:
                md_entries.append((mid, entry))
    if want_stats:
        # stat_metadata (field 5) may appear after event_metadata in the
        # wire stream, so resolve names in a second pass
        for mid, entry in md_entries:
            md_stats[mid] = _parse_event_metadata_stats(entry, stat_names)
        return name, lines, metadata, md_stats
    return name, lines, metadata


def iter_planes(path: str, want_stats: bool = False):
    with open(path, "rb") as f:
        buf = f.read()
    for field, _wt, val in _fields(buf):
        if field == 1:
            yield parse_plane(val, want_stats=want_stats)


def device_op_totals(path: str, merge_lines: bool = True):
    """Aggregate device-plane op durations (ms) by op name.

    Only the synchronous "XLA Ops" line counts: "Async XLA Ops" carries
    DMA copies that OVERLAP compute (summing them quadrupled the round-5
    train-step total — 2326 "ms/iter" vs the 388 ms Steps line)."""
    agg = collections.Counter()
    for name, lines, metadata in iter_planes(path):
        low = name.lower()
        if "tpu" not in low and "gpu" not in low and "device" not in low:
            continue
        if "host" in low:
            continue
        for lname, events in lines:
            # XLA op lines carry the per-op breakdown; "Steps"/module lines
            # would double-count, async lines overlap compute
            ll = lname.lower()
            if "async" in ll:
                continue
            if "xla op" not in ll and "ops" not in ll:
                continue
            for mid, dur in events:
                agg[metadata.get(mid, f"#{mid}")] += dur / 1e9
    return agg


def device_step_budget(path: str):
    """Per-step budget from the device plane: average Steps-line ms, total
    sync-op ms by hlo_category with XLA's per-op flops, and the overlapped
    async-copy total (reported separately — it hides under compute)."""
    out = {"steps_ms": [], "categories": {}, "async_ms": 0.0, "flops": 0.0}
    for plane in iter_planes(path, want_stats=True):
        name, lines, metadata, md_stats = plane
        low = name.lower()
        if ("tpu" not in low and "gpu" not in low and "device" not in low) \
                or "host" in low:
            continue
        for lname, events in lines:
            ll = lname.lower()
            if ll == "steps":
                out["steps_ms"] += [d / 1e9 for _m, d in events if d > 0]
            elif "async" in ll and "xla op" in ll:
                out["async_ms"] += sum(d for _m, d in events) / 1e9
            elif "xla op" in ll:
                for mid, dur in events:
                    st = md_stats.get(mid, {})
                    cat = st.get("hlo_category") or "uncategorized"
                    if isinstance(cat, bytes):
                        cat = cat.decode("utf-8", "replace")
                    ms, fl = out["categories"].get(cat, (0.0, 0.0))
                    f = float(st.get("flops") or 0.0)
                    out["categories"][cat] = (ms + dur / 1e9, fl + f)
                    out["flops"] += f
    return out
