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


def parse_plane(buf: bytes):
    """-> (name, [(line_name, [(metadata_id, duration_ps)])], {id: op_name})."""
    name = ""
    lines = []
    metadata: Dict[int, str] = {}
    for field, _wt, val in _fields(buf):
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
    return name, lines, metadata


def iter_planes(path: str):
    with open(path, "rb") as f:
        buf = f.read()
    for field, _wt, val in _fields(buf):
        if field == 1:
            yield parse_plane(val)


def device_op_totals(path: str, merge_lines: bool = True):
    """Aggregate device-plane op durations (ms) by op name."""
    agg = collections.Counter()
    for name, lines, metadata in iter_planes(path):
        low = name.lower()
        if "tpu" not in low and "gpu" not in low and "device" not in low:
            continue
        if "host" in low:
            continue
        for lname, events in lines:
            # XLA op lines carry the per-op breakdown; "Steps"/module lines
            # would double-count
            if "xla op" not in lname.lower() and "ops" not in lname.lower():
                continue
            for mid, dur in events:
                agg[metadata.get(mid, f"#{mid}")] += dur / 1e9
    return agg
