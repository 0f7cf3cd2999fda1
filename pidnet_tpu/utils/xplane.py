"""Importable xplane-trace analysis: interval-UNION device-busy time.

Wall-clock FPS on this host is sensitive to CPU contention (the axon
round trip is host-bound; round 4 recorded 114 FPS for a program that
measures 407 on a quiet host). Device-busy time from the profiler
timeline is immune to that: we merge all XLA-op intervals on the TPU
plane (so overlapped async DMA copies are not double-counted) and
divide by the step count. Extracted from scripts/xplane_busy.py so
bench.py can emit `device_busy_ms_per_step` beside wall FPS.
"""

from __future__ import annotations

import glob
import os


def _union_ms(intervals) -> float:
    busy, cur0, cur1 = 0, None, None
    for a, b in sorted(intervals):
        if cur1 is None or a > cur1:
            if cur1 is not None:
                busy += cur1 - cur0
            cur0, cur1 = a, b
        else:
            cur1 = max(cur1, b)
    if cur1 is not None:
        busy += cur1 - cur0
    return busy / 1e9


def device_busy_ms(trace_dir: str, device_substr: str = "/device:TPU:0"):
    """Interval-union busy ms on the device plane of the newest trace
    under `trace_dir`, or None when no trace/proto support exists."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception:
        return None
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        return None
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    plane = next((p for p in xs.planes if device_substr in p.name), None)
    if plane is None:
        return None
    line = next((l for l in plane.lines if l.name == "XLA Ops"), None)
    if line is None or not line.events:
        return None
    evs = [(ev.offset_ps, ev.offset_ps + ev.duration_ps) for ev in line.events]
    return _union_ms(evs)
