"""Timeline view of an xplane trace: interval-UNION busy time per step
(so overlapped async copies are not double-counted), idle gaps, and the
non-overlapped attribution of device time by op kind.

Async `*-start` events span issue->done; summing their self-times
overstates copies 3-4x (see xplane_top.py output vs wall).  Here we
merge all XLA-op intervals to get true device-busy time, and separately
merge only the synchronous (non `-start`) events to see what the device
computes while DMAs fly.

Usage: python scripts/xplane_busy.py /tmp/trace_infer [n_steps]
"""
import os, sys, glob, collections

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sorted(glob.glob(f"{sys.argv[1]}/**/*.xplane.pb", recursive=True))[-1]
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())
plane = next(p for p in xs.planes if p.name == "/device:TPU:0")
md = plane.event_metadata
ops = next(l for l in plane.lines if l.name == "XLA Ops")

evs = []  # (t0_ps, t1_ps, name)
for ev in ops.events:
    name = md[ev.metadata_id].name
    evs.append((ev.offset_ps, ev.offset_ps + ev.duration_ps, name))
evs.sort()
span = (evs[-1][1] - evs[0][0]) / 1e9


def union_ms(intervals):
    busy, cur0, cur1 = 0, None, None
    for a, b, _ in sorted(intervals):
        if cur1 is None or a > cur1:
            if cur1 is not None:
                busy += cur1 - cur0
            cur0, cur1 = a, b
        else:
            cur1 = max(cur1, b)
    if cur1 is not None:
        busy += cur1 - cur0
    return busy / 1e9


def is_async_start(name):
    head = name.split(" = ")[0]
    return "-start" in head


sync = [e for e in evs if not is_async_start(e[2])]
print(f"trace span          : {span:8.3f} ms  ({span/n_steps:.3f} ms/step)")
print(f"busy (all ops union): {union_ms(evs):8.3f} ms  ({union_ms(evs)/n_steps:.3f} ms/step)")
print(f"busy (sync ops only): {union_ms(sync):8.3f} ms  ({union_ms(sync)/n_steps:.3f} ms/step)")

# top idle gaps in the all-ops union
merged = []
for a, b, _ in sorted(evs):
    if merged and a <= merged[-1][1]:
        merged[-1][1] = max(merged[-1][1], b)
    else:
        merged.append([a, b])
gaps = sorted(
    ((merged[i + 1][0] - merged[i][1], merged[i][1]) for i in range(len(merged) - 1)),
    reverse=True,
)[:10]
print("\ntop idle gaps (device doing nothing):")
for g, t in gaps:
    print(f"  {g/1e9:7.3f} ms at t={((t - evs[0][0])/1e9):9.3f} ms")

# non-overlapped attribution: sweep-line, charge each instant to ONE op
# (sync ops win over async starts; ties charge the shortest event = innermost)
points = []
for idx, (a, b, name) in enumerate(evs):
    points.append((a, 0, idx))
    points.append((b, 1, idx))
points.sort()
active = set()
attr = collections.Counter()
prev = None
for t, kind_p, idx in points:
    if prev is not None and active and t > prev:
        live = [evs[i] for i in active]
        s = [e for e in live if not is_async_start(e[2])]
        pick = min(s or live, key=lambda e: e[1] - e[0])
        k = pick[2].split(" = ")[0].lstrip("%").rstrip("0123456789.")
        attr[k] += t - prev
    if kind_p == 0:
        active.add(idx)
    else:
        active.discard(idx)
    prev = t
total = sum(attr.values())
print(f"\nnon-overlapped attribution ({total/1e9/n_steps:.3f} ms/step):")
for k, ps in attr.most_common(20):
    print(f"{ps/1e9/n_steps:9.3f} ms {100*ps/total:5.1f}%  {k}")
