import os, sys, glob, collections
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sorted(glob.glob(f"{sys.argv[1]}/**/*.xplane.pb", recursive=True))[-1]
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())
plane = next(p for p in xs.planes if p.name == "/device:TPU:0")
md = plane.event_metadata
for line in plane.lines:
    tot = sum(ev.duration_ps for ev in line.events)
    print(f"line {line.name!r}: {len(line.events)} events, {tot/1e9/n_steps:.2f} ms/step")

# on the XLA Ops line, group by op kind, skipping async -start issue events
ops = next(l for l in plane.lines if l.name == "XLA Ops")
by_kind = collections.Counter()
for ev in ops.events:
    name = md[ev.metadata_id].name
    kind = name.split(" = ")[0].lstrip("%").rstrip("0123456789.")
    by_kind[kind] += ev.duration_ps
total = sum(by_kind.values())
print(f"\nXLA Ops total {total/1e9/n_steps:.2f} ms/step")
for k, ps in by_kind.most_common(25):
    print(f"{ps/1e9/n_steps:9.3f} ms {100*ps/total:5.1f}%  {k}")
