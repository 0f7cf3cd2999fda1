import os, sys, glob, collections
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sorted(glob.glob(f"{sys.argv[1]}/**/*.xplane.pb", recursive=True))[-1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 1
kind = sys.argv[3] if len(sys.argv) > 3 else "copy"
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())
plane = next(p for p in xs.planes if p.name == "/device:TPU:0")
md = plane.event_metadata
ops = next(l for l in plane.lines if l.name == "XLA Ops")
tot = collections.Counter()
for ev in ops.events:
    name = md[ev.metadata_id].name
    k = name.split(" = ")[0].lstrip("%").rstrip("0123456789.")
    if k == kind:
        tot[name] += ev.duration_ps
for name, ps in tot.most_common(20):
    print(f"{ps/1e9/n:8.3f} ms  {name[:160]}")
