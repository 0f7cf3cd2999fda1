"""Aggregate op self-times from an xplane trace. Usage:
python scripts/xplane_top.py /tmp/trace_train [n_steps] [top_k]"""
import os, sys, glob, collections
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
from tensorflow.tsl.profiler.protobuf import xplane_pb2

def top_ops(trace_dir, n_steps=1, top_k=30):
    path = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    plane = next(p for p in xs.planes if p.name == "/device:TPU:0")
    md = plane.event_metadata
    totals = collections.Counter()
    for line in plane.lines:
        if "XLA Ops" not in line.name and "Steps" not in line.name:
            continue
        if "XLA Ops" not in line.name:
            continue
        for ev in line.events:
            totals[md[ev.metadata_id].name] += ev.duration_ps
    rows = totals.most_common(top_k)
    total = sum(totals.values())
    print(f"total device op time: {total/1e9/n_steps:.3f} ms/step over {n_steps} steps")
    for name, ps in rows:
        print(f"{ps/1e9/n_steps:9.3f} ms  {100*ps/total:5.1f}%  {name[:110]}")
    return totals

if __name__ == "__main__":
    top_ops(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 1,
            int(sys.argv[3]) if len(sys.argv) > 3 else 30)
