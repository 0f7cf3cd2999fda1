"""Profile one bf16 training step (batch 6 @1024x1024) on the real TPU and
print the top ops by self time, parsed from the xplane proto directly."""
import os, sys, time, glob
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from pidnet_tpu.losses import FullLoss
from pidnet_tpu.models import pidnet as M
from pidnet_tpu.parallel import make_mesh, shard_batch
from pidnet_tpu.train import TrainState, make_train_step

BATCH, H, W = 6, 1024, 1024
mesh = make_mesh(1)
spec = M.spec_for("pidnet_s", 19, augment=True)
params, state = M.init(jax.random.PRNGKey(0), spec)
loss_fn = FullLoss(ignore_label=255, ohem_kept=131072)
step = make_train_step(spec, loss_fn, mesh, compute_dtype=jnp.bfloat16)
ts = TrainState.create(params, state)
rng = np.random.default_rng(0)
img = rng.standard_normal((BATCH, H, W, 3)).astype(np.float32)
lab = rng.integers(0, 19, (BATCH, H, W)).astype(np.int32)
edge = (rng.random((BATCH, H, W)) < 0.1).astype(np.float32)
batch = shard_batch(mesh, img, lab, edge)

for _ in range(3):
    ts, metrics = step(ts, *batch, 0.01)
    _ = float(metrics["loss"])  # sync (donated-chain block_until_ready unreliable)

t0 = time.perf_counter()
N = 20
for _ in range(N):
    ts, metrics = step(ts, *batch, 0.01)
loss = float(metrics["loss"])
dt = (time.perf_counter() - t0) / N
print(f"train step: {dt*1000:.2f} ms/step  ({BATCH/dt:.1f} img/s)  loss={loss:.3f}")

trace_dir = "/tmp/trace_train"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        ts, metrics = step(ts, *batch, 0.01)
    _ = float(metrics["loss"])

# aggregate op self-times (3 traced steps)
from xplane_top import top_ops

top_ops(trace_dir, n_steps=3, top_k=30)
