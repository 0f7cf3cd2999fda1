"""Profile the production folded bf16 inference pipeline (batch 1
@1024x2048, the bench configuration) on the real TPU and print the top
ops by self time from the xplane proto — the inference analogue of
profile_train.py. Optional args: BATCH H W (default 1 1024 2048)."""
import os, sys, time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from pidnet_tpu.convert import fold_params
from pidnet_tpu.models import pidnet as M

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
W = int(sys.argv[3]) if len(sys.argv) > 3 else 2048

spec = M.spec_for("pidnet_s", 19, augment=False)
params, state = M.init(jax.random.PRNGKey(0), spec)
folded = fold_params(params, state, spec)

fn = jax.jit(
    lambda p, x: M.apply(
        p, {}, x, spec, folded=True, compute_dtype=jnp.bfloat16,
        stem_s2d=True, wfold=True,
    )
)
x = jax.device_put(
    jnp.asarray(
        np.random.default_rng(0).standard_normal((BATCH, H, W, 3)), jnp.bfloat16
    )
)

for _ in range(10):
    jax.block_until_ready(fn(folded, x))

t0 = time.perf_counter()
N = 100
for _ in range(N):
    out = fn(folded, x)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / N
print(f"inference: {dt*1000:.3f} ms/call  ({BATCH/dt:.1f} img/s)  out={out.shape}")

trace_dir = "/tmp/trace_infer"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(20):
        out = fn(folded, x)
    jax.block_until_ready(out)

from xplane_top import top_ops

top_ops(trace_dir, n_steps=20, top_k=30)
