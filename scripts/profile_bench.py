"""Profile the EXACT bench program (AutoLayoutFn + stem_view + folded
bf16 + wfold) at an arbitrary batch and print the xplane_busy timeline
attribution. Args: BATCH [H W] [REGION] (default 1 1024 2048 off;
REGION in {off,on,p,d} selects the stay-folded wfold_region variant).

Usage: python scripts/profile_bench.py 8 1024 2048 on
"""
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

from pidnet_tpu.convert import fold_params
from pidnet_tpu.models import pidnet as M
from pidnet_tpu.ops.layouts import AutoLayoutFn
from pidnet_tpu.ops.space_to_depth import stem_view

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
W = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
REGION = {"off": False, "on": True}.get(
    sys.argv[4] if len(sys.argv) > 4 else "off", sys.argv[4] if len(sys.argv) > 4 else False
)

ARCH = os.environ.get("ARCH", "pidnet_s")
spec = M.spec_for(ARCH, 19, augment=False)
params, state = M.init(jax.random.PRNGKey(0), spec)
folded = fold_params(params, state, spec)
afn = AutoLayoutFn(
    lambda p, v: M.apply(
        p, {}, v, spec, folded=True, compute_dtype=jnp.bfloat16,
        stem_s2d=True, wfold=True, wfold_region=REGION,
    ),
    folded,
    jax.ShapeDtypeStruct((BATCH, H, W // 8, 24), jnp.bfloat16),
)
x_np = np.random.default_rng(0).standard_normal((BATCH, H, W, 3)).astype(np.float32)
pf, x = afn.place(folded, jnp.asarray(stem_view(x_np), jnp.bfloat16))

for _ in range(10):
    out = afn(pf, x)
jax.block_until_ready(out)
t0 = time.perf_counter()
N = 50
for _ in range(N):
    out = afn(pf, x)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / N
print(f"wall: {dt*1000:.3f} ms/call  ({BATCH/dt:.1f} img/s)  batch={BATCH} region={REGION} arch={ARCH}")

trace_dir = f"/tmp/trace_bench_{ARCH}_b{BATCH}_{REGION}"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(20):
        out = afn(pf, x)
    jax.block_until_ready(out)
os.system(f"python {os.path.dirname(os.path.abspath(__file__))}/xplane_busy.py {trace_dir} 20")
