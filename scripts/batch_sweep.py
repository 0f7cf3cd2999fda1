"""Inference batch-scaling sweep on the real TPU.

Compiles the production folded bf16 pipeline at several batch sizes and
interleaves timed trials across batches (round-robin) so host-side
contention affects all batch sizes equally instead of biasing whichever
ran last.  Prints per-batch median/min ms/call and aggregate img/s.

Usage: python scripts/batch_sweep.py [BATCHES=1,2,4,8] [H=1024] [W=2048] [TRIALS=5]
Set NOVIEW=1 to feed the raw (N,H,W,3) input instead of the free
stem_view form, and NOAUTO=1 to use default entry layouts instead of
AUTO (A/B for the input-relayout saving, ops/layouts.py).
"""
import os, sys, time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from pidnet_tpu.convert import fold_params
from pidnet_tpu.models import pidnet as M
from pidnet_tpu.ops.layouts import AutoLayoutFn
from pidnet_tpu.ops.space_to_depth import stem_view

batches = [int(b) for b in (sys.argv[1] if len(sys.argv) > 1 else "1,2,4,8").split(",")]
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
W = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
TRIALS = int(sys.argv[4]) if len(sys.argv) > 4 else 5
ARCH = os.environ.get("ARCH", "pidnet_s")

spec = M.spec_for(ARCH, 19, augment=False)
params, state = M.init(jax.random.PRNGKey(0), spec)
folded = fold_params(params, state, spec)

apply = lambda p, x: M.apply(
    p, {}, x, spec, folded=True, compute_dtype=jnp.bfloat16,
    stem_s2d=True, wfold=True, wfold_region="auto",
)

view = (lambda a: a) if os.environ.get("NOVIEW") else stem_view
rng = np.random.default_rng(0)
raw = {b: rng.standard_normal((b, H, W, 3)) for b in batches}

if os.environ.get("NOAUTO"):
    jfn = jax.jit(apply)
    fns = {b: jfn for b in batches}
    args = {
        b: (folded, jax.device_put(jnp.asarray(view(raw[b]), jnp.bfloat16)))
        for b in batches
    }
else:
    fns, args = {}, {}
    for b in batches:
        xv = jnp.asarray(view(raw[b]), jnp.bfloat16)
        fns[b] = AutoLayoutFn(apply, folded, xv)
        args[b] = fns[b].place(folded, xv)
        assert fns[b]._fallback is None, "AUTO layout path unavailable"
        # warm immediately: interleaving later compiles between place()
        # and the first call has produced stale-layout arguments (see
        # AutoLayoutFn.place verify note)
        for _ in range(5):
            jax.block_until_ready(fns[b](*args[b]))

if os.environ.get("NOAUTO"):
    for b in batches:  # compile + warm
        for _ in range(5):
            jax.block_until_ready(fns[b](*args[b]))

N = 50
times = {b: [] for b in batches}
for t in range(TRIALS):
    for b in batches:
        fn, a = fns[b], args[b]
        jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(N):
            out = fn(*a)
        jax.block_until_ready(out)
        times[b].append((time.perf_counter() - t0) / N)

for b in batches:
    ms = sorted(times[b])
    med = ms[len(ms) // 2]
    print(
        f"batch {b:2d}: median {med*1000:7.3f} ms/call  min {ms[0]*1000:7.3f}"
        f"  -> {b/med:6.1f} img/s (median)  {b/ms[0]:6.1f} img/s (best)"
        f"  trials[ms]={[f'{m*1000:.2f}' for m in ms]}"
    )
