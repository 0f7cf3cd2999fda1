"""Probe XLA's preferred input layout for the folded inference pipeline.

1. Compiles the production pipeline with default layouts and dumps the
   optimized HLO around the input-side copies.
2. Recompiles with AUTO argument layouts (jax.experimental.layout) and
   reports the layout XLA picks and the timed difference on the chip.

Usage: python scripts/layout_probe.py [BATCH=8] [H=1024] [W=2048]
"""
import os, sys, time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from pidnet_tpu.convert import fold_params
from pidnet_tpu.models import pidnet as M

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
W = int(sys.argv[3]) if len(sys.argv) > 3 else 2048

spec = M.spec_for("pidnet_s", 19, augment=False)
params, state = M.init(jax.random.PRNGKey(0), spec)
folded = fold_params(params, state, spec)

f = lambda p, x: M.apply(
    p, {}, x, spec, folded=True, compute_dtype=jnp.bfloat16,
    stem_s2d=True, wfold=True,
)

x = jnp.zeros((BATCH, H, W, 3), jnp.bfloat16)

# --- default layouts: dump HLO, find input copies + custom calls -------
lowered = jax.jit(f).lower(folded, x)
hlo = lowered.compile().as_text()
print("== default-layout compiled HLO: input copies / custom-calls ==")
for line in hlo.splitlines():
    ls = line.strip()
    if ls.startswith("%copy.11") or " custom-call(" in ls or "custom_call_target" in ls:
        print(ls[:220])
print()
print("entry_computation_layout line:")
for line in hlo.splitlines():
    if "entry_computation_layout" in line:
        print(line.strip()[:400])
        break

# --- AUTO layouts ------------------------------------------------------
try:
    from jax.experimental.layout import Layout, DeviceLocalLayout as DLL  # older API
    auto = Layout(DLL.AUTO)
except Exception:
    try:
        from jax.experimental.layout import Format, Layout as DL  # newer API
        auto = Format(DL.AUTO)
    except Exception as e:
        print("no layout API:", e)
        sys.exit(0)

jf = jax.jit(f, in_shardings=(auto, auto), out_shardings=auto)
lowered2 = jf.lower(folded, x)
comp2 = lowered2.compile()
try:
    in_fmts = comp2.input_formats
except AttributeError:
    in_fmts = comp2.input_layouts
print("\n== AUTO-chosen input layouts (x is the last one) ==")
leaves = jax.tree_util.tree_leaves(in_fmts)
print("x:", leaves[-1])

hlo2 = comp2.as_text()
n_copy = sum(1 for l in hlo2.splitlines() if l.strip().startswith("%copy."))
n_copy1 = sum(1 for l in hlo.splitlines() if l.strip().startswith("%copy."))
print(f"copies in HLO: default={n_copy1} auto={n_copy}")
