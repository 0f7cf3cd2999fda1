"""AUTO entry layouts + free stem_view input form (ops/layouts.py).

The production folded pipeline accepts its input either as the raw
(N,H,W,3) batch or as the free W-s2d view (N,H,W/8,24) from
ops.space_to_depth.stem_view; combined with AUTO argument layouts this
removes every input-side relayout copy from the compiled graph
(scripts/layout_probe.py). Both forms must be BIT-identical — the view
is a pure reshape and the layout is metadata, so any numeric difference
is a wiring bug, not fp noise."""

import numpy as np

import jax
import jax.numpy as jnp

from pidnet_tpu.convert import fold_params
from pidnet_tpu.models import pidnet as M
from pidnet_tpu.ops.layouts import AutoLayoutFn
from pidnet_tpu.ops.space_to_depth import stem_view


def _folded_pipeline(spec):
    return lambda p, v: M.apply(
        p, {}, v, spec, folded=True, compute_dtype=jnp.bfloat16,
        stem_s2d=True, wfold=True,
    )


def test_stem_view_and_auto_layouts_bit_identical():
    spec = M.spec_for("pidnet_s", 19, augment=False)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    folded = fold_params(params, state, spec)
    f = _folded_pipeline(spec)

    raw = np.random.default_rng(0).standard_normal((2, 64, 128, 3))
    x_raw = jnp.asarray(raw, jnp.bfloat16)
    view_np = stem_view(raw)
    assert view_np.base is raw or view_np.base is view_np  # host zero-copy
    x_view = jnp.asarray(view_np, jnp.bfloat16)

    ref = jax.jit(f)(folded, x_raw)
    viewed = jax.jit(f)(folded, x_view)
    assert bool(jnp.all(ref == viewed))

    afn = AutoLayoutFn(f, folded, x_view)
    placed = afn.place(folded, x_view)
    out = afn(*placed)
    assert bool(jnp.all(ref == out))


def test_auto_layout_accepts_shape_dtype_struct():
    """bench.py builds the compiled object from an aval, placing the real
    frame afterwards — the example arg need not be concrete."""
    spec = M.spec_for("pidnet_s", 19, augment=False)
    params, state = M.init(jax.random.PRNGKey(1), spec)
    folded = fold_params(params, state, spec)
    f = _folded_pipeline(spec)

    aval = jax.ShapeDtypeStruct((1, 64, 128 // 8, 24), jnp.bfloat16)
    afn = AutoLayoutFn(f, folded, aval)

    raw = np.random.default_rng(1).standard_normal((1, 64, 128, 3))
    x_view = jnp.asarray(stem_view(raw), jnp.bfloat16)
    pf, px = afn.place(folded, x_view)
    out = afn(pf, px)
    ref = jax.jit(f)(folded, jnp.asarray(raw, jnp.bfloat16))
    assert bool(jnp.all(ref == out))
