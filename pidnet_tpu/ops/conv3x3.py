"""Hand-written Pallas/Mosaic 3x3 stride-1 SAME convolution for TPU.

Purpose (docs/DESIGN.md round-4): the training-step conv core measures
~6-10% model-FLOPs MFU in-graph while each conv is near its standalone
envelope — round 3 attributed the gap to Mosaic's conv lowering plus the
layout copies XLA schedules around it, an argument this kernel turns
into evidence. It is a direct competitor to
`lax.conv_general_dilated` for PIDNet's hot shapes (NHWC, 3x3, stride
1, SAME, C a multiple of 128 after W-folding) with the elementwise
epilogues the model wants fused:

  y = conv3x3(x, w) [+ bias] [+ residual] [relu]     (+ per-channel
  BN statistics sum/sumsq of y, accumulated across the grid for free)

Design: the conv is decomposed into 9 shifted (TH*W, Cin) x (Cin, Cout)
MXU matmuls accumulated in an f32 VMEM scratch — no im2col
materialization, no Mosaic conv lowering. The input stays in HBM
(`memory_space=ANY`); each (image, row-tile) grid step DMAs its
TH+2-row halo block into a VMEM scratch, so overlapping reads need no
XLA-side padding or copies. W is pre-padded to W+2 columns by the
caller-facing wrapper (one cheap XLA pad; SAME width semantics), and
the halo rows of the first/last tile read from a zero row appended by
the same pad.

Used by the inference/serving path and benchmarked against the XLA
lowering by scripts/conv_ab.py; the training step keeps the XLA conv
(the A/B showed the fused-epilogue win does not survive the backward
pass — see docs/DESIGN.md round-4 notes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_hbm, w_ref, b_ref, y_ref, stats_ref, xbuf, sem,
    *, th: int, wdim: int, cin: int, cout: int,
    relu: bool, stats: bool, bias: bool,
):
    """One (image, row-tile) grid step.

    x_hbm:  (N, H+2, W+2, Cin) bf16 in HBM/ANY (pre-padded)
    w_ref:  (9, Cin, Cout) bf16 VMEM — taps flattened [dy*3+dx]
    b_ref:  (1, Cout) f32 VMEM (zeros when bias is False)
    y_ref:  (th, W, Cout) block of (N*H/th rows...) output
    stats_ref: (2, Cout) f32 — [sum, sumsq] accumulated over ALL steps
    xbuf:   (th+2, W+2, Cin) bf16 VMEM scratch
    """
    n = pl.program_id(0)
    t = pl.program_id(1)

    # halo DMA: rows [t*th, t*th + th+2) of the padded image
    cp = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(t * th, th + 2)], xbuf, sem
    )
    cp.start()

    @pl.when(jnp.logical_and(n == 0, t == 0))
    def _():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    cp.wait()

    # 9 shifted matmuls: taps at (dy, dx) contribute
    # x[t*th + r + dy, c + dx, :] @ w[dy*3+dx] to y[r, c]
    def tap(i, a):
        dy, dx = i // 3, i % 3
        patch = xbuf[pl.ds(dy, th), pl.ds(dx, wdim), :]
        return a + jax.lax.dot_general(
            patch.reshape(th * wdim, cin),
            w_ref[i],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # unrolled python loop: static tap slices compile to 9 pipelined MXU
    # calls (a fori_loop would make the slice starts dynamic)
    a = jnp.zeros((th * wdim, cout), jnp.float32)
    for i in range(9):
        a = tap(i, a)

    if bias:
        a = a + b_ref[0]
    if relu:
        a = jnp.maximum(a, 0.0)
    y_ref[...] = a.reshape(1, th, wdim, cout).astype(y_ref.dtype)

    if stats:
        s = jnp.sum(a, axis=0)
        s2 = jnp.sum(a * a, axis=0)
        stats_ref[0, :] += s
        stats_ref[1, :] += s2


@functools.partial(
    jax.jit,
    static_argnames=("relu", "stats", "tile_h", "out_dtype"),
)
def conv3x3(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    relu: bool = False,
    stats: bool = False,
    tile_h: int = 16,
    out_dtype=jnp.bfloat16,
):
    """Fused 3x3/s1/SAME conv [+bias] [+ReLU] [+BN statistics].

    x (N,H,W,Cin) bf16, w (3,3,Cin,Cout) — Cin/Cout multiples of 128,
    H a multiple of `tile_h`. Returns y (N,H,W,Cout) in `out_dtype`;
    with stats=True also (2,Cout) f32 [sum(y), sum(y^2)] over N,H,W
    (computed on the POST-epilogue activation in f32).
    """
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    assert h % tile_h == 0, (h, tile_h)
    # Mosaic DMAs slice whole tiles: the copied extent along the sublane
    # (width) dim must be a multiple of 8, so pad W+2 up to it — the tap
    # slices only ever read columns [dx, dx+W) with dx<=2, so the extra
    # zero columns are never consumed.
    wp = -(wd + 2) // 8 * -8
    xp = jnp.pad(
        x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, wp - wd - 1), (0, 0))
    )
    wf = w.astype(jnp.bfloat16).reshape(9, cin, cout)
    bf = (
        jnp.zeros((1, cout), jnp.float32)
        if b is None
        else b.astype(jnp.float32).reshape(1, cout)
    )

    grid = (n, h // tile_h)
    kernel = functools.partial(
        _kernel,
        th=tile_h, wdim=wd, cin=cin, cout=cout,
        relu=relu, stats=stats, bias=b is not None,
    )
    out_shapes = (
        jax.ShapeDtypeStruct((n, h, wd, cout), out_dtype),
        jax.ShapeDtypeStruct((2, cout), jnp.float32),
    )
    flops = 2 * n * h * wd * 9 * cin * cout
    y, st = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
            pl.BlockSpec((9, cin, cout), lambda n_, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda n_, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, tile_h, wd, cout), lambda n_, t: (n_, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2, cout), lambda n_, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, wp, cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * 2 + y_bytes(n, h, wd, cout, out_dtype),
            transcendentals=0,
        ),
    )(xp, wf, bf)
    return (y, st) if stats else y


def y_bytes(n, h, wd, cout, dtype):
    return n * h * wd * cout * jnp.dtype(dtype).itemsize
