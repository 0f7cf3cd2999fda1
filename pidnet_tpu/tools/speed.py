"""FPS micro-benchmark CLI — the reference speed protocol on TPU.

Reference models/speed/pidnet_speed.py:236-271 (SwiftNet method): 10
warmup iterations, calibrate the iteration count by doubling until the
timed loop exceeds 1 s, then iterations = int(FPS * 6) and a final timed
loop between device-sync fences. Here warmup doubles as jit compile and
`block_until_ready` replaces cuda.synchronize; the model runs the
automated BN-folded path in bf16 (the equivalent of the reference's
hand-stripped BN speed copies).

    python -m pidnet_tpu.tools.speed --a pidnet-s --c 19 --r 1024 2048
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from pidnet_tpu.convert import fold_params
from pidnet_tpu.models import pidnet as M


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Speed Measurement")
    parser.add_argument("--a", default="pidnet-s", help="pidnet-s, pidnet-m or pidnet-l")
    parser.add_argument("--c", type=int, default=19, help="number of classes")
    parser.add_argument("--r", type=int, nargs=2, default=[1024, 2048], help="H W")
    parser.add_argument("--no-fold", action="store_true", help="keep BN (fp32 path)")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument(
        "--train",
        action="store_true",
        help="benchmark the TRAINING step (bf16, device-resident synthetic "
        "batch, one-chip data mesh) instead of inference; reports ms/step "
        "and img/s. --batch is the per-shard batch (reference recipe: 6)",
    )
    parser.add_argument(
        "--aot",
        metavar="ARTIFACT",
        help="benchmark a serving artifact (tools/convert.py --export-aot) "
        "under the same protocol instead of building a model; --a/--c/--r "
        "are ignored — the artifact's baked-in input shape rules",
    )
    return parser.parse_args(argv)


def measure_train(arch: str, num_classes: int, hw, batch: int) -> tuple[float, float]:
    """(ms/step, img/s) for the bf16 training step on a 1-device mesh —
    the configuration behind the README training table."""
    import time

    import numpy as np

    from pidnet_tpu.losses import FullLoss
    from pidnet_tpu.models import pidnet as M
    from pidnet_tpu.parallel import make_mesh, shard_batch
    from pidnet_tpu.train import TrainState, make_train_step

    h, w = hw
    mesh = make_mesh(1)
    spec = M.spec_for(arch, num_classes, augment=True)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    loss_fn = FullLoss(ignore_label=255, ohem_kept=max(1, 131072 * batch // 6))
    step = make_train_step(spec, loss_fn, mesh, compute_dtype=jnp.bfloat16)
    ts = TrainState.create(params, state)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((batch, h, w, 3)).astype(np.float32)
    lab = rng.integers(0, num_classes, (batch, h, w)).astype(np.int32)
    edge = (rng.random((batch, h, w)) < 0.1).astype(np.float32)
    placed = shard_batch(mesh, img, lab, edge)

    for _ in range(5):  # warmup = compile + cache settle
        ts, metrics = step(ts, *placed, 0.01)
        _ = float(metrics["loss"])  # scalar pull = reliable device sync
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        ts, metrics = step(ts, *placed, 0.01)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n
    return dt * 1000.0, batch / dt


def measure_fps(fn, x, *, warmup: int = 10) -> tuple[float, float]:
    """Returns (latency_ms, fps) using the reference calibration protocol."""
    for _ in range(warmup):
        out = fn(x)
    jax.block_until_ready(out)

    iterations = 100
    elapsed = 0.0
    while elapsed < 1.0:
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iterations):
            out = fn(x)
        jax.block_until_ready(out)
        elapsed = time.time() - t0
        iterations *= 2
    fps = (iterations / 2) / elapsed
    iterations = int(fps * 6)

    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iterations):
        out = fn(x)
    jax.block_until_ready(out)
    elapsed = time.time() - t0
    latency_ms = elapsed / iterations * 1000.0
    return latency_ms, 1000.0 / latency_ms


def main(argv=None):
    args = parse_args(argv)
    h, w = args.r
    if args.aot:
        from pidnet_tpu.convert.aot import load_serving

        loaded = load_serving(args.aot)
        (ishape,) = [tuple(s.shape) for s in loaded.in_avals]
        fn = jax.jit(loaded.call)
        x = jax.device_put(jnp.zeros(ishape, jnp.float32))
        print("=========AOT Artifact Speed Testing=========")
        latency, fps = measure_fps(fn, x)
        n, ah, aw = ishape[0], ishape[1], ishape[2]
        print(
            f"{args.aot} {ah}x{aw} batch={n}: {latency:.3f} ms, "
            f"{fps * n:.1f} FPS (f32 input -> full-res class map)"
        )
        return
    if args.train:
        print("=========Train-Step Speed Testing=========")
        ms, imgs = measure_train(args.a, args.c, (h, w), args.batch)
        print(f"{args.a} {h}x{w} batch={args.batch}: {ms:.2f} ms/step, {imgs:.1f} img/s")
        return  # None: the console-script wrapper calls sys.exit(main())
    spec = M.spec_for(args.a, args.c, augment=False)
    params, state = M.init(jax.random.PRNGKey(0), spec)

    if args.no_fold:
        fn = jax.jit(lambda x: M.apply(params, state, x, spec))
        x = jax.device_put(jnp.zeros((args.batch, h, w, 3), jnp.float32))
    else:
        from pidnet_tpu.ops.layouts import AutoLayoutFn

        folded = fold_params(params, state, spec)
        # mirror engine.make_inference*'s folded pipeline (incl. wfold) but
        # with the free stem_view input form + AUTO entry layouts so the
        # graph holds zero input-relayout copies (ops/layouts.py)
        xv = jnp.zeros((args.batch, h, w // 8, 24), jnp.bfloat16)
        afn = AutoLayoutFn(
            lambda p, v: M.apply(
                p, {}, v, spec, folded=True, compute_dtype=jnp.bfloat16,
                stem_s2d=True, wfold=True, wfold_region="auto",
            ),
            folded,
            xv,
        )
        pf, x = afn.place(folded, xv)
        fn = lambda v: afn(pf, v)

    print("=========Speed Testing=========")
    latency, fps = measure_fps(fn, x)
    print(f"{args.a} {h}x{w} batch={args.batch}: {latency:.3f} ms, {fps * args.batch:.1f} FPS")


if __name__ == "__main__":
    main()
