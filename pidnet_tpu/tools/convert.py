"""Checkpoint conversion CLI — the one-shot workflow glue around
convert/torch_weights.py and convert/fold.py.

The train/eval/custom tools already load torch checkpoints directly
(tools/common.load_weights handles the reference's two layouts,
models/pidnet.py:193-214), so conversion is never REQUIRED — this tool
exists for deployment workflows:

    # torch .pt/.pth.tar -> native .msgpack (faster loads, no torch dep)
    python -m pidnet_tpu.tools.convert --a pidnet-s --c 19 \
        PIDNet_S_Cityscapes_test.pt out/pidnet_s.msgpack

    # fold BatchNorm into conv weights while converting (speed path;
    # the automated equivalent of the reference's BN-free model copies,
    # models/speed/pidnet_speed.py:230-271)
    python -m pidnet_tpu.tools.convert --a pidnet-s --c 19 --fold \
        best.msgpack out/pidnet_s_folded.msgpack

    # native .msgpack -> torch-layout .pt (FullModel `model.` prefix,
    # OIHW conv weights) loadable by the reference's get_seg_model
    python -m pidnet_tpu.tools.convert --a pidnet-s --c 19 --export \
        best.msgpack out/pidnet_s.pt

    # self-contained AOT serving artifact (convert/aot.py): the folded
    # bf16 inference pipeline lowered to StableHLO with weights baked in,
    # runnable without model code via convert.aot.load_serving
    python -m pidnet_tpu.tools.convert --a pidnet-s --c 19 --export-aot \
        --r 1024 2048 best.msgpack out/pidnet_s_serve.jaxexp
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Convert checkpoints")
    parser.add_argument("src", help="input .pt/.pth[.tar]/.msgpack")
    parser.add_argument("dst", help="output path (.msgpack, or .pt with --export)")
    parser.add_argument("--a", default="pidnet-s", help="pidnet-s, pidnet-m or pidnet-l")
    parser.add_argument("--c", type=int, default=19, help="number of classes")
    parser.add_argument(
        "--no-augment",
        action="store_true",
        help="single-output (inference-only) parameter set, no aux heads",
    )
    parser.add_argument(
        "--fold",
        action="store_true",
        help="fold BatchNorm into conv weights (inference-only output)",
    )
    parser.add_argument(
        "--export",
        action="store_true",
        help="write a torch-layout state_dict .pt instead of .msgpack",
    )
    parser.add_argument(
        "--force",
        action="store_true",
        help="proceed even when the src checkpoint matches almost none of "
        "the model's tensors (default: abort — a mismatched --a/--c would "
        "silently write a mostly-random-init model)",
    )
    parser.add_argument(
        "--export-aot",
        action="store_true",
        help="write a self-contained jax.export serving artifact (folded "
        "bf16 pipeline + weights baked in, lowered for --platforms); "
        "requires --r; run it with pidnet_tpu.convert.aot.load_serving",
    )
    parser.add_argument(
        "--r", type=int, nargs=2, metavar=("H", "W"),
        help="static input resolution for --export-aot",
    )
    parser.add_argument(
        "--batch", type=int, default=1, help="static batch for --export-aot"
    )
    parser.add_argument(
        "--platforms", nargs="+", default=["tpu", "cpu"],
        help="lowering platforms for --export-aot",
    )
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax

    from pidnet_tpu.models import pidnet as M
    from pidnet_tpu.tools import common
    from pidnet_tpu.train import checkpoint as ckpt

    if args.export_aot and not args.r:
        raise SystemExit("--export-aot needs a static input size: --r H W")
    # the serving artifact lowers the single-head inference graph
    augment = not args.no_augment and not args.export_aot
    spec = M.spec_for(args.a, args.c, augment=augment)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    n_model = len(params) + len(state)
    params, state, n_loaded = common.load_weights(args.src, params, state)
    print(f"loaded {n_loaded} tensors from {args.src}")
    if n_loaded < n_model // 2 and not args.force:
        raise SystemExit(
            f"src matched only {n_loaded}/{n_model} of the model's tensors — "
            f"does {args.src} really hold a {args.a}/--c {args.c} model? "
            "(--force to write anyway)"
        )

    os.makedirs(os.path.dirname(args.dst) or ".", exist_ok=True)
    if args.export_aot:
        from pidnet_tpu.convert.aot import export_serving

        blob = export_serving(
            params, state, spec, tuple(args.r),
            batch=args.batch, platforms=tuple(args.platforms),
        )
        with open(args.dst, "wb") as f:
            f.write(blob)
        print(
            f"wrote AOT serving artifact ({len(blob)/2**20:.1f} MiB, "
            f"platforms={args.platforms}, input "
            f"{args.batch}x{args.r[0]}x{args.r[1]}x3) to {args.dst}"
        )
        return
    if args.export:
        if args.fold:
            raise SystemExit("--export writes unfolded torch layout; drop --fold")
        import torch

        from pidnet_tpu.convert import export_state_dict

        sd = {k: torch.from_numpy(v) for k, v in export_state_dict(params, state).items()}
        torch.save(sd, args.dst)
        print(f"wrote torch state_dict ({len(sd)} tensors) to {args.dst}")
        return

    if args.fold:
        from pidnet_tpu.convert import fold_params

        # tagged payload: loaders route folded params straight to the
        # folded apply path and refuse to merge them into unfolded inits
        # (common.is_folded_checkpoint / load_folded)
        ckpt.save(args.dst, {"params": fold_params(params, state, spec),
                             "state": {}, "folded": True})
        print(f"wrote folded model to {args.dst}")
        return
    ckpt.save_model(args.dst, params, state)
    print(f"wrote model ({len(params)} params) to {args.dst}")


if __name__ == "__main__":
    main()
