#!/usr/bin/env bash
# Reproduce the reference's published Cityscapes val mIoU with this
# framework (reference README.md:62-71: PIDNet-S 78.8 / M 79.9 / L 80.9).
#
# Needs (neither ships with the repo):
#   data/cityscapes/...            the Cityscapes dataset (leftImg8bit + gtFine),
#                                  laid out as data/list/cityscapes/val.lst expects
#   a released checkpoint          e.g. PIDNet_S_Cityscapes_val.pt from the
#                                  reference's download table
#
# Usage:
#   scripts/reproduce_miou.sh PIDNet_S_Cityscapes_val.pt [pidnet-s] [expected-miou]
#
# Runs convert -> eval (fp32 parity path, single scale — the protocol the
# published numbers use) and compares MeanIU against the expected value
# (default 78.8, the PIDNet-S target; within 0.1 passes). Expected runtime:
# ~3 min for 500 val images on one v5e chip (mesh-parallel over all chips),
# plus one-time model compile.
set -euo pipefail
cd "$(dirname "$0")/.."

CKPT="${1:?usage: reproduce_miou.sh checkpoint.pt [arch] [expected]}"
ARCH="${2:-pidnet-s}"
EXPECTED="${3:-78.8}"
case "$ARCH" in
  pidnet-s) CFG=configs/cityscapes/pidnet_small_cityscapes.yaml ;;
  pidnet-m) CFG=configs/cityscapes/pidnet_medium_cityscapes.yaml ;;
  pidnet-l) CFG=configs/cityscapes/pidnet_large_cityscapes.yaml ;;
  *) echo "unknown arch $ARCH" >&2; exit 2 ;;
esac

[ -d data/cityscapes ] || {
  echo "data/cityscapes not found — place the Cityscapes dataset there" >&2
  exit 2
}

NATIVE="$(mktemp -d)/converted.msgpack"
echo "=> converting $CKPT -> $NATIVE"
python tools/convert.py --a "$ARCH" --c 19 "$CKPT" "$NATIVE"

echo "=> evaluating (single-scale fp32 parity protocol)"
LOG="$(mktemp)"
python tools/eval.py --cfg "$CFG" TEST.MODEL_FILE "$NATIVE" | tee "$LOG"

MIOU="$(grep -oE 'MeanIU: [0-9.]+' "$LOG" | tail -1 | awk '{print $2}')"
[ -n "$MIOU" ] || { echo "no MeanIU in eval output" >&2; exit 1; }
python - "$MIOU" "$EXPECTED" <<'EOF'
import sys
got, want = float(sys.argv[1]) * 100, float(sys.argv[2])
delta = got - want
print(f"mIoU {got:.2f} vs published {want:.2f} ({delta:+.2f})")
sys.exit(0 if abs(delta) <= 0.1 else 1)
EOF
