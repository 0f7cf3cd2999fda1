"""One-shot hardware re-verification: every README-advertised number.

Run on the real chip (JAX_PLATFORMS=axon ambient). Prints one line per
measurement so a partial run still yields usable numbers:

  python scripts/hw_recheck.py            # everything (~10 min incl. compiles)
  python scripts/hw_recheck.py bench      # inference bench + numerics gate only
  python scripts/hw_recheck.py train      # the three train-step recipes only

Sections: `bench` (tools.speed FPS protocol + bf16-vs-fp32 class-map
agreement, = bench.py), `train` (batch-6 @1024x1024, batch-6 @1024x2048,
CamVid batch-12 @720x960 — the three README training numbers), `smoke`
(scripts/tpu_smoke.py full).
"""

import subprocess
import sys

STEPS = {
    "bench": [["python", "bench.py"]],
    "train": [
        ["python", "-m", "pidnet_tpu.tools.speed", "--a", "pidnet-s", "--c", "19",
         "--r", "1024", "1024", "--train", "--batch", "6"],
        ["python", "-m", "pidnet_tpu.tools.speed", "--a", "pidnet-s", "--c", "19",
         "--r", "1024", "2048", "--train", "--batch", "6"],
        ["python", "-m", "pidnet_tpu.tools.speed", "--a", "pidnet-s", "--c", "11",
         "--r", "720", "960", "--train", "--batch", "12"],
    ],
    "smoke": [["python", "scripts/tpu_smoke.py"]],
}


def main(argv):
    which = argv[1:] or list(STEPS)
    failures = 0
    for name in which:
        for cmd in STEPS[name]:
            print(f"== {' '.join(cmd)}", flush=True)
            rc = subprocess.call(cmd)
            if rc != 0:
                print(f"== FAILED rc={rc}", flush=True)
                failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
