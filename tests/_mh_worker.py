"""Worker for tests/test_multihost.py: one rank of a 2-process CPU
`jax.distributed` training run (the DDP analogue the reference leaves
vestigial at tools/train.py:176-178).

Usage: python _mh_worker.py <rank> <port> <barrier_dir> [dp|dpsp]
  dp   — 4-device `data` mesh, shard_map train step (default)
  dpsp — (2 data, 2 spatial) mesh, GSPMD spatial train step: each
         process owns one data row (its 2 devices are that row's H
         shards) and feeds its own sample at full H
Prints `RANK<r> STEP<i> LOSS <value>` lines the parent test parses.
"""

import os
import sys
import time

import jax

# conftest dance: the ambient sitecustomize would otherwise pick the TPU
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

rank = int(sys.argv[1])
port = sys.argv[2]
barrier_dir = sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "dp"
jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=rank)


def barrier(name: str, timeout_s: float = 1100.0) -> None:
    """File barrier between the two ranks. Needed because gloo's TCP pair
    connect (first cross-process collective) times out in ~30 s: if one
    rank finishes XLA compilation minutes before the other (CPU
    contention makes compile times diverge), its collective would give up
    before the peer arrives. Both ranks AOT-compile first, then meet here."""
    mine = os.path.join(barrier_dir, f"{name}.{rank}")
    other = os.path.join(barrier_dir, f"{name}.{1 - rank}")
    with open(mine, "w"):
        pass
    deadline = time.monotonic() + timeout_s
    while not os.path.exists(other):
        if time.monotonic() > deadline:
            raise TimeoutError(f"barrier {name}: rank {1 - rank} never arrived")
        time.sleep(0.2)

import numpy as np  # noqa: E402

from pidnet_tpu.losses import FullLoss  # noqa: E402
from pidnet_tpu.models import pidnet as M  # noqa: E402
from pidnet_tpu.parallel import make_mesh, shard_batch  # noqa: E402
from pidnet_tpu.train import TrainState, make_train_step  # noqa: E402

assert jax.process_count() == 2
assert jax.device_count() == jax.local_device_count() * 2

spec = M.spec_for("pidnet_s", 19, augment=True)
params, state = M.init(jax.random.PRNGKey(0), spec)
loss_fn = FullLoss(ignore_label=255, ohem_kept=500)
ts = TrainState.create(params, state)

# Every rank derives the same GLOBAL batch from the seed, then feeds only
# its contiguous local slice (mesh device order == process order).
rng = np.random.default_rng(0)
img = rng.standard_normal((4, 64, 64, 3)).astype(np.float32)
lab = rng.integers(0, 19, (4, 64, 64)).astype(np.int32)
edge = (rng.random((4, 64, 64)) < 0.1).astype(np.float32)

if mode == "dpsp":
    from pidnet_tpu.parallel.spatial import (  # noqa: E402
        make_mesh_2d, make_spatial_train_step, put_batch,
    )

    # smooth objective: the dpsp equivalence pins the cross-process
    # sharding math; OHEM's discrete keep-set would amplify fp noise into
    # ~1% step-1 drift (the dp mode covers OHEM across processes)
    loss_fn = FullLoss(ignore_label=255, use_ohem=False)
    mesh = make_mesh_2d(2, 2)
    step = make_spatial_train_step(spec, loss_fn, mesh, weight_decay=5e-4)
    lo = slice(rank, rank + 1)  # one data row (= one sample) per process
    batch = put_batch(mesh, img[lo], lab[lo], edge[lo])
else:
    mesh = make_mesh(-1)
    step = make_train_step(spec, loss_fn, mesh, weight_decay=5e-4)
    lo = slice(rank * 2, rank * 2 + 2)
    batch = shard_batch(mesh, img[lo], lab[lo], edge[lo])
compiled = step.lower(ts, *batch, 0.01).compile()
barrier("compiled")

for i in range(2):
    ts, metrics = compiled(ts, *batch, 0.01)
    print(f"RANK{rank} STEP{i} LOSS {float(metrics['loss']):.10f}", flush=True)
