"""Device mesh and shardings for data-parallel training.

TPU-native replacement for the reference's single-process
`nn.DataParallel` (tools/train.py:136): a 1-D `data` mesh axis; the batch
is sharded on dim 0 across ICI, parameters are replicated, and gradients
are reduced with `lax.pmean` inside a `shard_map` — XLA emits the
all-reduces over ICI. Multi-host slices get the same program via
`jax.distributed.initialize()` (nothing else changes).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int = -1) -> Mesh:
    """1-D data mesh over the first `n_devices` devices (-1 = all)."""
    devices = jax.devices()
    if n_devices in (-1, 0, None):
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_devices]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host arrays with dim-0 sharded over the data axis.

    Single-process: `arrays` are the GLOBAL batch. Multi-process (after
    `jax.distributed.initialize()`): each process passes its LOCAL portion
    of the batch (global batch = local x process_count, rank-sharded by
    the Loader) and the global array is assembled across hosts — the DDP
    analogue of the reference's per-GPU scatter (tools/train.py:136).
    """
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        out = tuple(
            jax.make_array_from_process_local_data(s, np.asarray(a))
            for a in arrays
        )
    else:
        out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def shard_microbatches(mesh: Mesh, accum: int, *arrays):
    """Device-put `(A*G, ...)` host batches as `(A, G, ...)` microbatch
    stacks with dim 1 sharded over the data axis — the input layout of
    `train.step.make_train_step(accum_steps=A)`. The host-side reshape is
    free (row-major contiguity), and consecutive `G`-sized chunks become
    microbatches, so sample→virtual-shard assignment matches a physical
    `A×n`-device mesh chunk-for-chunk. Multi-process: each process passes
    its local `(A*G_local, ...)` portion, assembled along dim 1."""
    s = NamedSharding(mesh, P(None, DATA_AXIS))

    def put(a):
        a = np.asarray(a)
        if a.shape[0] % accum != 0:
            raise ValueError(
                f"batch of {a.shape[0]} does not split into {accum} microbatches"
            )
        a = a.reshape(accum, a.shape[0] // accum, *a.shape[1:])
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(s, a)
        return jax.device_put(a, s)

    out = tuple(put(a) for a in arrays)
    return out if len(out) > 1 else out[0]
