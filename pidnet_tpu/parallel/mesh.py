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
