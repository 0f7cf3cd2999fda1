"""PyTorch checkpoint -> pidnet_tpu parameter conversion.

Handles both reference checkpoint layouts (reference models/pidnet.py:193-214,
tools/custom.py:59-72):

- ImageNet ``.pth.tar`` files whose payload sits under a ``state_dict`` key,
  with bare module names (``conv1.0.weight``);
- finetuned ``.pt`` files whose keys carry the FullModel ``model.`` prefix
  (stripped via ``k[6:]`` in the reference; we strip the literal prefix).

Like the reference, merging is tolerant: only keys that exist in the target
and match shapes are loaded (strict=False semantics), and the number of
loaded tensors is reported.

Layout transforms: conv weights OIHW -> HWIO; 1-D tensors copy through;
``num_batches_tracked`` is dropped.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    # torch tensor (cpu) — avoid importing torch at module scope
    return v.detach().cpu().numpy()


def normalize_keys(sd: dict) -> dict:
    """Strip the FullModel ``model.`` prefix if present and drop BN counters."""
    out = {}
    for k, v in sd.items():
        if k.startswith("model."):
            k = k[len("model."):]
        if k.endswith("num_batches_tracked"):
            continue
        out[k] = v
    return out


def convert_state_dict(
    sd: dict, params: dict, state: dict
) -> tuple[dict, dict, int]:
    """Merge a torch state_dict into (params, state) templates.

    Returns new (params, state, n_loaded). Keys missing from the templates
    or with mismatched shapes are skipped (reference strict=False merge,
    models/pidnet.py:196,208).
    """
    sd = normalize_keys(sd)
    new_params = dict(params)
    new_state = dict(state)
    n_loaded = 0
    for k, v in sd.items():
        arr = _to_numpy(v).astype(np.float32)
        if arr.ndim == 4:  # conv OIHW -> HWIO
            arr = np.transpose(arr, (2, 3, 1, 0))
        target = new_params if k in new_params else (new_state if k in new_state else None)
        if target is None:
            log.debug("skip (unknown): %s", k)
            continue
        if tuple(target[k].shape) != arr.shape:
            log.debug("skip (shape): %s %s vs %s", k, target[k].shape, arr.shape)
            continue
        target[k] = jnp.asarray(arr)
        n_loaded += 1
    log.info("Loaded %d parameters!", n_loaded)
    return new_params, new_state, n_loaded


def load_torch_checkpoint(
    path: str, params: dict, state: dict
) -> tuple[dict, dict, int]:
    """Load a ``.pt``/``.pth.tar`` file from disk and merge it."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "state_dict" in payload:
        payload = payload["state_dict"]
    return convert_state_dict(payload, params, state)


def export_state_dict(params: dict, state: dict, prefix: str = "model.") -> dict:
    """pidnet_tpu params -> torch-layout numpy state_dict (HWIO -> OIHW),
    for writing checkpoints the reference tooling can consume."""
    out = {}
    for k, v in {**params, **state}.items():
        arr = np.asarray(v, dtype=np.float32)
        if arr.ndim == 4:
            arr = np.transpose(arr, (3, 2, 0, 1))
        out[prefix + k] = arr
    return out
