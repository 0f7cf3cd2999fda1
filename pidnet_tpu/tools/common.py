"""Shared CLI plumbing: model/spec construction and weight loading."""

from __future__ import annotations

import logging
import os

import jax

from pidnet_tpu.models import pidnet as M

log = logging.getLogger("pidnet_tpu")


def build_spec(cfg, augment: bool = True):
    """Model selection by MODEL.NAME. `ddrnet*` / `bisenet*` names build
    the reference's paper ablations (models/ddrnet.py, models/bisenet.py);
    everything else follows the reference's pidnet substring rule
    (models/pidnet.py:186-191)."""
    if "ddrnet" in cfg.MODEL.NAME:
        from pidnet_tpu.models import ddrnet

        return ddrnet.spec_for(cfg.MODEL.NAME, cfg.DATASET.NUM_CLASSES, augment)
    if "bisenet" in cfg.MODEL.NAME:
        from pidnet_tpu.models import bisenet

        return bisenet.spec_for(cfg.MODEL.NAME, cfg.DATASET.NUM_CLASSES, augment)
    return M.spec_for(cfg.MODEL.NAME, cfg.DATASET.NUM_CLASSES, augment)


def init_model(cfg, spec, seed: int = 0):
    return M.init(jax.random.PRNGKey(seed), spec)


def load_weights(path: str, params: dict, state: dict):
    """Load model weights from any supported container:

    - ``.msgpack``            — native checkpoints (model or full training);
    - ``.pt`` / ``.pth[.tar]`` — torch checkpoints via the converter
      (both reference layouts, models/pidnet.py:193-214).

    Returns (params, state, n_loaded).
    """
    if path.endswith(".msgpack"):
        from pidnet_tpu.train import checkpoint as ckpt

        payload = ckpt.load(path)
        new_params = dict(params)
        new_state = dict(state)
        n = 0
        for k, v in payload.get("params", {}).items():
            if k in new_params and tuple(new_params[k].shape) == tuple(v.shape):
                new_params[k] = v
                n += 1
        for k, v in payload.get("state", {}).items():
            if k in new_state and tuple(new_state[k].shape) == tuple(v.shape):
                new_state[k] = v
                n += 1
        log.info("Loaded %d parameters!", n)
        return new_params, new_state, n
    from pidnet_tpu.convert import load_torch_checkpoint

    return load_torch_checkpoint(path, params, state)


def maybe_load_pretrained(cfg, params: dict, state: dict):
    """Reference behavior (tools/train.py:79-80, models/pidnet.py:184-216):
    load MODEL.PRETRAINED if the file exists; tolerant merge either way."""
    path = cfg.MODEL.PRETRAINED
    if path and os.path.isfile(path):
        return load_weights(path, params, state)[:2]
    if path:
        log.warning("pretrained file %s not found; training from scratch", path)
    return params, state
