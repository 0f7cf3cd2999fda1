"""Shared CLI plumbing: model/spec construction and weight loading."""

from __future__ import annotations

import functools
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


def _read_msgpack(path: str) -> dict:
    """One deserialization per file: the CLIs probe a checkpoint with
    `is_folded_checkpoint` and then immediately load it, so cache the
    parsed payload keyed by (path, mtime, size)."""
    st = os.stat(path)
    return _read_msgpack_cached(path, st.st_mtime_ns, st.st_size)


@functools.lru_cache(maxsize=1)  # dedup probe+load only; don't pin old payloads
def _read_msgpack_cached(path: str, _mtime_ns: int, _size: int) -> dict:
    from pidnet_tpu.train import checkpoint as ckpt

    return ckpt.load(path)


def is_folded_checkpoint(path: str) -> bool:
    """True when `path` is a BN-folded (inference-only) .msgpack written
    by `tools.convert --fold`. Folded payloads keep the conv weight key
    names of unfolded checkpoints, so merging one into an unfolded init
    would silently produce wrong outputs (BN re-applied on top of folded
    weights) — every loader must route on this flag."""
    if not path.endswith(".msgpack"):
        return False
    return bool(_read_msgpack(path).get("folded", False))


def load_folded(path: str, spec, ref_params: dict, ref_state: dict) -> dict:
    """Load a folded .msgpack as the folded parameter set itself (consumed
    by `models.pidnet.apply(..., folded=True)`), validated against the
    key set `convert.fold_params` would produce for this spec."""
    from pidnet_tpu.convert import fold_params

    payload = _read_msgpack(path)
    if not payload.get("folded", False):
        raise ValueError(f"{path} is not a folded checkpoint")
    got = payload["params"]
    want_keys = set(fold_params(ref_params, ref_state, spec))
    missing = want_keys - set(got)
    if missing:
        raise SystemExit(
            f"folded checkpoint {path} is missing {len(missing)} tensors for "
            f"this architecture (e.g. {sorted(missing)[:3]}); was it converted "
            "with the same --a/--c?"
        )
    log.info("Loaded %d folded parameters!", len(want_keys))
    return {k: got[k] for k in want_keys}


def load_weights(path: str, params: dict, state: dict):
    """Load model weights from any supported container:

    - ``.msgpack``            — native checkpoints (model or full training);
    - ``.pt`` / ``.pth[.tar]`` — torch checkpoints via the converter
      (both reference layouts, models/pidnet.py:193-214).

    Returns (params, state, n_loaded). Rejects BN-folded payloads — they
    cannot populate an unfolded model (see `is_folded_checkpoint`); use
    `load_folded` + the folded apply path for those.
    """
    if path.endswith(".msgpack"):
        payload = _read_msgpack(path)
        if payload.get("folded", False):
            raise SystemExit(
                f"{path} is a BN-folded inference-only checkpoint: it cannot "
                "be loaded into an unfolded model (conv weights share names "
                "but have BN baked in). Use eval --fold-bn / custom --bf16, "
                "which load it onto the folded apply path directly."
            )
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
