"""Trace-time switch disabling the Pallas kernels.

`pl.pallas_call` is an opaque custom call the XLA SPMD partitioner cannot
shard, so programs jitted over a multi-axis mesh with sharded operands
(parallel/spatial.py) must trace the XLA formulations of the fused ops
(ops/ce_front.py, ops/upsample_argmax.py) instead. The flag is consulted
by those ops' dispatchers while the enclosing function body is being
TRACED, so wrapping the traced region in `no_pallas()` is sufficient —
no argument threading through the model/loss call chain.
"""

from __future__ import annotations

import contextlib
import threading

_state = threading.local()


def pallas_enabled() -> bool:
    return not getattr(_state, "disabled", False)


@contextlib.contextmanager
def no_pallas():
    """Disable Pallas kernel dispatch for ops traced inside this block."""
    prev = getattr(_state, "disabled", False)
    _state.disabled = True
    try:
        yield
    finally:
        _state.disabled = prev
