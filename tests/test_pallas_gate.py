"""ops.pallas_gate: the no_pallas() trace-time switch must reroute the
fused ops to their XLA formulations (the SPMD partitioner cannot shard
pl.pallas_call custom calls — parallel/spatial.py relies on this)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pidnet_tpu.ops import ce_front, upsample_argmax as ua
from pidnet_tpu.ops.pallas_gate import no_pallas, pallas_enabled


def test_gate_nesting():
    assert pallas_enabled()
    with no_pallas():
        assert not pallas_enabled()
        with no_pallas():
            assert not pallas_enabled()
        assert not pallas_enabled()
    assert pallas_enabled()


def test_ce_maps_gate(rng, monkeypatch):
    """interpret=True normally forces the Pallas front even on CPU; under
    no_pallas() the XLA path must be traced instead (proved by making the
    Pallas entry explode) and produce the same maps."""
    # shapes must satisfy ce_front._tileable (W multiples of 128) so the
    # Pallas path is genuinely eligible and only the gate decides
    logits = jnp.asarray(
        rng.standard_normal((1, 16, 128, 19)).astype(np.float32), jnp.bfloat16
    )
    labels = jnp.asarray(rng.integers(0, 19, (1, 128, 128)).astype(np.int32))

    want = ce_front.ce_maps(logits, labels, None, 255, (128, 128), True)

    def boom(*a, **k):
        raise AssertionError("Pallas path dispatched under no_pallas()")

    monkeypatch.setattr(ce_front, "_ce_front_pallas", boom)
    with no_pallas():
        got = ce_front.ce_maps(
            logits, labels, None, 255, (128, 128), True, interpret=True
        )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-2, atol=2e-2)
    # without the gate the same call must hit the (sabotaged) Pallas entry
    with pytest.raises(AssertionError, match="dispatched"):
        ce_front.ce_maps(
            logits, labels, None, 255, (128, 128), True, interpret=True
        )


def test_upsample_argmax_gate(rng, monkeypatch):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 7)).astype(np.float32))

    want = ua._xla_upsample_argmax(x, (64, 64), True)

    monkeypatch.setattr(ua.pl, "pallas_call", lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("Pallas path dispatched under no_pallas()")))
    with no_pallas():
        got = ua.upsample_argmax(x, (64, 64), True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
