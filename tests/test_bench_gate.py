"""bench.py regression gate: trips on synthetic regressions vs the
previous round's recorded number (VERDICT r4 weak #4 — the static 0.995
agreement floor let a 496->407 FPS / 0.9992->0.99746 drift through)."""

import importlib.util
import os

import pytest

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench_mod", BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


PREV = {
    "value": 496.0,
    "argmax_agreement": 0.9992,
    "confident_agreement": 1.0,
    "pipeline_agreement": 0.999995,
    "weights": "trained-train2k",
}


def test_gate_passes_at_parity(bench):
    cur = dict(PREV, value=500.0)
    assert bench.gate_failures(cur, PREV) == []


def test_gate_trips_on_fps_regression(bench):
    cur = dict(PREV, value=407.0)
    fails = bench.gate_failures(cur, PREV)
    assert any("fps regression" in f for f in fails)


def test_gate_trips_on_agreement_drift(bench):
    cur = dict(PREV, value=500.0, argmax_agreement=0.9975)
    fails = bench.gate_failures(cur, PREV)
    assert any("agreement regression" in f for f in fails)


def test_gate_trips_on_confident_agreement_drift(bench):
    # the accuracy metric of record: bf16 flipping fp32-confident pixels
    cur = dict(PREV, confident_agreement=0.999)
    fails = bench.gate_failures(cur, PREV)
    assert any("confident_agreement regression" in f for f in fails)


def test_gate_trips_on_pipeline_drift(bench):
    cur = dict(PREV, value=500.0, pipeline_agreement=0.9975)
    fails = bench.gate_failures(cur, PREV)
    assert any("pipeline agreement regression" in f for f in fails)


def test_agreement_not_compared_across_weight_schemes(bench):
    # raw-init agreement is draw-luck (round-4's 0.99746 record): when the
    # weights scheme changes, only the pipeline gate carries over
    cur = dict(PREV, value=500.0, argmax_agreement=0.92, weights="calibrated-init")
    assert bench.gate_failures(cur, PREV) == []


def test_device_fps_rescues_contended_wall_clock(bench):
    # round-4 scenario: same program, host contention collapses wall FPS
    # (114) while the device-busy number proves the program is healthy
    cur = dict(PREV, value=114.0, device_fps=510.0)
    assert bench.gate_failures(cur, PREV) == []


def test_gate_reads_previous_round_record(bench, tmp_path):
    import json

    (tmp_path / "BENCH_r03.json").write_text(
        json.dumps({"n": 3, "parsed": {"value": 481.68, "argmax_agreement": 0.999231}})
    )
    (tmp_path / "BENCH_r04.json").write_text(
        json.dumps({"n": 4, "parsed": {"value": 114.02, "argmax_agreement": 0.997459}})
    )
    rec = bench.previous_record(str(tmp_path))
    assert rec["value"] == 114.02  # newest round wins


def test_no_previous_record_is_permissive(bench):
    assert bench.gate_failures({"value": 1.0, "argmax_agreement": 0.0}, None) == []


def test_committed_weights_artifact_matches_model_spec(bench):
    """The train2k weights bench gates numerics on must load and cover
    every parameter/state the PIDNet-S trace expects (a drifted artifact
    would silently fall back or crash bench on the chip)."""
    import numpy as np
    import jax

    from pidnet_tpu.models import pidnet as M

    spec = M.spec_for("pidnet_s", 19, augment=False)
    params, state, tag = bench._load_weights(spec)
    if tag != "trained-train2k":
        import pytest

        pytest.skip("runs/train2k artifact not recorded yet")
    want_p, want_s = M.init(jax.random.PRNGKey(0), M.spec_for("pidnet_s", 19, augment=True))
    assert set(params) == set(want_p)
    assert set(state) == set(want_s)
    for k, v in params.items():
        assert v.shape == want_p[k].shape, k
        assert np.isfinite(np.asarray(v)).all(), k
