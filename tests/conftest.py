"""Test env: run JAX on a virtual 8-device CPU mesh (no TPU needed)."""

import os

# Unit tests run on a virtual 8-device CPU mesh, never the real TPU.
# The ambient axon sitecustomize registers the TPU backend at interpreter
# start and overrides JAX_PLATFORMS, so the env var alone is NOT enough:
# jax.config.update must run before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"

# Quick pre-commit tier (`pytest -m quick`): the core-correctness modules
# that together finish in <5 minutes on this host (measured 2026-08-20:
# ~3.7 min; test_cli's 6-minute subprocess end-to-end is full-suite only). Policy (README dev
# loop): HEAD is never committed/snapshotted with this tier red; the full
# suite (~45 min) runs before end-of-round. Module-level marking keeps
# the tier's membership in one place.
QUICK_MODULES = {
    "test_bench_gate",
    "test_blocks",
    "test_config",
    "test_data",
    "test_functional",
    "test_goldens",
    "test_layouts",
    "test_losses",
    "test_resize",
    "test_resize_wfold",
    "test_wfold",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in QUICK_MODULES:
            item.add_marker(pytest.mark.quick)


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "models"))


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same stream regardless of
    # which other tests ran before it
    return np.random.default_rng(304)
