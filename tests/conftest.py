"""Test env: run JAX on a virtual 8-device CPU mesh (no TPU needed)."""

import os

# Must be set before jax is imported anywhere. Force CPU: the ambient env
# may point JAX_PLATFORMS at a real TPU (axon), but unit tests run on a
# virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "models"))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(304)
