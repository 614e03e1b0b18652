"""Test configuration: force an 8-device virtual CPU platform so sharding /
mesh tests run without TPU hardware, and keep numerics in f32 for parity
checks.

Must set XLA_FLAGS before jax initializes — hence top of conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force off TPU even if env preset (axon)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Something in this environment pins jax_platforms to "axon,cpu" regardless of
# the env var; force CPU explicitly so tests never touch the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1701)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
