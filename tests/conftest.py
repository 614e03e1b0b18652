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


# Global jax config values every test relies on implicitly. A test (or a
# module it imports) flipping one of these changes OTHER tests' numerics —
# e.g. jax_default_prng_impl changes every PRNGKey stream, which once made a
# later solver-trajectory test fail only in full-suite order. Fail the
# polluting test loudly instead of the innocent downstream one.
_GUARDED_CONFIG = ("jax_default_prng_impl", "jax_default_matmul_precision",
                   "jax_enable_x64", "jax_platforms", "jax_numpy_dtype_promotion")


@pytest.fixture(autouse=True)
def _jax_config_guard():
    before = {k: getattr(jax.config, k) for k in _GUARDED_CONFIG}
    yield
    after = {k: getattr(jax.config, k) for k in _GUARDED_CONFIG}
    changed = {k: (before[k], after[k]) for k in _GUARDED_CONFIG
               if before[k] != after[k]}
    assert not changed, (
        f"test left global jax config mutated: {changed} — scope the change "
        "(typed-key impl, context manager, or restore in teardown)")


@pytest.fixture
def rng():
    return np.random.RandomState(1701)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
