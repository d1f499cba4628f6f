"""Test config: CPU backend with 8 virtual devices (for mesh/sharding tests),
float64 enabled for tight numerical oracles.

Must run before jax initializes the backend, hence the env setup at import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset a TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The image's sitecustomize registers the axon TPU tunnel and programmatically
# sets jax_platforms="axon,cpu" — override back to pure CPU for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


@pytest.fixture()
def key():
    return jax.random.PRNGKey(42)
