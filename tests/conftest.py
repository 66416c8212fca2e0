"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests run the standard JAX way without a TPU pod (SURVEY §4e)."""

import os

# Force CPU: the harness environment pre-sets JAX_PLATFORMS to the TPU
# tunnel platform (and a sitecustomize force-registers it before conftest
# runs), so both the env var AND the jax config must be overridden — tests
# run on the virtual 8-device CPU mesh, never on the (serialized,
# single-chip) tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
