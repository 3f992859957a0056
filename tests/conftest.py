import os

# Multi-chip sharding is tested on a virtual 8-device CPU mesh (survey §4).
# NOTE: the session pre-imports jax via PYTHONPATH sitecustomize, so env vars
# alone are too late — use jax.config to force the CPU backend.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
