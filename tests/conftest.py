"""Test harness: run on a virtual 8-device CPU mesh.

Multi-device sharding tests follow SURVEY.md §4's implication: the reference
needed no distributed tests; we exercise ours on CPU via
``xla_force_host_platform_device_count`` exactly as the driver's multichip
dry-run does.
"""

import os

# Force CPU: the session may point JAX_PLATFORMS at a real TPU, but the test
# suite targets the virtual 8-device CPU mesh (TPU runs happen via bench.py /
# the driver's dry-run).  The container's sitecustomize pre-imports jax with
# JAX_PLATFORMS=axon, so the env var alone is read too late — update the live
# jax config as well (safe: no backend has been initialized yet when pytest
# collects this conftest).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices()))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
