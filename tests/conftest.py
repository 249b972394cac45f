"""Test harness config: run on a virtual 8-device CPU mesh with x64 enabled.

Tests validate numerics against the reference's float64 scipy behavior, so
they run on CPU with x64; TPU execution is covered by bench.py and the
driver's compile checks.  The 8 virtual devices exercise the multi-chip
sharding path without TPU hardware.
"""
import os

# The harness environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests
# must run locally on CPU — overwrite the env var AND the config (the axon
# plugin injects itself into jax_platforms regardless of the env default).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.default_backend() == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN


def load_golden(name):
    return np.load(os.path.join(GOLDEN, name))
