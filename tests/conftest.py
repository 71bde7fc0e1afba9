"""Test configuration: force CPU with a virtual 8-device mesh.

Must set env vars before jax is imported anywhere (the JAX analogue of a
fake multi-node backend; SURVEY.md section 4d).
"""

import os

# Env-var overrides alone do not beat an out-of-tree TPU platform plugin;
# jax.config.update("jax_platforms", ...) before first backend use does.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
    config.addinivalue_line(
        "markers", "tpu: exercises compiled Pallas kernels on a real "
        "TPU chip (skipped on CPU)")
