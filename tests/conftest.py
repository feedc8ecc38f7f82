"""Test harness config: run on a virtual 8-device CPU mesh (no TPU needed).

The container's sitecustomize (PYTHONPATH=/root/.axon_site) preimports jax
with JAX_PLATFORMS=axon before conftest runs, but no backend is initialized
yet, so overriding via jax.config here still works — and is capture-safe
(re-exec'ing pytest would lose stdout to its capture fds).

This is the "fake backend" leg of the test pyramid SURVEY.md section 4
calls for; multi-device sharding tests run on the virtual CPU mesh.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "golden: parity tests against the PyTorch reference "
        "(skipped when /root/reference is unavailable)")
    config.addinivalue_line("markers", "slow: long-running tests")
