"""Test harness config: run on a virtual 8-device CPU mesh (no TPU needed).

The container's sitecustomize (PYTHONPATH=/root/.axon_site) preimports jax
and registers the axon TPU backend before any conftest code runs, so setting
env vars here is too late — instead we re-exec pytest once with a scrubbed
environment (CPU platform, 8 virtual devices, no sitecustomize preimport).

This is the "fake backend" leg of the test pyramid SURVEY.md section 4 calls
for; multi-device sharding tests run on the virtual mesh.
"""

import os
import sys

if os.environ.get("CFEN_TEST_REEXEC") != "1":
    env = dict(os.environ)
    env["CFEN_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ""  # drop the axon sitecustomize jax preimport
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "golden: parity tests against the PyTorch reference "
        "(skipped when /root/reference is unavailable)")
    config.addinivalue_line("markers", "slow: long-running tests")
