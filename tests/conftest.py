"""Test configuration.

The default backend here is whatever the environment provides (a single
TPU v5e chip via the experimental `axon` platform, or CPU elsewhere). The
axon sitecustomize pins the platform at interpreter startup, so multi-device
CPU-mesh tests run in a *subprocess* with a cleaned environment — see
tests/test_dp_cpu.py. Everything else runs in-process on the default
backend.
"""

import os
import sys
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")


def cpu_sim_env(n_devices: int = 8) -> dict:
    """Environment for a subprocess with an n-device CPU mesh (bypasses the
    axon sitecustomize by clearing PYTHONPATH)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count={n_devices} "
                        + env.get("XLA_FLAGS", "")).strip()
    return env


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(0)
