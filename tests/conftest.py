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

# Persistent XLA compilation cache: the axon relay charges 20-40 s per
# program compile; with the cache a warmed suite run skips nearly all of
# it (20 min -> minutes). Entries key on platform, so CPU runs coexist.
from latent_diffusion_models_for_shape_sdfs_tpu.utils.compilation_cache import (  # noqa: E402
    enable_compilation_cache)

enable_compilation_cache()


def cpu_sim_env(n_devices: int = 8) -> dict:
    """Environment for a subprocess with an n-device CPU mesh (bypasses the
    axon sitecustomize by clearing PYTHONPATH)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count={n_devices} "
                        + env.get("XLA_FLAGS", "")).strip()
    return env


@pytest.fixture(scope="session", autouse=True)
def _warm_device_channel():
    """Pay the axon relay's one-per-process device<->host channel-init
    penalty (measured 2-13 min, high variance) HERE, so it shows up as
    session setup instead of inflating whichever test alphabetically
    first touches the device. No-op (<1 s) on CPU and on warm relays."""
    import time
    import numpy as np

    # Single-writer discipline for the one-chip relay: the whole pytest
    # session holds the exclusive TPU lock (no-op on CPU-pinned runs;
    # in-process CLI tests re-enter it — the lock is per-process
    # reentrant). A busy chip fails the session NOW with a named holder
    # instead of hanging both processes (CLAUDE.md; VERDICT r4 #1).
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.tpu_lock import (
        acquire_tpu_lock)
    acquire_tpu_lock("pytest-session")  # held until process exit

    import jax
    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jnp.ones(8))
    dt = time.time() - t0
    if dt > 5:
        print(f"\n[conftest] device channel init: {dt:.0f}s "
              f"({jax.devices()[0].device_kind})", flush=True)
    yield


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(0)
