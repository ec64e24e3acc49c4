"""Single-writer TPU relay lock (utils/tpu_lock.py).

VERDICT r4 missing #1 / next-round #5: round 4's driver bench capture
was corrupted by a stray TPU process; these tests pin the mechanical
guard — contention is refused with a named diagnosis (faked holder, no
real TPU involved: LDM_TPU_LOCK=force on a tmp lock path), reentrancy
within a process works, CPU-pinned processes never engage, and the
/proc stray scan sees a relay-shaped process.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

from conftest import REPO

from latent_diffusion_models_for_shape_sdfs_tpu.utils import tpu_lock


@pytest.fixture
def fresh_lock(tmp_path, monkeypatch):
    """Isolated lock state: a tmp lockfile + a fresh in-process refcount
    (the pytest session itself may hold the REAL lock on TPU runs)."""
    monkeypatch.setenv("LDM_TPU_LOCK", "force")
    monkeypatch.setenv("LDM_TPU_LOCK_PATH", str(tmp_path / "tpu.lock"))
    monkeypatch.setattr(tpu_lock, "_STATE",
                        {"fd": None, "count": 0, "path": None})
    return tmp_path / "tpu.lock"


def test_reentrant_within_process(fresh_lock):
    h1 = tpu_lock.acquire_tpu_lock("outer")
    assert h1.engaged
    h2 = tpu_lock.acquire_tpu_lock("inner")  # same process: no conflict
    assert h2.engaged
    h2.release()
    assert tpu_lock._STATE["fd"] is not None  # outer still holds
    h1.release()
    assert tpu_lock._STATE["fd"] is None
    # lockfile records the holder for the other side's diagnosis
    info = json.loads(fresh_lock.read_text())
    assert info["pid"] == os.getpid()
    assert info["owner"] == "outer"


def test_contention_refused_with_diagnosis(fresh_lock):
    with tpu_lock.acquire_tpu_lock("holder-a"):
        env = dict(os.environ,
                   PYTHONPATH=str(REPO),
                   LDM_TPU_LOCK="force",
                   LDM_TPU_LOCK_PATH=str(fresh_lock))
        p = subprocess.run(
            [sys.executable, "-c",
             "from latent_diffusion_models_for_shape_sdfs_tpu.utils."
             "tpu_lock import acquire_or_die; acquire_or_die('contender')"],
            env=env, capture_output=True, text=True)
        assert p.returncode == 3
        assert "TPU relay is busy" in p.stderr
        assert str(os.getpid()) in p.stderr     # names the holder pid
        assert "holder-a" in p.stderr           # ... and its owner label
    # after release the same contender succeeds
    p = subprocess.run(
        [sys.executable, "-c",
         "from latent_diffusion_models_for_shape_sdfs_tpu.utils."
         "tpu_lock import acquire_or_die; acquire_or_die('contender')"],
        env=env, capture_output=True, text=True)
    assert p.returncode == 0, p.stderr


def test_cpu_pinned_process_never_engages(monkeypatch):
    monkeypatch.setenv("LDM_TPU_LOCK", "auto")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert not tpu_lock._engaged()
    h = tpu_lock.acquire_tpu_lock("cpu-sim")
    assert not h.engaged
    monkeypatch.setenv("LDM_TPU_LOCK", "off")
    monkeypatch.delenv("JAX_PLATFORMS")
    assert not tpu_lock._engaged()


def test_stray_scan_sees_relay_shaped_process(tmp_path):
    # a sleeping python whose argv matches a TPU tool pattern and whose
    # env is NOT pinned to cpu
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    child = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(60)",
         "tools/heldout_gen_eval.py"], env=env)
    try:
        deadline = time.time() + 10
        found = []
        while time.time() < deadline:
            found = [p for p, c in tpu_lock.scan_stray_tpu_processes()
                     if p == child.pid]
            if found:
                break
            time.sleep(0.2)
        assert found, "stray scan missed the relay-shaped child"
    finally:
        child.send_signal(signal.SIGKILL)
        child.wait()
    # a cpu-pinned twin is ignored
    env["JAX_PLATFORMS"] = "cpu"
    child = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(60)",
         "tools/heldout_gen_eval.py"], env=env)
    try:
        time.sleep(0.5)
        assert child.pid not in [p for p, _ in
                                 tpu_lock.scan_stray_tpu_processes()]
    finally:
        child.send_signal(signal.SIGKILL)
        child.wait()
