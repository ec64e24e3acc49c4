"""Persistent warm-TPU job runner (development tool).

The sandbox's axon relay charges a multi-minute one-time penalty for the
first device<->host transfer in each process, which makes per-process
experimentation impractical. This worker pays the warmup once and then
executes queued python scripts in-process.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_worker.py &
    # submit: write <name>.py into /tmp/tpu_jobs/queue; results appear in
    # /tmp/tpu_jobs/<name>.out (stdout+stderr+traceback), .done marker.

Jobs share one namespace dict `G` that persists across jobs (cache models,
datasets, compiled fns between experiments).
"""

import io
import contextlib
import pathlib
import time
import traceback

QUEUE = pathlib.Path("/tmp/tpu_jobs/queue")
OUT = pathlib.Path("/tmp/tpu_jobs")
QUEUE.mkdir(parents=True, exist_ok=True)


def main():
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.tpu_lock import (
        acquire_or_die)
    _tpu_lock = acquire_or_die("tools/tpu_worker")  # one chip, one process
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    print("warming device + d2h channel...", flush=True)
    np.asarray(jnp.ones((8,)))
    print(f"warm in {time.time() - t0:.1f}s; devices={jax.devices()}",
          flush=True)
    (OUT / "READY").write_text(str(time.time()))

    G = {"np": np, "jax": jax, "jnp": jnp}
    while True:
        jobs = sorted(QUEUE.glob("*.py"))
        if not jobs:
            time.sleep(0.5)
            continue
        job = jobs[0]
        code = job.read_text()
        job.unlink()
        name = job.stem
        buf = io.StringIO()
        t0 = time.time()
        try:
            with contextlib.redirect_stdout(buf), \
                    contextlib.redirect_stderr(buf):
                exec(compile(code, name, "exec"), G)
        except SystemExit:
            break
        except Exception:
            buf.write(traceback.format_exc())
        buf.write(f"\n[job {name} done in {time.time() - t0:.1f}s]\n")
        (OUT / f"{name}.out").write_text(buf.getvalue())
        (OUT / f"{name}.done").write_text("")


if __name__ == "__main__":
    main()
