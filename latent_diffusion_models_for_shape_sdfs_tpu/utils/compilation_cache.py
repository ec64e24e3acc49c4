"""Persistent XLA compilation cache (opt-in, one call).

The axon-relayed v5e pays 20-40 s per program compile; a second process
compiling the identical program pays it again. JAX's persistent cache
serializes compiled executables to disk keyed by (program, platform,
flags) — measured here: a 3-level hierarchical-decode program drops from
22.0 s to 0.9 s in a fresh process. The test suite, CLI, and tools all
call `enable_compilation_cache()` so only the first-ever compile of each
program on a machine is slow. Cache entries are per-platform, so CPU and
TPU runs coexist in one directory.

Env override: LDM_JAX_CACHE_DIR (set to "0" / "off" to disable).
"""

from __future__ import annotations

import os
import pathlib

_DEFAULT = "~/.cache/ldm-sdf-tpu/jax"
_enabled = False


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 1.0) -> str | None:
    """Idempotently point JAX's persistent compilation cache at `path`.

    Returns the cache dir, or None when disabled via env. Safe to call
    before or after other jax imports; must run before the first jit
    compilation to catch everything (later calls still cache the rest).
    """
    global _enabled
    env = os.environ.get("LDM_JAX_CACHE_DIR")
    if env is not None and env.lower() in ("0", "off", "none", ""):
        return None
    cache_dir = str(pathlib.Path(env or path or _DEFAULT).expanduser())
    if _enabled:
        return cache_dir
    import jax

    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    _enabled = True
    return cache_dir
