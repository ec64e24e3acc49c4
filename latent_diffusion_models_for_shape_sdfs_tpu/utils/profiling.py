"""Tracing / profiling harness (SURVEY.md s5.1).

- ``trace(logdir)``: context manager around `jax.profiler.trace` producing
  xprof/TensorBoard traces of a training or sampling window.
- ``cost_analysis(fn, *args)``: per-program compiler cost estimates
  (FLOPs, bytes accessed) via `.lower().compile().cost_analysis()` —
  recorded into bench_details.json / BASELINE.md next to measured rates.
- ``debug_nans()``: context manager enabling jax's NaN checker (the CI
  "sanitizer" mode for numerics, SURVEY.md s5.2; native code has the
  ASan/UBSan CMake option LDM_SANITIZE).
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn: Callable, *args: Any, **kwargs: Any) -> dict:
    """Compile fn on the current backend and return its cost analysis
    (flops, bytes accessed, transcendentals...). fn must be jittable."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0] if ca else {}
    return dict(ca) if ca else {}


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)
