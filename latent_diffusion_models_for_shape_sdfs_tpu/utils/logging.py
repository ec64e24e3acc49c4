"""JSONL metric logging + throughput timing harness.

The lineage logs loss arrays into a .pth blob; here every run writes a JSONL
event stream (step, losses, LRs, grad norms, throughput) that is trivially
greppable and feeds BASELINE.md numbers. Timing uses explicit
`block_until_ready()` fences so reported rates are real device rates
(SURVEY.md section 5.1); the three north-star metrics (evals/sec/chip,
DDIM-50 samples/sec, train steps/sec) all flow through `Timer`.
"""

from __future__ import annotations

import json
import pathlib
import time
from typing import Any, Optional

import jax


class MetricLogger:
    """Append-only JSONL event log; stdout echo optional.

    `tensorboard`: optional event-file directory — numeric fields of
    every record that carries a `step` or `epoch` are mirrored as
    `<event>/<field>` scalars (SURVEY.md section 5.5's "optional
    TensorBoard scalars"). TensorFlow is imported lazily only when the
    directory is given; JSONL stays the source of truth either way.
    """

    def __init__(self, path: Optional[str | pathlib.Path] = None,
                 echo: bool = False,
                 tensorboard: Optional[str | pathlib.Path] = None):
        self.path = pathlib.Path(path) if path else None
        self.echo = echo
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._f = self.path.open("a")
        else:
            self._f = None
        self._tb = None
        self._tf = None
        if tensorboard is not None:
            import tensorflow as tf  # heavy: only on request
            self._tf = tf
            self._tb = tf.summary.create_file_writer(str(tensorboard))

    def log(self, event: str, **fields: Any) -> None:
        rec = {"event": event, "time": time.time(), **fields}
        line = json.dumps(rec, default=float)
        if self._f:
            self._f.write(line + "\n")
            self._f.flush()
        if self.echo:
            print(line)
        if self._tb is not None:
            step = fields.get("step", fields.get("epoch"))
            if step is not None:
                with self._tb.as_default():
                    for k, v in fields.items():
                        if k in ("step", "epoch"):
                            continue
                        try:
                            self._tf.summary.scalar(f"{event}/{k}",
                                                    float(v),
                                                    step=int(step))
                        except (TypeError, ValueError):
                            pass  # non-scalar field (str, array, ...)

    def close(self) -> None:
        if self._f:
            self._f.close()
        if self._tb is not None:
            self._tb.close()


class Timer:
    """Wall-clock timer with a device fence on stop."""

    def __init__(self):
        self._t0 = None
        self.elapsed = 0.0

    def start(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def stop(self, *fence_on: Any) -> float:
        for x in fence_on:
            jax.block_until_ready(x)
        self.elapsed = time.perf_counter() - self._t0
        return self.elapsed


def rate(count: float, seconds: float) -> float:
    return count / seconds if seconds > 0 else float("inf")
