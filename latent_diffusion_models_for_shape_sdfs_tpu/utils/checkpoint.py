"""Orbax-backed checkpointing (SURVEY.md s5.4).

Experiment-dir layout follows the lineage convention: one checkpoint tree
per stage under `<exp>/checkpoints/<stage>/`. The saved pytree for stage 1
is the full AdTrainState (decoder params, latent table, both Adam states)
plus the epoch counter; stage 2 adds denoiser/EMA params, its Adam state,
the step counter, and the code-normalization (mu, sigma) — everything
needed for exact resume (tests/test_ckpt_resume.py proves k + restore + k
== 2k) and for the stage-1 -> stage-2 read-only handoff.
"""

from __future__ import annotations

import pathlib
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class StageCheckpointer:
    """One orbax CheckpointManager per (experiment, stage)."""

    def __init__(self, exp_dir: str | pathlib.Path, stage: str,
                 max_to_keep: int = 3):
        root = pathlib.Path(exp_dir).resolve() / "checkpoints" / stage
        root.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            str(root),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, tree: Any, wait: bool = True) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint to restore")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def close(self) -> None:
        self._mgr.close()


def save_array_dict(path: str | pathlib.Path, tree: dict) -> None:
    """Small-artifact escape hatch (e.g. latents dir): npz of a flat dict."""
    import numpy as np
    flat = {k: np.asarray(v) for k, v in tree.items()}
    pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
    import io
    np.savez(str(path), **flat)


def load_array_dict(path: str | pathlib.Path) -> dict:
    import numpy as np
    with np.load(str(path)) as z:
        return {k: z[k] for k in z.files}
