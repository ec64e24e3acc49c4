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


def pack_tree_npz(path: str | pathlib.Path, tree: Any) -> None:
    """Pack an arbitrary pytree of arrays into ONE compressed npz.

    Purpose: a git-persistable twin of the orbax stage checkpoints.
    Orbax trees live under `runs/**/checkpoints/` (gitignored — many
    small files, absolute-path metadata), so every evidence model dies
    with the sandbox and each round re-pays ~20 min of stage-1
    training before any evaluation tool can run. A single compressed
    npz of the same pytree is ~13 MiB for the 6k-scale stage-1
    (decoder params + 6144x256 codes), committable, and restored
    bit-exactly (fp32 arrays round-trip losslessly through npz).

    Keys are `jax.tree_util.keystr` paths, so restore can match them
    against a template with the same structure.
    """
    import numpy as np
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    flat = {jax.tree_util.keystr(p): np.asarray(v) for p, v in leaves}
    assert len(flat) == len(leaves), "duplicate keystr paths in pytree"
    pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(str(path), **flat)


def restore_tree_npz(path: str | pathlib.Path, template: Any) -> Any:
    """Inverse of pack_tree_npz: rebuild `template`'s structure from npz.

    Every template leaf must be present in the file with the same shape;
    values are loaded with the SAVED dtype (the saved model is the truth,
    the template only supplies structure).
    """
    import numpy as np
    with np.load(str(path)) as z:
        saved = {k: z[k] for k in z.files}
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for p, tmpl_leaf in paths_leaves:
        k = jax.tree_util.keystr(p)
        if k not in saved:
            raise KeyError(f"pack {path} missing leaf {k}")
        v = saved[k]
        t = np.asarray(tmpl_leaf)
        if v.shape != t.shape:
            raise ValueError(f"{k}: packed shape {v.shape} != template "
                             f"{t.shape}")
        out.append(v)
    return jax.tree_util.tree_unflatten(treedef, out)


def restore_stage1(exp_dir: str | pathlib.Path, template: Any,
                   pack_name: str = "stage1_pack.npz") -> Any:
    """Restore a stage-1 tree: orbax checkpoint first, npz pack fallback.

    The evidence tools (tools/heldout_gen_eval.py, tools/scale_run.py,
    tools/multicat6k_run.py) all restore {decoder params, codes}; this
    helper gives them one lookup order: the live orbax tree if this
    sandbox trained it, else the committed pack from a previous round.
    """
    exp_dir = pathlib.Path(exp_dir)
    ck = StageCheckpointer(exp_dir, "ad", max_to_keep=1)
    try:
        if ck.latest_step() is not None:
            return ck.restore(template)
    finally:
        ck.close()
    pack = exp_dir / pack_name
    if pack.exists():
        return restore_tree_npz(pack, template)
    raise FileNotFoundError(
        f"no stage-1 orbax checkpoint under {exp_dir}/checkpoints/ad and "
        f"no {pack_name} pack — run the training tool first")


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
