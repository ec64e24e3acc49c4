"""Round-trip tests for the git-persistable npz checkpoint pack.

The orbax stage trees under runs/**/checkpoints/ are gitignored, so the
trained evidence models die with each sandbox; `pack_tree_npz` /
`restore_tree_npz` are the committable twin (utils/checkpoint.py). These
tests pin (a) bit-exact round-trip of a nested stage-1-shaped pytree,
(b) the orbax-first / pack-fallback lookup order of `restore_stage1`,
(c) loud failure on structure mismatch.
"""

import numpy as np
import pytest

from latent_diffusion_models_for_shape_sdfs_tpu.utils.checkpoint import (
    StageCheckpointer, pack_tree_npz, restore_stage1, restore_tree_npz)


def _tree(seed: int):
    r = np.random.default_rng(seed)
    return {
        "params": {
            "layers_0": {"kernel": r.normal(size=(7, 5)).astype(np.float32),
                         "bias": r.normal(size=(5,)).astype(np.float32)},
            "layers_1": {"g": r.normal(size=(5,)).astype(np.float32)},
        },
        "codes": r.normal(size=(11, 4)).astype(np.float32),
    }


def test_pack_roundtrip_bit_exact(tmp_path):
    tree = _tree(0)
    pack_tree_npz(tmp_path / "p.npz", tree)
    out = restore_tree_npz(tmp_path / "p.npz", _tree(1))  # template: other values
    for (ka, a), (kb, b) in zip(
            sorted_leaves(tree), sorted_leaves(out)):
        assert ka == kb
        np.testing.assert_array_equal(a, b)  # bit-exact, not allclose
        assert a.dtype == b.dtype


def sorted_leaves(tree):
    import jax
    return sorted(
        (jax.tree_util.keystr(p), np.asarray(v))
        for p, v in jax.tree_util.tree_flatten_with_path(tree)[0])


def test_restore_missing_leaf_and_shape_mismatch(tmp_path):
    tree = _tree(0)
    pack_tree_npz(tmp_path / "p.npz", tree)
    bad = _tree(0)
    bad["params"]["extra"] = np.zeros(3, np.float32)
    with pytest.raises(KeyError):
        restore_tree_npz(tmp_path / "p.npz", bad)
    wrong = _tree(0)
    wrong["codes"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError):
        restore_tree_npz(tmp_path / "p.npz", wrong)


def test_restore_stage1_fallback_order(tmp_path):
    tmpl = _tree(1)
    with pytest.raises(FileNotFoundError):
        restore_stage1(tmp_path, tmpl)
    # pack only -> restored from pack
    packed = _tree(2)
    pack_tree_npz(tmp_path / "stage1_pack.npz", packed)
    out = restore_stage1(tmp_path, tmpl)
    np.testing.assert_array_equal(out["codes"], packed["codes"])
    # orbax present -> orbax wins over the pack
    orb = _tree(3)
    ck = StageCheckpointer(tmp_path, "ad", max_to_keep=1)
    ck.save(5, orb)
    ck.close()
    out2 = restore_stage1(tmp_path, tmpl)
    np.testing.assert_array_equal(np.asarray(out2["codes"]), orb["codes"])
