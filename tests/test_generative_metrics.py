"""Generative metrics (MMD / COV / 1-NNA) sanity on analytic point sets."""

import numpy as np

from latent_diffusion_models_for_shape_sdfs_tpu.data import analytic
from latent_diffusion_models_for_shape_sdfs_tpu.evaluation import (
    evaluate_generated, mmd_coverage, one_nna)


def _clouds(radii, seed=0, n=800):
    rng = np.random.default_rng(seed)
    return [analytic.sample_surface({"type": "sphere", "r": float(r)}, n,
                                    rng) for r in radii]


def test_identical_sets_are_ideal():
    ref = _clouds([0.3, 0.45, 0.6])
    gen = _clouds([0.3, 0.45, 0.6], seed=1)
    out = evaluate_generated(gen, ref)
    # mmd floor = finite-sampling chamfer of identical surfaces (~2e-3
    # at 800 pts); far below the cross-radius distances (> 1e-2)
    assert out["mmd_chamfer"] < 5e-3
    assert out["coverage"] == 1.0           # every ref covered
    # paired twins: every cloud's NN is its other-set twin -> <= 0.5
    assert out["one_nna"] <= 0.5


def test_mode_collapse_detected():
    ref = _clouds([0.3, 0.45, 0.6, 0.75])
    gen = _clouds([0.3, 0.3, 0.3, 0.3], seed=2)  # collapsed generator
    out = mmd_coverage(gen, ref)
    assert out["coverage"] <= 0.25 + 1e-9
    assert out["mmd_chamfer"] > 1e-3        # far refs unmatched


def test_disjoint_sets_fully_separable():
    ref = _clouds([0.3, 0.35])
    gen = _clouds([0.7, 0.75], seed=3)
    assert one_nna(gen, ref) == 1.0


def test_host_exact_emd_metrics():
    from latent_diffusion_models_for_shape_sdfs_tpu.evaluation import (
        emd_exact, evaluate_generated_emd_host)
    # exact EMD between concentric sphere surfaces ~= radius gap
    rng = np.random.default_rng(7)
    a = analytic.sample_surface({"type": "sphere", "r": 0.3}, 256, rng)
    b = analytic.sample_surface({"type": "sphere", "r": 0.5}, 256, rng)
    d = emd_exact(a, b)
    assert abs(d - 0.2) < 0.04
    assert emd_exact(a, a) == 0.0
    # full metric dict: identical twins are ideal, keys complete
    ref = _clouds([0.3, 0.45, 0.6], n=300)
    gen = _clouds([0.3, 0.45, 0.6], seed=1, n=300)
    out = evaluate_generated_emd_host(gen, ref, points=128)
    assert out["coverage_emd"] == 1.0
    assert out["one_nna_emd"] <= 0.5
    # 128-pt sphere clouds have ~0.1 mean NN spacing — that sampling
    # floor, not the radius match, sets the EMD scale here
    assert out["mmd_emd"] < 0.15
    assert out["emd_cloud_points"] == 128


# (mesh-construction tests live in tests/test_mesh.py)
