"""F-score@tau and normal-consistency metrics (evaluation/fscore.py)
against analytic oracles: exact SDF normals, concentric spheres with a
known radius gap, and the mesher round-trip."""

import numpy as np

from latent_diffusion_models_for_shape_sdfs_tpu.data import analytic
from latent_diffusion_models_for_shape_sdfs_tpu.evaluation import (
    fscore, normal_consistency, sample_mesh_surface,
    sample_mesh_surface_with_normals, sdf_normals)
from latent_diffusion_models_for_shape_sdfs_tpu.ops import isosurface
from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
    make_grid_points)


def _sphere_pts(r, n=4000, seed=0):
    rng = np.random.default_rng(seed)
    return analytic.sample_surface({"type": "sphere", "r": r}, n, rng)


def test_fscore_identical_surface_is_one():
    a = _sphere_pts(0.5, seed=0)
    b = _sphere_pts(0.5, seed=1)
    out = fscore(a, b, tau=0.05)
    # 4000-pt sampling leaves ~2.8e-2 mean NN spacing; a handful of
    # worst-gap points may exceed tau — ideal up to the sampling floor
    assert out["fscore"] > 0.999
    assert out["precision"] > 0.998 and out["recall"] > 0.998


def test_fscore_threshold_separates_radius_gap():
    # concentric spheres 0.1 apart: tau below the gap -> 0, above -> 1
    a = _sphere_pts(0.4)
    b = _sphere_pts(0.5, seed=1)
    assert fscore(a, b, tau=0.05)["fscore"] < 0.05
    assert fscore(a, b, tau=0.15)["fscore"] > 0.95


def test_fscore_directional_split():
    # pred = gt surface PLUS a far blob of extra geometry: recall stays
    # ~1 (gt fully covered), precision drops by the blob fraction
    gt = _sphere_pts(0.5, n=3000)
    blob = _sphere_pts(0.1, n=1000, seed=3) + np.array([0.0, 0.0, 0.9],
                                                       np.float32)
    pred = np.concatenate([_sphere_pts(0.5, n=3000, seed=2), blob])
    out = fscore(pred, gt, tau=0.05)
    assert out["recall"] > 0.99
    assert abs(out["precision"] - 0.75) < 0.02
    assert out["fscore"] == 0.0 or out["fscore"] < 0.9  # harmonic drop


def test_sdf_normals_match_sphere_analytic():
    pts = _sphere_pts(0.5, n=500)
    n = sdf_normals(lambda p: analytic.sdf({"type": "sphere", "r": 0.5},
                                           p), pts)
    expect = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    assert np.abs((n * expect).sum(1) - 1.0).max() < 1e-4


def test_normal_consistency_sphere_mesh_vs_analytic():
    res = 49
    pts = make_grid_points(res)
    grid = analytic.sdf({"type": "sphere", "r": 0.5},
                        pts).reshape(res, res, res)
    v, f = isosurface.extract_mesh(grid)
    mp, mn = sample_mesh_surface_with_normals(v, f, 4000, seed=0)
    gt = _sphere_pts(0.5, n=4000, seed=1)
    gn = sdf_normals(lambda p: analytic.sdf({"type": "sphere", "r": 0.5},
                                            p), gt)
    nc = normal_consistency(mp, mn, gt, gn)
    assert nc > 0.98  # faceting at res 49 costs ~1%
    # rotating every predicted normal into the tangent plane floors it
    tangent = np.cross(mn, np.array([0.0, 0.0, 1.0]))
    keep = np.linalg.norm(tangent, axis=1) > 1e-3
    assert normal_consistency(mp[keep], tangent[keep], gt, gn) < 0.35


def test_with_normals_sampler_matches_plain_sampler():
    res = 33
    pts = make_grid_points(res)
    grid = analytic.sdf({"type": "torus", "R": 0.5, "r": 0.2},
                        pts).reshape(res, res, res)
    v, f = isosurface.extract_mesh(grid)
    p1 = sample_mesh_surface(v, f, 777, seed=5)
    p2, n2 = sample_mesh_surface_with_normals(v, f, 777, seed=5)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_allclose(np.linalg.norm(n2, axis=1), 1.0,
                               atol=1e-5)
