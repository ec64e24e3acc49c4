"""Isosurface extraction: geometric accuracy + topology on analytic grids."""

import numpy as np

from latent_diffusion_models_for_shape_sdfs_tpu.data import analytic
from latent_diffusion_models_for_shape_sdfs_tpu.ops.isosurface import (
    marching_tetrahedra,
)
from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
    make_grid_points,
)


def _grid(shape, res):
    pts = make_grid_points(res)
    return analytic.sdf(shape, pts).reshape(res, res, res)


def test_sphere_vertices_on_surface():
    res = 49
    v, f = marching_tetrahedra(_grid({"type": "sphere", "r": 0.5}, res))
    assert len(v) > 500 and len(f) > 500
    r = np.linalg.norm(v, axis=1)
    h = 2.0 / (res - 1)
    assert np.abs(r - 0.5).max() < h  # within one cell of the true radius
    assert np.abs(r - 0.5).mean() < 0.25 * h


def test_closed_surface_euler_characteristic():
    # A welded closed genus-0 surface has V - E + F = 2.
    v, f = marching_tetrahedra(_grid({"type": "sphere", "r": 0.6}, 33))
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.unique(np.sort(edges, axis=1), axis=0)
    euler = len(v) - len(edges) + len(f)
    assert euler == 2
    # torus: V - E + F = 0
    v, f = marching_tetrahedra(
        _grid({"type": "torus", "R": 0.5, "r": 0.2}, 41))
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.unique(np.sort(edges, axis=1), axis=0)
    assert len(v) - len(edges) + len(f) == 0


def test_vertices_interpolate_zero_crossings():
    # On a linear field sdf = x - 0.25, every vertex must sit at x = 0.25.
    res = 17
    pts = make_grid_points(res)
    grid = (pts[:, 0] - 0.25).reshape(res, res, res)
    v, f = marching_tetrahedra(grid)
    assert len(v) > 0
    np.testing.assert_allclose(v[:, 0], 0.25, atol=1e-6)


def test_empty_and_full_grids():
    res = 9
    v, f = marching_tetrahedra(np.ones((res, res, res), np.float32))
    assert len(v) == 0 and len(f) == 0
    v, f = marching_tetrahedra(-np.ones((res, res, res), np.float32))
    assert len(v) == 0 and len(f) == 0


def test_nonzero_iso_level():
    res = 33
    g = _grid({"type": "sphere", "r": 0.5}, res)
    v, f = marching_tetrahedra(g, iso=0.1)  # offset surface: radius 0.6
    r = np.linalg.norm(v, axis=1)
    assert np.abs(r - 0.6).max() < 2.0 / (res - 1)
