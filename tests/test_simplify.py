"""Native QEM mesh decimation (native/simplify/qem_core.hpp via
ops.isosurface.simplify_mesh): face budget, geometric fidelity, manifold
topology preservation, boundary-rim preservation, and the serving-path
integration. Skips when the native lib is not built."""

import numpy as np
import pytest

from latent_diffusion_models_for_shape_sdfs_tpu.data import analytic
from latent_diffusion_models_for_shape_sdfs_tpu.evaluation import (
    chamfer_l2, sample_mesh_surface)
from latent_diffusion_models_for_shape_sdfs_tpu.ops import isosurface
from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
    make_grid_points)

needs_lib = pytest.mark.skipif(
    isosurface._native_mc_lib() is None
    or not hasattr(isosurface._native_mc_lib(), "simp_run"),
    reason="native simplifier not built")


def _mesh(spec, res=49):
    pts = make_grid_points(res)
    grid = analytic.sdf(spec, pts).reshape(res, res, res)
    return isosurface.extract_mesh(grid)


def _edge_counts(faces):
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                        faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    return counts


@needs_lib
def test_simplify_sphere_budget_fidelity_topology():
    v, f = _mesh({"type": "sphere", "r": 0.5})
    target = len(f) // 10
    v2, f2 = isosurface.simplify_mesh(v, f, target_faces=target)
    assert len(f2) <= target
    assert len(f2) > target // 2
    # no degenerate faces, all indices valid, no orphan verts
    assert (np.diff(np.sort(f2, axis=1), axis=1) > 0).all()
    assert f2.min() >= 0 and f2.max() < len(v2)
    assert len(np.unique(f2)) == len(v2)
    # every edge still shared by exactly 2 faces (closed manifold) and
    # Euler characteristic still 2 (genus 0)
    counts = _edge_counts(f2)
    assert (counts == 2).all()
    assert len(v2) - len(counts) + len(f2) == 2
    # the decimated surface still sits on the sphere
    r = np.linalg.norm(v2, axis=1)
    assert np.abs(r - 0.5).max() < 0.02
    # Chamfer to the original within 2x the finite-sampling floor (the
    # floor — same mesh, two sample draws — dominates decimation error
    # at this budget)
    floor = chamfer_l2(sample_mesh_surface(v, f, 20_000, seed=2),
                       sample_mesh_surface(v, f, 20_000, seed=1))
    cham = chamfer_l2(sample_mesh_surface(v2, f2, 20_000, seed=0),
                      sample_mesh_surface(v, f, 20_000, seed=1))
    assert cham < 2 * floor


@needs_lib
def test_simplify_preserves_torus_genus():
    v, f = _mesh({"type": "torus", "R": 0.5, "r": 0.2})
    v2, f2 = isosurface.simplify_mesh(v, f, ratio=0.15)
    counts = _edge_counts(f2)
    assert (counts == 2).all()
    assert len(v2) - len(counts) + len(f2) == 0  # torus: chi == 0


@needs_lib
def test_simplify_max_error_limits_collapse():
    v, f = _mesh({"type": "sphere", "r": 0.5})
    # a tiny error ceiling stops decimation long before the (0) target
    v_lo, f_lo = isosurface.simplify_mesh(v, f, target_faces=0,
                                          max_error=1e-10)
    v_hi, f_hi = isosurface.simplify_mesh(v, f, target_faces=0,
                                          max_error=1e-4)
    assert len(f_hi) < len(f_lo) <= len(f)
    assert len(f_hi) >= 4  # still a closed surface, not collapsed away


def _boundary_length(v, f):
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    e = np.sort(e, axis=1)
    uniq, counts = np.unique(e, axis=0, return_counts=True)
    rim = uniq[counts == 1]
    return np.linalg.norm(v[rim[:, 0]] - v[rim[:, 1]], axis=1).sum(), rim


@needs_lib
def test_simplify_preserves_open_rim():
    # open mesh: drop the sphere's upper-hemisphere faces -> a rim at
    # z ~ 0; the boundary constraint planes must keep the rim in place
    v, f = _mesh({"type": "sphere", "r": 0.5})
    cz = v[f].mean(axis=1)[:, 2]
    f = f[cz < 0.0]
    len0, rim0 = _boundary_length(v, f)
    assert len(rim0) > 0  # really open
    v2, f2 = isosurface.simplify_mesh(v, f, ratio=0.2)
    counts2 = _edge_counts(f2)
    assert (counts2 <= 2).all()  # no non-manifold fins introduced
    len2, rim2 = _boundary_length(v2, f2)
    # rim survives: comparable total boundary length (a decimated rim is
    # shorter only by chord-vs-arc shrinkage), and rim verts stay on the
    # original rim band
    assert abs(len2 - len0) / len0 < 0.1
    rim_v = v2[np.unique(rim2)]
    assert rim_v[:, 2].max() < 0.05 and rim_v[:, 2].min() > -0.08


@needs_lib
def test_simplify_noise_mesh_robust():
    # adversarial input: marching-tetrahedra over a random-sign grid —
    # maximal crossing density, many boundary rims where the surface
    # exits the grid. Output must stay a valid manifold-or-boundary
    # triangle mesh at any budget.
    rng = np.random.default_rng(3)
    grid = rng.normal(size=(17, 17, 17)).astype(np.float32)
    v, f = isosurface.marching_tetrahedra(grid)
    assert len(f) > 5000
    for ratio in (0.5, 0.1):
        v2, f2 = isosurface.simplify_mesh(v, f, ratio=ratio)
        # budget is best-effort on pathological input: the heap can run
        # dry of VALID collapses (link-condition/flip rejections) just
        # above the target — allow a few % overshoot
        assert 0 < len(f2) <= int(len(f) * ratio * 1.1)
        assert (np.diff(np.sort(f2, axis=1), axis=1) > 0).all()
        assert f2.min() >= 0 and f2.max() < len(v2)
        assert (_edge_counts(f2) <= 2).all()


@needs_lib
def test_simplify_noop_cases():
    v, f = _mesh({"type": "sphere", "r": 0.5}, res=25)
    # already at/below budget -> unchanged
    v2, f2 = isosurface.simplify_mesh(v, f, target_faces=len(f))
    np.testing.assert_array_equal(v2, v)
    np.testing.assert_array_equal(f2, f)
    # empty mesh passes through
    v3, f3 = isosurface.simplify_mesh(np.zeros((0, 3), np.float32),
                                      np.zeros((0, 3), np.int64),
                                      target_faces=10)
    assert len(v3) == 0 and len(f3) == 0
    with pytest.raises(ValueError):
        isosurface.simplify_mesh(v, f)
    with pytest.raises(ValueError):
        isosurface.simplify_mesh(v, f, target_faces=10, ratio=0.5)


@needs_lib
def test_serve_meshes_simplify():
    # serving integration: LOD budget honored per shape, faces_before
    # recorded, geometry stays on the analytic surface
    import jax.numpy as jnp
    from latent_diffusion_models_for_shape_sdfs_tpu.serve import (
        serve_meshes)

    def apply_fn(z, xyz):
        r = 0.4 + 0.1 * z[0]
        return jnp.linalg.norm(xyz, axis=-1) - r

    zs = [np.array([0.0], np.float32), np.array([1.0], np.float32)]
    out = list(serve_meshes(apply_fn, zs, res=64,
                            simplify_faces=800))
    assert len(out) == 2
    for (v, f, st), r in zip(out, (0.4, 0.5)):
        assert len(f) <= 800
        assert st["faces_before"] > len(f)
        assert np.abs(np.linalg.norm(v, axis=1) - r).max() < 0.04
