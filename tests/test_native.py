"""Python <-> C++ cross-checks for the native tools (SURVEY.md s4.8):
preprocess output contract, npz readability, sign correctness against the
analytic oracle, and C++ vs Python isosurface agreement."""

import pathlib
import subprocess

import numpy as np
import pytest

from latent_diffusion_models_for_shape_sdfs_tpu.data import analytic
from latent_diffusion_models_for_shape_sdfs_tpu.data.sdf_dataset import SdfDataset
from latent_diffusion_models_for_shape_sdfs_tpu.ops import isosurface
from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
    make_grid_points)
from latent_diffusion_models_for_shape_sdfs_tpu.utils import meshio

REPO = pathlib.Path(__file__).resolve().parents[1]
BUILD = REPO / "native" / "build"

needs_native = pytest.mark.skipif(
    not (BUILD / "preprocess_mesh").exists(),
    reason="native tools not built (cmake -S native -B native/build)")


def _icosphere(subdiv=2):
    """Golden-ratio icosahedron, subdivided + projected to radius 0.5."""
    t = (1 + 5 ** 0.5) / 2
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
                 np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                 np.int64)
    for _ in range(subdiv):
        verts = list(map(tuple, v))
        index = {t_: i for i, t_ in enumerate(verts)}
        nf = []
        for a, b, c in f:
            mids = []
            for i, j in ((a, b), (b, c), (c, a)):
                m = tuple((v[i] + v[j]) / 2)
                if m not in index:
                    index[m] = len(verts)
                    verts.append(m)
                mids.append(index[m])
            ab, bc, ca = mids
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.asarray(verts, np.float64)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        f = np.asarray(nf, np.int64)
    return (0.5 * v).astype(np.float32), f


@needs_native
def test_preprocess_sphere_mesh(tmp_path):
    verts, faces = _icosphere(subdiv=3)  # faceting error ~2e-3 at radius 0.5
    mesh_path = tmp_path / "sphere.obj"
    meshio.write_obj(mesh_path, verts, faces)
    out = tmp_path / "sphere.npz"
    subprocess.run([str(BUILD / "preprocess_mesh"), str(mesh_path),
                    str(out), "20000"], check=True, capture_output=True)
    with np.load(out) as z:
        pos, neg = z["pos"], z["neg"]
    assert pos.shape[1] == 4 and neg.shape[1] == 4
    assert len(pos) + len(neg) == 20000
    assert 0.2 < len(neg) / 20000 < 0.8  # both signs well represented
    # normalize_unit_sphere: bbox center = 0, scale = 1/(max_radius*1.03);
    # max vertex radius 0.5 -> scale 1/0.515, sphere radius -> 0.9709.
    rr = 0.5 / (0.5 * 1.03)
    rows = np.concatenate([pos, neg])
    d = np.linalg.norm(rows[:, :3], axis=1)
    gt = d - rr
    err = np.abs(rows[:, 3] - gt)
    assert np.median(err) < 5e-3   # bounded by icosphere faceting
    assert np.mean(err < 2e-2) > 0.99
    # sign correctness away from the surface band
    inside = d < rr - 0.02
    outside = d > rr + 0.02
    assert (rows[inside, 3] < 0).all()
    assert (rows[outside, 3] > 0).all()
    # dataset layer ingests the file
    ds = SdfDataset.from_dir(tmp_path)
    assert len(ds) == 1
    b = ds.sample_scene_batch(np.random.default_rng(0), np.array([0]), 128)
    assert b.xyz.shape == (1, 128, 3)


@needs_native
def test_preprocess_ingests_binary_ply(tmp_path):
    """Native loader parity across formats: the SAME icosphere written as
    OBJ, ascii PLY, and binary PLY must produce bit-identical sample sets
    (preprocess is seeded+deterministic; verts are quantized to 1/64 so
    the %.6f ascii writers round-trip the f32 coords exactly)."""
    verts, faces = _icosphere(subdiv=2)
    verts = (np.round(verts * 64.0) / 64.0).astype(np.float32)
    outs = {}
    for name, writer in (
            ("m.obj", meshio.write_obj),
            ("a.ply", meshio.write_ply),
            ("b.ply", lambda p, v, f: meshio.write_ply(p, v, f,
                                                       binary=True))):
        mesh_path = tmp_path / name
        writer(mesh_path, verts, faces)
        out = tmp_path / (name + ".npz")
        subprocess.run([str(BUILD / "preprocess_mesh"), str(mesh_path),
                        str(out), "4000"], check=True, capture_output=True)
        with np.load(out) as z:
            outs[name] = (z["pos"].copy(), z["neg"].copy())
    for name in ("a.ply", "b.ply"):
        np.testing.assert_array_equal(outs[name][0], outs["m.obj"][0])
        np.testing.assert_array_equal(outs[name][1], outs["m.obj"][1])


def _canonical_soup(v, f):
    """Order-independent mesh fingerprint: triangle soup with each
    triangle rotated so its lexicographically-smallest vertex leads
    (orientation preserved), then all triangles lexsorted."""
    tri = np.round(np.asarray(v, np.float64)[np.asarray(f)], 5)  # [F,3,3]
    rots = np.stack([tri, tri[:, [1, 2, 0]], tri[:, [2, 0, 1]]], axis=1)
    flat = rots.reshape(len(tri), 3, 9)
    lead = np.lexsort(flat.transpose(2, 0, 1)[::-1])[:, 0]
    canon = flat[np.arange(len(tri)), lead]
    return canon[np.lexsort(canon.T[::-1])]


def test_cpp_mc_noise_grid_matches_python():
    """Adversarial noise grid: nearly every cell crosses with almost no
    vertex sharing — peak verts-per-cell load, exercising the edge-map
    growth path (EdgeMap rehash) and degenerate-triangle welds. The
    native mesh must equal the pure-Python mesher up to emission order
    (the parallel crossing-scan emits cells in a different order)."""
    lib = isosurface._native_mc_lib()
    if lib is None:
        pytest.skip("native marching cubes not built")
    rng = np.random.default_rng(7)
    res = 33
    grid = rng.normal(size=(res, res, res)).astype(np.float32)
    v_cpp, f_cpp = isosurface._extract_mesh_clib(
        lib, np.ascontiguousarray(grid), 0.0, (-1, -1, -1),
        2.0 / (res - 1))
    v_py, f_py = isosurface.marching_tetrahedra(grid)
    assert len(v_cpp) == len(v_py)
    assert len(f_cpp) == len(f_py)
    np.testing.assert_allclose(
        _canonical_soup(v_cpp, f_cpp), _canonical_soup(v_py, f_py),
        atol=2e-5)
    # initial EdgeMap cap = next_pow2(2*32^3+16) = 131072, growth at
    # load 0.5 -> 65536 inserts; 119k verts proves the rehash ran
    assert len(v_cpp) > 65536


@needs_native
def test_cpp_marching_cubes_matches_python():
    res = 33
    pts = make_grid_points(res)
    grid = analytic.sdf({"type": "sphere", "r": 0.5},
                        pts).reshape(res, res, res)
    v_cpp, f_cpp = isosurface.extract_mesh(grid, prefer_native=True)
    v_py, f_py = isosurface.marching_tetrahedra(grid)
    assert len(v_cpp) == len(v_py)
    assert len(f_cpp) == len(f_py)
    # same welded vertex sets (order may differ)
    a = np.asarray(sorted(map(tuple, np.round(v_cpp, 5))))
    b = np.asarray(sorted(map(tuple, np.round(v_py, 5))))
    np.testing.assert_allclose(a, b, atol=1e-4)
    r = np.linalg.norm(v_cpp, axis=1)
    assert np.abs(r - 0.5).max() < 2.0 / (res - 1)


def test_clib_mc_matches_subprocess():
    """The in-process ctypes entry (libmarching_cubes_c) must be
    bit-identical to the subprocess protocol — same mt::extract, two
    transports."""
    lib = isosurface._native_mc_lib()
    if lib is None or isosurface._native_mc_binary() is None:
        import pytest
        pytest.skip("native marching cubes not built")
    res = 49
    pts = make_grid_points(res)
    grid = np.ascontiguousarray(
        analytic.sdf({"type": "torus", "R": 0.5, "r": 0.2},
                     pts).reshape(res, res, res).astype(np.float32))
    v1, f1 = isosurface._extract_mesh_clib(lib, grid, 0.0, (-1, -1, -1),
                                           2.0 / (res - 1))
    saved = isosurface._MC_LIB
    try:
        isosurface._MC_LIB = None  # force the subprocess transport
        v2, f2 = isosurface.extract_mesh(grid)
    finally:
        isosurface._MC_LIB = saved
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(f1, f2)


@needs_native
def test_cpp_mc_euler_characteristic():
    res = 25
    pts = make_grid_points(res)
    grid = analytic.sdf({"type": "torus", "R": 0.5, "r": 0.2},
                        pts).reshape(res, res, res)
    v, f = isosurface.extract_mesh(grid, prefer_native=True)
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.unique(np.sort(edges, axis=1), axis=0)
    assert len(v) - len(edges) + len(f) == 0  # torus
