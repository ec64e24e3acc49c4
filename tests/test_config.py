"""Config round-trip, overrides, experiment layout, dataset contract."""

import numpy as np

from latent_diffusion_models_for_shape_sdfs_tpu.config import (
    AdConfig, DecoderConfig, ExperimentConfig, override, experiment_layout)
from latent_diffusion_models_for_shape_sdfs_tpu.data import (
    analytic, SdfDataset)
from latent_diffusion_models_for_shape_sdfs_tpu.utils import meshio


def test_experiment_config_json_roundtrip(tmp_path):
    cfg = ExperimentConfig(name="t",
                           ad=AdConfig(num_scenes=5,
                                       decoder=DecoderConfig(hidden_dim=128)))
    cfg.save(tmp_path)
    back = ExperimentConfig.load(tmp_path)
    assert back == cfg or (back.name == cfg.name
                           and back.ad.decoder.hidden_dim == 128
                           and back.ad.num_scenes == 5)


def test_override_dotted():
    cfg = AdConfig()
    out = override(cfg, num_scenes=9, **{"decoder.hidden_dim": 64})
    assert out.num_scenes == 9 and out.decoder.hidden_dim == 64
    assert cfg.num_scenes == 1  # original untouched (frozen)


def test_experiment_layout_keys(tmp_path):
    lay = experiment_layout(tmp_path)
    assert set(lay) >= {"specs", "checkpoints", "latents", "logs",
                        "reconstructions", "samples", "evals"}


def test_dataset_balanced_sampling():
    shapes = analytic.make_synthetic_split("sphere", 3, seed=0)
    ds = SdfDataset.from_analytic(shapes, samples_per_shape=5000, seed=0)
    rng = np.random.default_rng(0)
    b = ds.sample_scene_batch(rng, np.array([0, 1, 2]), 512)
    assert b.xyz.shape == (3, 512, 3) and b.sdf.shape == (3, 512)
    assert b.num_sdf_samples == 3 * 512
    # balanced: first half of each scene's draw is pos, second half neg
    assert np.all(b.sdf[:, :256] >= 0)
    assert np.all(b.sdf[:, 256:] < 0)


def test_dataset_epoch_batches_fixed_shape():
    shapes = analytic.make_synthetic_split("box", 5, seed=1)
    ds = SdfDataset.from_analytic(shapes, samples_per_shape=2000, seed=0)
    rng = np.random.default_rng(1)
    batches = list(ds.epoch_batches(rng, scenes_per_batch=2,
                                    samples_per_scene=128))
    assert len(batches) == 3  # ceil(5/2), tail padded
    for b in batches:
        assert b.xyz.shape == (2, 128, 3)


def test_meshio_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    verts = rng.normal(size=(10, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int64)
    meshio.write_obj(tmp_path / "m.obj", verts, faces)
    v2, f2 = meshio.read_obj(tmp_path / "m.obj")
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)
    meshio.write_ply(tmp_path / "m.ply", verts, faces)
    v3, f3 = meshio.read_ply_ascii(tmp_path / "m.ply")
    np.testing.assert_allclose(v3, verts, atol=1e-5)
    np.testing.assert_array_equal(f3, faces)
    # binary little-endian PLY: exact f32 round-trip
    meshio.write_ply(tmp_path / "b.ply", verts, faces, binary=True)
    v4, f4 = meshio.read_ply(tmp_path / "b.ply")
    np.testing.assert_array_equal(v4, verts)
    np.testing.assert_array_equal(f4, faces)
    # write_mesh dispatches on extension (.ply -> binary)
    meshio.write_mesh(tmp_path / "d.ply", verts, faces)
    v5, f5 = meshio.read_ply(tmp_path / "d.ply")
    np.testing.assert_array_equal(v5, verts)
    np.testing.assert_array_equal(f5, faces)


def test_read_ply_out_of_order_properties(tmp_path):
    """The PLY spec puts no constraint on property declaration order:
    a z/y/x file must load as (x, y, z), not in file order."""
    p = tmp_path / "zyx.ply"
    p.write_text(
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float z\nproperty float y\nproperty float x\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n"
        "3 2 1\n6 5 4\n9 8 7\n"
        "3 0 1 2\n")
    v, f = meshio.read_ply(p)
    np.testing.assert_allclose(v, [[1, 2, 3], [4, 5, 6], [7, 8, 9]])
    # binary variant: z declared first
    b = tmp_path / "zyx.bply"
    header = ("ply\nformat binary_little_endian 1.0\n"
              "element vertex 2\n"
              "property float z\nproperty float y\nproperty float x\n"
              "element face 0\n"
              "property list uchar int vertex_indices\nend_header\n")
    data = np.asarray([[3, 2, 1], [6, 5, 4]], "<f4")
    b.write_bytes(header.encode() + data.tobytes())
    v2, _ = meshio.read_ply(b)
    np.testing.assert_allclose(v2, [[1, 2, 3], [4, 5, 6]])


def test_meshio_vertex_normals_roundtrip(tmp_path):
    # a flat square in the xy-plane: every vertex normal is exactly +z
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    nrm = meshio.vertex_normals(verts, faces)
    np.testing.assert_allclose(nrm, [[0, 0, 1]] * 4, atol=1e-7)
    # normals survive every format (binary PLY carries exact f32; the
    # plain readers still work, ignoring the extra properties)
    meshio.write_mesh(tmp_path / "n.ply", verts, faces, normals=nrm)
    v2, f2, n2 = meshio.read_ply(tmp_path / "n.ply", with_normals=True)
    np.testing.assert_array_equal(v2, verts)
    np.testing.assert_array_equal(f2, faces)
    np.testing.assert_array_equal(n2, nrm)
    v2b, f2b = meshio.read_ply(tmp_path / "n.ply")
    np.testing.assert_array_equal(v2b, verts)
    meshio.write_ply(tmp_path / "na.ply", verts, faces, normals=nrm)
    _, _, n3 = meshio.read_ply(tmp_path / "na.ply", with_normals=True)
    np.testing.assert_allclose(n3, nrm, atol=1e-6)
    meshio.write_obj(tmp_path / "n.obj", verts, faces, normals=nrm)
    v4, f4 = meshio.read_obj(tmp_path / "n.obj")  # vn lines skipped
    np.testing.assert_allclose(v4, verts, atol=1e-6)
    np.testing.assert_array_equal(f4, faces)
    assert "vn 0.000000 0.000000 1.000000" in (
        tmp_path / "n.obj").read_text()
    # a file without normals reports None
    meshio.write_ply(tmp_path / "plain.ply", verts, faces, binary=True)
    _, _, none = meshio.read_ply(tmp_path / "plain.ply",
                                 with_normals=True)
    assert none is None


def test_harmonize_winding_noise_mesh_invariant():
    # many-component adversarial mesh: after harmonization every
    # manifold (2-face) edge must run in OPPOSITE directions in its two
    # faces — the definition of consistent orientation
    from latent_diffusion_models_for_shape_sdfs_tpu.ops import isosurface
    rng = np.random.default_rng(5)
    grid = rng.normal(size=(15, 15, 15)).astype(np.float32)
    v, f = isosurface.marching_tetrahedra(grid)
    assert len(f) > 3000
    f2 = meshio.harmonize_winding(v, f)
    assert f2.shape == f.shape
    # same triangles as sets (only winding may differ)
    np.testing.assert_array_equal(np.sort(f2, axis=1), np.sort(f, axis=1))
    edges = np.concatenate([f2[:, [0, 1]], f2[:, [1, 2]], f2[:, [2, 0]]])
    key = edges.min(1).astype(np.int64) * (len(v) + 1) + edges.max(1)
    fwd = edges[:, 0] < edges[:, 1]
    order = np.argsort(key, kind="stable")
    ks, fs = key[order], fwd[order]
    starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    counts = np.diff(np.r_[starts, len(ks)])
    two = starts[counts == 2]
    assert len(two) > 1000
    assert (fs[two] != fs[two + 1]).all()


def test_vertex_normals_sphere_radial():
    from latent_diffusion_models_for_shape_sdfs_tpu.data import analytic
    from latent_diffusion_models_for_shape_sdfs_tpu.ops import isosurface
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        make_grid_points)
    res = 33
    pts = make_grid_points(res)
    grid = analytic.sdf({"type": "sphere", "r": 0.5},
                        pts).reshape(res, res, res)
    v, f = isosurface.extract_mesh(grid)
    n = meshio.vertex_normals(v, f)
    radial = v / np.linalg.norm(v, axis=1, keepdims=True)
    cos = np.einsum("ij,ij->i", n, radial)
    # harmonize_winding makes EVERY normal outward-radial (the raw
    # marching-tet winding is mixed: ~half the normals flip without it)
    assert cos.min() > 0.99
    raw = meshio.vertex_normals(v, f, harmonize=False)
    cos_raw = np.einsum("ij,ij->i", raw, radial)
    assert cos_raw.min() < -0.9  # documents why harmonize exists


def test_read_ply_foreign_layouts(tmp_path):
    """Reader handles external-tool layouts: extra vertex properties
    (normals), double precision coords, uint face indices, quads."""
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     np.float64)
    quad = [0, 1, 2, 3]
    # --- binary: nx/ny/nz alongside xyz, double coords, quad face
    p = tmp_path / "n.ply"
    header = ("ply\nformat binary_little_endian 1.0\n"
              "element vertex 4\n"
              "property double x\nproperty double y\nproperty double z\n"
              "property float nx\nproperty float ny\nproperty float nz\n"
              "element face 1\n"
              "property list uchar uint vertex_indices\nend_header\n")
    rec = np.zeros(4, np.dtype([("xyz", "<f8", (3,)), ("n", "<f4", (3,))]))
    rec["xyz"] = verts
    with p.open("wb") as f:
        f.write(header.encode())
        f.write(rec.tobytes())
        f.write(np.uint8(4).tobytes())
        f.write(np.asarray(quad, "<u4").tobytes())
    v, fc = meshio.read_ply(p)
    np.testing.assert_allclose(v, verts, atol=1e-7)
    np.testing.assert_array_equal(fc, [[0, 1, 2], [0, 2, 3]])  # fan
    # --- ascii with normals + quad
    q = tmp_path / "a.ply"
    q.write_text(
        "ply\nformat ascii 1.0\nelement vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float nx\nproperty float ny\nproperty float nz\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n"
        + "".join(f"{x} {y} {z} 0 0 1\n" for x, y, z in verts)
        + "4 0 1 2 3\n")
    v2, f2 = meshio.read_ply(q)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, [[0, 1, 2], [0, 2, 3]])
    # --- binary with RAGGED faces (quad + triangle): per-record walk
    r = tmp_path / "r.ply"
    header = ("ply\nformat binary_little_endian 1.0\n"
              "element vertex 4\n"
              "property float x\nproperty float y\nproperty float z\n"
              "element face 2\n"
              "property list uchar int vertex_indices\nend_header\n")
    with r.open("wb") as f:
        f.write(header.encode())
        f.write(np.asarray(verts, "<f4").tobytes())
        f.write(np.uint8(4).tobytes())
        f.write(np.asarray(quad, "<i4").tobytes())
        f.write(np.uint8(3).tobytes())
        f.write(np.asarray([3, 1, 0], "<i4").tobytes())
    v3, f3 = meshio.read_ply(r)
    np.testing.assert_allclose(v3, verts, atol=1e-6)
    np.testing.assert_array_equal(f3, [[0, 1, 2], [0, 2, 3], [3, 1, 0]])
