"""Analytic SDF oracles: formula exactness, sampling contract, families."""

import numpy as np

from latent_diffusion_models_for_shape_sdfs_tpu.data import analytic


def test_sphere_sdf_exact():
    p = np.array([[0.0, 0, 0], [1, 0, 0], [0, 0.5, 0], [0.3, 0.4, 0]],
                 np.float32)
    d = analytic.sdf({"type": "sphere", "r": 0.5}, p)
    np.testing.assert_allclose(d, [-0.5, 0.5, 0.0, 0.0], atol=1e-6)


def test_box_sdf_corners_and_faces():
    shape = {"type": "box", "b": [0.5, 0.5, 0.5]}
    p = np.array([[0, 0, 0], [0.5, 0, 0], [1.0, 0, 0], [1.0, 1.0, 1.0]],
                 np.float32)
    d = analytic.sdf(shape, p)
    np.testing.assert_allclose(
        d, [-0.5, 0.0, 0.5, np.sqrt(3) * 0.5], atol=1e-6)


def test_csg_union_difference():
    a = {"type": "sphere", "r": 0.5}
    b = {"type": "sphere", "r": 0.3}
    p = np.array([[0.4, 0, 0]], np.float32)
    assert analytic.sdf({"type": "union", "children": [a, b]}, p)[0] < 0
    # difference a - b: point at 0.4 is outside b (dist 0.1) and inside a
    d = analytic.sdf({"type": "difference", "children": [a, b]}, p)[0]
    np.testing.assert_allclose(d, -0.1, atol=1e-6)


def test_surface_sampling_accuracy():
    rng = np.random.default_rng(0)
    for shape in ({"type": "sphere", "r": 0.5},
                  {"type": "torus", "R": 0.5, "r": 0.15},
                  analytic.make_chair(np.random.default_rng(3))):
        pts = analytic.sample_surface(shape, 500, rng)
        err = np.abs(analytic.sdf(shape, pts))
        assert np.median(err) < 1e-3, shape["type"]
        assert np.mean(err < 5e-3) > 0.9, shape["type"]


def test_sample_sdf_points_contract():
    rng = np.random.default_rng(1)
    shape = {"type": "sphere", "r": 0.5}
    xyz, d = analytic.sample_sdf_points(shape, 10_000, rng)
    assert xyz.shape == (10_000, 3) and d.shape == (10_000,)
    assert xyz.dtype == np.float32 and d.dtype == np.float32
    # labels are exact
    np.testing.assert_allclose(d, analytic.sdf(shape, xyz), atol=1e-6)
    # surface bias: most samples within the +-0.1 clamp band
    assert np.mean(np.abs(d) < 0.1) > 0.8
    # ...but with real spread (not collapsed onto the surface)
    assert np.std(d[np.abs(d) < 0.1]) > 0.01
    # both signs present in near-balanced proportion
    frac_neg = np.mean(d < 0)
    assert 0.3 < frac_neg < 0.7


def test_synthetic_split_deterministic_and_classed():
    a = analytic.make_synthetic_split("classes13", 26, seed=7)
    b = analytic.make_synthetic_split("classes13", 26, seed=7)
    assert a == b
    assert [s["class_id"] for s in a[:13]] == list(range(13))
    c = analytic.make_synthetic_split("chair", 3, seed=1)
    assert all(s["type"] == "union" for s in c)


def test_csg_difference_can_draw_the_empty_set():
    """Regression pin for the multicat6k crash (round 5): the classes13
    `difference` family can draw a shape whose subtracted primitive
    swallows the base — the EMPTY SET (no surface anywhere). Draw 422 of
    the seed-7707 split is such a shape: two spheres with
    dist(centers) + r_base < r_sub. Any tool that meshes analytic refs
    must therefore tolerate surface-free draws and substitute the next
    same-class draw (tools/multicat6k_run.py held-out ref pool)."""
    held = analytic.make_synthetic_split("classes13", 13 * 64, seed=7707)
    s = held[422]
    assert s["type"] == "difference"
    a, b = s["children"]
    dist = float(np.linalg.norm(np.asarray(a["c"]) - np.asarray(b["c"])))
    assert dist + a["r"] < b["r"]  # base entirely inside the subtrahend
    xs = np.linspace(-1, 1, 48, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    pts = np.stack([X, Y, Z], -1).reshape(-1, 3)
    assert analytic.sdf(s, pts).min() > 0  # positive everywhere: empty
