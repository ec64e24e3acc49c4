"""Sphere-traced SDF rendering (ops/render.py) + PNG IO (utils/image.py):
geometric silhouette oracle on an analytic sphere, shading sanity,
turntable views, and PNG write/read roundtrip."""

import numpy as np
import jax.numpy as jnp

from latent_diffusion_models_for_shape_sdfs_tpu.ops.render import (
    render_sdf, render_turntable)
from latent_diffusion_models_for_shape_sdfs_tpu.utils.image import (
    png_bytes, read_png, write_png)


def _sphere_apply(radius=0.4, center=(0.0, 0.0, 0.0)):
    c = jnp.asarray(center, jnp.float32)

    def fn(z, xyz):
        return jnp.linalg.norm(xyz - c, axis=-1) - radius

    return fn


def test_sphere_silhouette_and_shading():
    W = H = 96
    eye = np.asarray([0.0, 0.0, 2.0])
    fov = 40.0
    rgb, hit = render_sdf(_sphere_apply(0.4), jnp.zeros(4),
                          width=W, height=H, eye=eye, fov_deg=fov)
    assert rgb.shape == (H, W, 3) and rgb.dtype == np.uint8
    # projected silhouette: a disc of angular radius asin(r/d); compare
    # hit-pixel count to the analytic disc area in pixels
    half_h = np.tan(np.deg2rad(fov) / 2)
    r_frac = np.tan(np.arcsin(0.4 / 2.0)) / half_h   # fraction of half-view
    expected = np.pi * (r_frac * H / 2) ** 2
    got = int(hit.sum())
    assert abs(got - expected) / expected < 0.08, (got, expected)
    # center pixel hits, corners are background
    assert hit[H // 2, W // 2] and not hit[0, 0] and not hit[-1, -1]
    # shading: the lit upper-left region of the sphere is brighter than
    # the lower-right limb (light defaults to (+,+,+) octant)
    lum = rgb.astype(np.int32).sum(-1)
    c, off = H // 2, H // 8          # both probes inside the silhouette
    assert hit[c - off, c - off] and hit[c + off, c + off]
    assert lum[c - off, c - off] > lum[c + off, c + off] + 30


def test_sphere_center_offset_moves_silhouette():
    rgb, hit = render_sdf(_sphere_apply(0.3, (0.35, 0.0, 0.0)),
                          jnp.zeros(4), width=64, height=64,
                          eye=(0.0, 0.0, 2.0))
    ys, xs = np.nonzero(hit)
    assert xs.mean() > 40            # silhouette shifted right of center
    assert hit.sum() > 50


def test_turntable_views_differ_only_for_asymmetric_shapes():
    # a sphere looks identical from every azimuth; an offset sphere not
    views = render_turntable(_sphere_apply(0.35, (0.2, 0.0, 0.0)),
                             jnp.zeros(4), frames=2, width=48, height=48)
    assert len(views) == 2
    a, b = views[0][1], views[1][1]
    assert a.sum() > 20 and b.sum() > 20
    assert (a != b).sum() > 10       # different silhouettes across views


def test_png_roundtrip_rgb_and_gray():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (21, 17, 3), np.uint8)
    gray = rng.integers(0, 256, (9, 33), np.uint8)
    assert png_bytes(rgb)[:8] == b"\x89PNG\r\n\x1a\n"
    import tempfile
    import pathlib
    with tempfile.TemporaryDirectory() as d:
        p = pathlib.Path(d) / "x.png"
        write_png(p, rgb)
        np.testing.assert_array_equal(read_png(p), rgb)
        write_png(p, gray)
        np.testing.assert_array_equal(read_png(p), gray)
