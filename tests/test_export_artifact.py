"""AOT serving artifact: export -> serialize -> reload -> identical
payloads/meshes as the live serving path (no model code at load time)."""

import numpy as np
import jax.numpy as jnp

import pytest

from latent_diffusion_models_for_shape_sdfs_tpu.export_artifact import (
    CapacityExceeded, export_decode_program, load_decode_program)
from latent_diffusion_models_for_shape_sdfs_tpu.serve import serve_meshes


def sphere_apply(z, xyz):
    return jnp.sqrt(jnp.sum(xyz * xyz, axis=-1)) - (0.3 + 0.1 * z[0])


CAPS = (64, 1024, 4096)


def test_roundtrip_matches_live_serving(tmp_path):
    blob = export_decode_program(sphere_apply, latent_size=2, res=64,
                                 caps=CAPS, path=tmp_path / "dec.zip")
    assert (tmp_path / "dec.zip").stat().st_size == len(blob)
    art = load_decode_program(tmp_path / "dec.zip")
    assert art.meta["res"] == 64 and art.meta["cap2"] == 1024

    z = np.asarray([0.7, 0.0], np.float32)
    v_art, f_art = art.mesh(z)
    (v_live, f_live, _st) = next(iter(serve_meshes(
        sphere_apply, [z], res=64, caps=CAPS)))
    np.testing.assert_array_equal(v_art, v_live)
    np.testing.assert_array_equal(f_art, f_live)


def test_artifact_needs_no_model_code(tmp_path):
    # decoder params are constants in the artifact: a fresh loader with a
    # DIFFERENT apply_fn in scope still reproduces the exported shape
    blob = export_decode_program(sphere_apply, 2, 64, CAPS)
    art = load_decode_program(blob)
    g = art.grid(np.asarray([0.0, 0.0], np.float32))
    r = 0.3
    # center voxel inside, corner far outside (int8 payload clamps
    # far-field magnitudes to tau2 — sign is what marching cubes needs)
    assert g[32, 32, 32] < 0
    assert g[0, 0, 0] > 0.1
    # surface radius about right via the zero level on the x axis
    xs = np.linspace(-1, 1, 64)
    row = g[:, 32, 32]
    cross = np.where(np.sign(row[:-1]) != np.sign(row[1:]))[0]
    assert len(cross) == 2
    assert abs(abs(xs[cross[0]]) - r) < 0.06


def test_artifact_overflow_raises_not_truncates():
    # The AOT program has static caps and cannot escalate; a latent whose
    # surface shell overflows them must raise, not silently drop geometry
    # (ADVICE r2, severity medium).
    blob = export_decode_program(sphere_apply, 2, 64, (8, 64, 256))
    art = load_decode_program(blob)
    z = np.asarray([1.0, 0.0], np.float32)  # big sphere, overflows caps
    with pytest.raises(CapacityExceeded):
        art.grid(z)
    with pytest.raises(CapacityExceeded):
        art.mesh(z)
    # explicit opt-out still returns the truncated grid
    g = art.grid(z, check_capacity=False)
    assert g.shape == (64, 64, 64)
