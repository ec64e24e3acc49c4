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


def _toy_denoise_fn():
    # a fixed affine "denoiser": enough to prove program capture —
    # determinism and artifact==live equality don't need a trained net
    w = jnp.asarray(np.random.default_rng(0).normal(
        0, 0.1, size=(8, 8)).astype(np.float32))

    def fn(z, t):
        return z @ w + 0.01 * t[:, None].astype(jnp.float32)

    return fn


def test_sampler_artifact_roundtrip(tmp_path):
    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.schedule \
        import DiffusionSchedule
    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.sampler \
        import ddim_sample, dpm_solver_sample
    from latent_diffusion_models_for_shape_sdfs_tpu.export_artifact \
        import export_sampler_program, load_sampler_program
    import jax

    s = DiffusionSchedule.create(50)
    fn = _toy_denoise_fn()
    mu = np.full((8,), 0.5, np.float32)
    sigma = np.full((8,), 2.0, np.float32)
    rng = np.random.default_rng(3)
    z_T = rng.standard_normal((4, 8)).astype(np.float32)

    for sampler, live_fn, steps in (("ddim", ddim_sample, 10),
                                    ("dpm", dpm_solver_sample, 6)):
        blob = export_sampler_program(
            fn, s, 4, 8, steps=steps, sampler=sampler, mu=mu,
            sigma=sigma, path=tmp_path / f"{sampler}.zip")
        art = load_sampler_program(tmp_path / f"{sampler}.zip")
        assert art.meta["sampler"] == sampler
        assert art.meta["unnormalized"]
        out = art.sample(z_T)
        live = np.asarray(live_fn(fn, s, jax.random.PRNGKey(0), 4, 8,
                                  steps=steps,
                                  z_init=jnp.asarray(z_T)))
        np.testing.assert_array_equal(out, live * sigma + mu)
        assert len(blob) > 1000
    # shape guard + host-seed convenience draw
    with pytest.raises(ValueError):
        art.sample(np.zeros((2, 8), np.float32))
    out2 = art.sample_seed(7)
    assert out2.shape == (4, 8) and np.isfinite(out2).all()


def test_z_init_matches_internal_draw():
    # providing the key-drawn z_T explicitly reproduces the normal path
    import jax
    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.schedule \
        import DiffusionSchedule
    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.sampler \
        import ddim_sample, dpm_solver_sample
    s = DiffusionSchedule.create(50)
    fn = _toy_denoise_fn()
    key = jax.random.PRNGKey(5)
    _, k0 = jax.random.split(key)
    z_T = jax.random.normal(k0, (4, 8), jnp.float32)
    for live_fn in (ddim_sample, dpm_solver_sample):
        a = np.asarray(live_fn(fn, s, key, 4, 8, steps=8))
        b = np.asarray(live_fn(fn, s, key, 4, 8, steps=8, z_init=z_T))
        np.testing.assert_array_equal(a, b)


def test_int4_artifact_roundtrip():
    # bandwidth-mode payload through the AOT path: meta carries the
    # quant scale, grid/mesh dequant the packed nibbles correctly
    blob = export_decode_program(sphere_apply, 2, 64, CAPS,
                                 out_dtype="int4")
    art = load_decode_program(blob)
    assert art.meta["quant_scale"] is not None
    v, f = art.mesh(np.asarray([0.7, 0.0], np.float32))
    r = np.linalg.norm(v, axis=1)
    assert len(f) > 500 and np.abs(r - 0.37).max() < 0.05
