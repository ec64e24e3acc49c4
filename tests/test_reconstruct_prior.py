"""Diffusion-prior latent reconstruction (reconstruct.py
reconstruct_latent_diffusion_prior): exact parity with the plain MAP
path at sds_weight=0, and — on the closed-form optimal Gaussian
denoiser — the score-distillation prior pulling an under-observed
reconstruction toward the learned latent distribution instead of
toward 0 (the round-2 held-out over-completion failure mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from latent_diffusion_models_for_shape_sdfs_tpu.config import (
    DecoderConfig, ReconstructConfig)
from latent_diffusion_models_for_shape_sdfs_tpu.diffusion import (
    DiffusionSchedule)
from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import (
    SdfDecoder)
from latent_diffusion_models_for_shape_sdfs_tpu.reconstruct import (
    reconstruct_latent, reconstruct_latent_diffusion_prior)


def _tiny_decoder():
    decoder = SdfDecoder(DecoderConfig(
        latent_size=8, hidden_dim=32, num_layers=3, latent_in=(),
        use_dropout=False))
    params = decoder.init_params(jax.random.PRNGKey(0))
    return decoder, params


def _gaussian_denoiser(schedule, mu, s2):
    """Optimal eps-predictor for code data ~ N(mu, s2*I) (same closed
    form as tests/test_dpm_solver.py)."""
    abar = schedule.alpha_bars

    def fn(z, t):
        a = abar[t][:, None]
        return jnp.sqrt(1 - a) * (z - jnp.sqrt(a) * mu) / (a * s2 + 1 - a)

    return fn


def test_sds_weight_zero_is_exact_map_parity():
    decoder, params = _tiny_decoder()
    rng = np.random.default_rng(7)
    xyz = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
    sdf = jnp.asarray(rng.uniform(-0.2, 0.2, 64), jnp.float32)
    cfg = ReconstructConfig(num_steps=60, num_inits=3)
    sched = DiffusionSchedule.create(50)
    fn = _gaussian_denoiser(sched, jnp.zeros(8), 1.0)
    z_plain, info_p = reconstruct_latent(decoder, params, xyz, sdf, cfg)
    z_sds0, info_s = reconstruct_latent_diffusion_prior(
        decoder, params, xyz, sdf, fn, sched,
        jnp.zeros(8), jnp.ones(8), cfg, sds_weight=0.0)
    np.testing.assert_array_equal(np.asarray(z_plain), np.asarray(z_sds0))
    assert info_p["l1_last"] == info_s["l1_last"]


def test_sds_prior_pulls_toward_code_distribution():
    decoder, params = _tiny_decoder()
    # target latent = the mode of the "learned" code distribution; the
    # observation set is TINY (6 points), so the data term alone leaves
    # the latent badly under-determined.
    z_target = 0.6 * jnp.ones(8, jnp.float32)
    mu_code, sigma_code = z_target, 0.05 * jnp.ones(8, jnp.float32)
    rng = np.random.default_rng(3)
    xyz = jnp.asarray(rng.uniform(-1, 1, (6, 3)), jnp.float32)
    sdf = decoder.apply({"params": params},
                        jnp.broadcast_to(z_target, (6, 8)), xyz,
                        train=False)
    sched = DiffusionSchedule.create(100)
    # denoiser sees NORMALIZED codes: distribution there is N(0, I)
    fn = _gaussian_denoiser(sched, jnp.zeros(8), 1.0)
    cfg = ReconstructConfig(num_steps=400, lr_decay_at=200, num_inits=2)
    z_plain, _ = reconstruct_latent(decoder, params, xyz, sdf, cfg)
    for anneal in (True, False):
        z_sds, _ = reconstruct_latent_diffusion_prior(
            decoder, params, xyz, sdf, fn, sched, mu_code, sigma_code,
            cfg, sds_weight=2e-3, anneal=anneal)
        d_plain = float(jnp.linalg.norm(z_plain - z_target))
        d_sds = float(jnp.linalg.norm(z_sds - z_target))
        # the diffusion prior must land decisively closer to the
        # distribution mode than the isotropic-Gaussian MAP prior does
        assert d_sds < 0.5 * d_plain, (anneal, d_sds, d_plain)
        # and still fit the observations about as well
        pred = decoder.apply({"params": params},
                             jnp.broadcast_to(z_sds, (6, 8)), xyz,
                             train=False)
        assert float(jnp.mean(jnp.abs(pred - sdf))) < 0.05
