"""DPM-Solver++(2M) sampler (diffusion/sampler.py dpm_solver_sample):
determinism, 2nd-order ODE accuracy against a fine DDIM reference on a
closed-form optimal denoiser, and mode coverage on the trained toy."""

import jax
import jax.numpy as jnp
import numpy as np

from latent_diffusion_models_for_shape_sdfs_tpu.diffusion import (
    DiffusionSchedule)
from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.sampler import (
    ddim_sample, dpm_solver_sample)


def _gaussian_denoiser(schedule, mu, s2):
    """Exact eps-predictor for data ~ N(mu, s2*I): z_t marginals are
    N(sqrt(abar)*mu, (abar*s2 + 1-abar) I), so the optimal eps is
    sqrt(1-abar) * (z - sqrt(abar) mu) / (abar*s2 + 1-abar)."""
    abar = schedule.alpha_bars

    def fn(z, t):
        a = abar[t][:, None]
        return jnp.sqrt(1 - a) * (z - jnp.sqrt(a) * mu) / (a * s2 + 1 - a)

    return fn


def test_dpm_deterministic_and_shape():
    s = DiffusionSchedule.create(100)
    fn = lambda z, t: 0.1 * z
    a = np.asarray(dpm_solver_sample(fn, s, jax.random.PRNGKey(7), 4, 8,
                                     steps=10))
    b = np.asarray(dpm_solver_sample(fn, s, jax.random.PRNGKey(7), 4, 8,
                                     steps=10))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (4, 8)
    c = np.asarray(dpm_solver_sample(fn, s, jax.random.PRNGKey(8), 4, 8,
                                     steps=10))
    assert not np.allclose(a, c)


def test_dpm_second_order_beats_ddim_at_equal_steps():
    """Both samplers integrate the same probability-flow ODE from the
    same z_T. With the exact Gaussian-data denoiser, DDIM-400 is the
    reference trajectory; DPM-10 must land much closer to it than
    DDIM-10 does (2nd order vs 1st order), and close in absolute terms."""
    T = 1000
    s = DiffusionSchedule.create(T)
    mu = jnp.asarray([1.5, -0.5, 0.25, 0.0], jnp.float32)
    fn = _gaussian_denoiser(s, mu, 0.04)
    key = jax.random.PRNGKey(11)
    ref = np.asarray(ddim_sample(fn, s, key, 256, 4, steps=400))
    ddim10 = np.asarray(ddim_sample(fn, s, key, 256, 4, steps=10))
    dpm10 = np.asarray(dpm_solver_sample(fn, s, key, 256, 4, steps=10))
    err_ddim = np.linalg.norm(ddim10 - ref, axis=1).mean()
    err_dpm = np.linalg.norm(dpm10 - ref, axis=1).mean()
    assert err_dpm < 0.5 * err_ddim, (err_dpm, err_ddim)
    assert err_dpm < 0.05, err_dpm
    # the samples actually come from ~N(mu, s2): mean within stderr-ish
    assert np.abs(dpm10.mean(axis=0) - np.asarray(mu)).max() < 0.1


def test_dpm_modes_on_trained_toy():
    """10-step DPM on the trained two-Gaussian toy covers both modes —
    the few-step sampler is usable as a drop-in for DDIM-50."""
    from latent_diffusion_models_for_shape_sdfs_tpu.config import (
        DenoiserConfig, DiffConfig)
    from latent_diffusion_models_for_shape_sdfs_tpu.train.diffusion import (
        train_diffusion, unnormalize_codes)
    rng = np.random.default_rng(1)
    L = 4
    codes = np.concatenate([
        rng.normal(-3, 0.1, size=(300, L)),
        rng.normal(3, 0.1, size=(300, L))]).astype(np.float32)
    cfg = DiffConfig(denoiser=DenoiserConfig(latent_size=L, hidden_dim=128,
                                             num_blocks=2,
                                             time_embed_dim=32),
                     timesteps=100, batch_size=128, lr=2e-3,
                     num_steps=1500, scan_chunk=300, seed=0)
    model, state, (mu, sigma), loss = train_diffusion(cfg, codes)
    s = DiffusionSchedule.create(cfg.timesteps)
    fn = lambda z, t: model.apply({"params": state.ema_params}, z, t)
    zn = dpm_solver_sample(fn, s, jax.random.PRNGKey(3), 64, L, steps=10)
    z = np.asarray(unnormalize_codes(zn, mu, sigma))
    m = z.mean(axis=1)
    near_a = np.abs(m + 3) < 1.2
    near_b = np.abs(m - 3) < 1.2
    assert (near_a | near_b).mean() > 0.9, m
    assert near_a.sum() > 5 and near_b.sum() > 5
