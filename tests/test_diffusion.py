"""Diffusion statistical tests (SURVEY.md s4.4): schedule closed forms,
q_sample marginals, DDIM determinism, and a toy 2-Gaussian train->sample
distribution check."""

import numpy as np
import jax
import jax.numpy as jnp

from latent_diffusion_models_for_shape_sdfs_tpu.config import (
    DiffConfig, DenoiserConfig)
from latent_diffusion_models_for_shape_sdfs_tpu.diffusion import (
    DiffusionSchedule, ddim_sample, ddpm_sample)
from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.sampler import (
    ddim_timesteps)
from latent_diffusion_models_for_shape_sdfs_tpu.train.diffusion import (
    train_diffusion, normalize_codes, unnormalize_codes)


def test_schedule_closed_forms():
    s = DiffusionSchedule.create(1000, 1e-4, 0.02)
    assert s.betas.shape == (1000,)
    np.testing.assert_allclose(float(s.betas[0]), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s.betas[-1]), 0.02, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.alpha_bars),
                               np.cumprod(1 - np.asarray(s.betas)), rtol=1e-5)
    np.testing.assert_allclose(float(s.alpha_bars_prev[0]), 1.0)
    # abar decays monotonically to ~0
    ab = np.asarray(s.alpha_bars)
    assert np.all(np.diff(ab) < 0) and ab[-1] < 1e-4


def test_q_sample_marginals():
    s = DiffusionSchedule.create(100)
    key = jax.random.PRNGKey(0)
    z0 = jnp.full((20000, 4), 2.0)
    t = jnp.full((20000,), 50, jnp.int32)
    eps = jax.random.normal(key, z0.shape)
    zt = np.asarray(s.q_sample(z0, t, eps))
    abar = float(s.alpha_bars[50])
    np.testing.assert_allclose(zt.mean(), 2.0 * np.sqrt(abar), atol=0.02)
    np.testing.assert_allclose(zt.std(), np.sqrt(1 - abar), atol=0.02)


def test_ddim_timestep_subsequence():
    ts = np.asarray(ddim_timesteps(1000, 50))
    assert ts.shape == (50,) and ts[0] == 0 and ts[-1] == 980
    assert np.all(np.diff(ts) == 20)


def test_ddim_deterministic_ddpm_not():
    s = DiffusionSchedule.create(50)
    fn = lambda z, t: 0.1 * z  # arbitrary fixed denoiser
    a = np.asarray(ddim_sample(fn, s, jax.random.PRNGKey(7), 4, 8, steps=10))
    b = np.asarray(ddim_sample(fn, s, jax.random.PRNGKey(7), 4, 8, steps=10))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(ddpm_sample(fn, s, jax.random.PRNGKey(7), 4, 8))
    d = np.asarray(ddpm_sample(fn, s, jax.random.PRNGKey(8), 4, 8))
    assert not np.allclose(c, d)


def test_normalize_roundtrip():
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.normal(3, 2.5, size=(500, 16)).astype(np.float32))
    zn, mu, sigma = normalize_codes(codes)
    np.testing.assert_allclose(np.asarray(zn).mean(0), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(zn).std(0), 1, atol=1e-3)
    back = unnormalize_codes(zn, mu, sigma)
    np.testing.assert_allclose(np.asarray(back), np.asarray(codes),
                               rtol=1e-5, atol=1e-5)


def test_cosine_lr_schedule_trains():
    """lr_schedule="cosine" must build a consistent optimizer between
    init_diff_state and the scan (shared make_diff_tx) and still fit the
    toy problem."""
    from latent_diffusion_models_for_shape_sdfs_tpu.train.diffusion import (
        make_diff_tx)
    import optax
    cfg = DiffConfig(denoiser=DenoiserConfig(latent_size=4, hidden_dim=32,
                                             num_blocks=1,
                                             time_embed_dim=16),
                     timesteps=50, batch_size=64, lr=2e-3,
                     lr_schedule="cosine", warmup_steps=100,
                     num_steps=600, scan_chunk=200, seed=0)
    tx = make_diff_tx(cfg)
    assert isinstance(tx, optax.GradientTransformation)
    rng = np.random.default_rng(2)
    codes = rng.normal(0, 1, size=(200, 4)).astype(np.float32)
    _model, state, _, loss = train_diffusion(cfg, codes)
    assert int(state.step) == 600
    assert np.isfinite(loss)


def test_zca_whitening_roundtrip():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    from diff_sweep import zca
    rng = np.random.default_rng(3)
    # strongly correlated codes
    base = rng.normal(size=(400, 8))
    mix = rng.normal(size=(8, 16))
    codes = (base @ mix + rng.normal(2.0, 0.05, size=16)).astype(np.float32)
    w, mu, W, W_inv = zca(codes)
    cov = np.cov(w.T)
    # whitened covariance ~ identity on the signal subspace (rank 8);
    # regularized tail stays bounded
    assert abs(np.diag(cov).max() - 1.0) < 0.2
    back = w @ W_inv + mu
    np.testing.assert_allclose(back, codes, atol=1e-2)


def test_toy_two_gaussian_train_and_sample():
    """Train on codes from two separated Gaussians; DDPM samples must land
    near the two modes with both modes represented."""
    rng = np.random.default_rng(1)
    L = 4
    a = rng.normal(-3, 0.1, size=(300, L))
    b = rng.normal(3, 0.1, size=(300, L))
    codes = np.concatenate([a, b]).astype(np.float32)
    cfg = DiffConfig(denoiser=DenoiserConfig(latent_size=L, hidden_dim=128,
                                             num_blocks=2, time_embed_dim=32),
                     timesteps=100, batch_size=128, lr=2e-3,
                     num_steps=1500, scan_chunk=300, seed=0)
    model, state, (mu, sigma), loss = train_diffusion(cfg, codes)
    assert loss < 0.35, f"toy diffusion failed to fit: loss={loss}"
    s = DiffusionSchedule.create(cfg.timesteps)
    fn = lambda z, t: model.apply({"params": state.ema_params}, z, t)
    zn = ddpm_sample(fn, s, jax.random.PRNGKey(3), 64, L)
    z = np.asarray(unnormalize_codes(zn, mu, sigma))
    m = z.mean(axis=1)
    near_a = np.abs(m + 3) < 1.2
    near_b = np.abs(m - 3) < 1.2
    assert (near_a | near_b).mean() > 0.9, m
    assert near_a.sum() > 5 and near_b.sum() > 5
