"""Conditional diffusion (BASELINE config 4): class-conditional sampling,
classifier-free guidance, partial-SDF conditioning, and the UNet denoiser
variant — each verified on separable toy latent distributions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from latent_diffusion_models_for_shape_sdfs_tpu.config import (
    DiffConfig, DenoiserConfig)
from latent_diffusion_models_for_shape_sdfs_tpu.diffusion import (
    DiffusionSchedule, ddim_sample)
from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.sampler import (
    guided_denoise_fn)
from latent_diffusion_models_for_shape_sdfs_tpu.models.denoiser import (
    CondDenoiser, LatentDenoiserUNet, PartialSdfEncoder)
from latent_diffusion_models_for_shape_sdfs_tpu.train.diffusion import (
    train_diffusion, unnormalize_codes)

L = 4


def _two_class_codes(rng):
    a = rng.normal(-3, 0.1, size=(300, L))
    b = rng.normal(3, 0.1, size=(300, L))
    codes = np.concatenate([a, b]).astype(np.float32)
    class_ids = np.concatenate([np.zeros(300), np.ones(300)]).astype(np.int32)
    return codes, class_ids


def test_class_conditional_sampling():
    rng = np.random.default_rng(0)
    codes, class_ids = _two_class_codes(rng)
    cfg = DiffConfig(
        denoiser=DenoiserConfig(latent_size=L, hidden_dim=128, num_blocks=2,
                                time_embed_dim=32, num_classes=2,
                                cond_drop_prob=0.1),
        timesteps=100, batch_size=128, lr=2e-3, num_steps=4000,
        scan_chunk=500, seed=0)
    model, state, (mu, sigma), loss = train_diffusion(cfg, codes,
                                                      class_ids=class_ids)
    assert loss < 0.4, loss
    sch = DiffusionSchedule.create(cfg.timesteps)
    for cls, center in ((0, -3.0), (1, 3.0)):
        cid = jnp.full((64,), cls, jnp.int32)
        fn = guided_denoise_fn(model.apply, state.ema_params, 0.0,
                               class_id=cid)
        zn = ddim_sample(fn, sch, jax.random.PRNGKey(cls + 1), 64, L,
                         steps=50)
        z = np.asarray(unnormalize_codes(zn, mu, sigma))
        m = z.mean(axis=1)
        # plain conditional leaks a little mass cross-mode at high noise;
        # CFG below is the sharp version
        frac_correct = np.mean(np.abs(m - center) < 1.5)
        assert frac_correct > 0.75, (cls, m)

    # classifier-free guidance sharpens class adherence
    cid = jnp.zeros((64,), jnp.int32)
    fn_g = guided_denoise_fn(model.apply, state.ema_params, 2.0,
                             class_id=cid)
    zg = np.asarray(unnormalize_codes(
        ddim_sample(fn_g, sch, jax.random.PRNGKey(9), 64, L, steps=50),
        mu, sigma))
    assert np.mean(np.abs(zg.mean(axis=1) + 3) < 1.5) > 0.95


def test_partial_sdf_conditional_sampling():
    """Codes correlate with observation banks; conditioning on a shape's
    observations must steer samples toward that shape's latent mode."""
    rng = np.random.default_rng(1)
    codes, class_ids = _two_class_codes(rng)
    n = len(codes)
    # observation bank: mode A sees points on a small sphere (r=0.3),
    # mode B on a large one (r=0.7) — distinguishable point sets
    npts = 64
    obs_xyz = np.empty((n, npts, 3), np.float32)
    obs_sdf = np.empty((n, npts), np.float32)
    for i in range(n):
        r = 0.3 if class_ids[i] == 0 else 0.7
        dirs = rng.normal(size=(npts, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        radii = rng.uniform(0, 1, npts)[:, None]
        pts = dirs * radii
        obs_xyz[i] = pts
        obs_sdf[i] = np.linalg.norm(pts, axis=1) - r
    cfg = DiffConfig(
        denoiser=DenoiserConfig(latent_size=L, hidden_dim=128, num_blocks=2,
                                time_embed_dim=32, partial_sdf_cond=True,
                                partial_points=npts, cond_drop_prob=0.1),
        timesteps=100, batch_size=64, lr=2e-3, ema_decay=0.99,
        num_steps=1200, scan_chunk=400, seed=0)
    model, state, (mu, sigma), loss = train_diffusion(
        cfg, codes, obs_xyz=obs_xyz, obs_sdf=obs_sdf)
    assert loss < 0.5, loss
    sch = DiffusionSchedule.create(cfg.timesteps)
    for idx, center in ((0, -3.0), (n - 1, 3.0)):
        ox = jnp.broadcast_to(jnp.asarray(obs_xyz[idx]), (32, npts, 3))
        od = jnp.broadcast_to(jnp.asarray(obs_sdf[idx]), (32, npts))
        fn = guided_denoise_fn(model.apply, state.ema_params, 0.0,
                               obs_xyz=ox, obs_sdf=od)
        zn = ddim_sample(fn, sch, jax.random.PRNGKey(idx + 3), 32, L,
                         steps=20)
        z = np.asarray(unnormalize_codes(zn, mu, sigma))
        frac = np.mean(np.abs(z.mean(axis=1) - center) < 1.5)
        assert frac > 0.8, (idx, z.mean(axis=1))


def test_unet_denoiser_trains():
    rng = np.random.default_rng(2)
    Lu = 32  # unet reshapes to (tokens, ch); needs latent % tokens == 0
    a = rng.normal(-2, 0.15, size=(200, Lu))
    b = rng.normal(2, 0.15, size=(200, Lu))
    codes = np.concatenate([a, b]).astype(np.float32)
    # ema_decay 0.98: at this step budget the default 0.999 EMA is still
    # mostly init weights and sampling reads pure noise — the fit is
    # fine (loss ~0.12), the average was stale. Distribution-level UNet
    # evidence at real scale lives in the 6k sweep (SCALE.md).
    cfg = DiffConfig(
        denoiser=DenoiserConfig(arch="unet", latent_size=Lu, hidden_dim=64,
                                time_embed_dim=32),
        timesteps=100, batch_size=32, lr=3e-3, ema_decay=0.98,
        num_steps=600, scan_chunk=300, seed=0)
    model, state, (mu, sigma), loss = train_diffusion(cfg, codes)
    assert loss < 0.5, loss
    sch = DiffusionSchedule.create(cfg.timesteps)
    fn = lambda z, t: model.apply({"params": state.ema_params}, z, t)
    z = np.asarray(unnormalize_codes(
        ddim_sample(fn, sch, jax.random.PRNGKey(5), 32, Lu, steps=20),
        mu, sigma))
    m = z.mean(axis=1)
    assert np.mean((np.abs(m + 2) < 1.0) | (np.abs(m - 2) < 1.0)) > 0.8


def test_partial_encoder_permutation_invariant():
    enc = PartialSdfEncoder(features=32)
    rng = np.random.default_rng(3)
    xyz = jnp.asarray(rng.normal(size=(2, 16, 3)).astype(np.float32))
    sdf = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), xyz, sdf)["params"]
    out1 = enc.apply({"params": params}, xyz, sdf)
    perm = rng.permutation(16)
    out2 = enc.apply({"params": params}, xyz[:, perm], sdf[:, perm])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5, atol=1e-6)
