"""Amortized latent encoder (models/encoder.py, train/encoder.py).

Covers: permutation invariance + masking of the set encoder, the
zero-init mean-prediction property, amortized training actually
regressing a latent table from observation subsets, and the
`reconstruct_latent(z_init=...)` warm-start contract.
"""

import jax
import jax.numpy as jnp
import numpy as np

from latent_diffusion_models_for_shape_sdfs_tpu.config import (
    DecoderConfig, EncConfig, EncoderConfig, ReconstructConfig)
from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import (
    SdfDecoder)
from latent_diffusion_models_for_shape_sdfs_tpu.models.encoder import (
    LatentEncoder, encode_latent)
from latent_diffusion_models_for_shape_sdfs_tpu.reconstruct import (
    reconstruct_latent)
from latent_diffusion_models_for_shape_sdfs_tpu.train.encoder import (
    train_encoder)

TINY = EncoderConfig(latent_size=8, point_widths=(16, 32),
                     head_widths=(32,))


def _obs(key, b=2, n=64):
    kx, kd = jax.random.split(key)
    xyz = jax.random.uniform(kx, (b, n, 3), minval=-1, maxval=1)
    sdf = jax.random.normal(kd, (b, n)) * 0.1
    return xyz, sdf


def test_permutation_invariance():
    enc = LatentEncoder(TINY)
    params = enc.init_params(jax.random.PRNGKey(0))
    # zero-init head would hide permutation bugs — perturb the out layer
    params = jax.tree.map(
        lambda p: p + 0.05 * jnp.ones_like(p), params)
    xyz, sdf = _obs(jax.random.PRNGKey(1))
    z = enc.apply({"params": params}, xyz, sdf)
    perm = jax.random.permutation(jax.random.PRNGKey(2), xyz.shape[1])
    z_p = enc.apply({"params": params}, xyz[:, perm], sdf[:, perm])
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_p),
                               rtol=1e-5, atol=1e-5)


def test_mask_drops_points():
    enc = LatentEncoder(TINY)
    params = jax.tree.map(
        lambda p: p + 0.05 * jnp.ones_like(p),
        enc.init_params(jax.random.PRNGKey(0)))
    xyz, sdf = _obs(jax.random.PRNGKey(1), b=1, n=64)
    # masking the second half == feeding only the first half
    mask = jnp.arange(64) < 32
    z_masked = enc.apply({"params": params}, xyz, sdf,
                         mask=mask[None, :])
    z_half = enc.apply({"params": params}, xyz[:, :32], sdf[:, :32])
    np.testing.assert_allclose(np.asarray(z_masked), np.asarray(z_half),
                               rtol=1e-5, atol=1e-5)


def test_zero_init_predicts_normalized_mean():
    enc = LatentEncoder(TINY)
    params = enc.init_params(jax.random.PRNGKey(0))
    xyz, sdf = _obs(jax.random.PRNGKey(1))
    z = enc.apply({"params": params}, xyz, sdf)
    np.testing.assert_array_equal(np.asarray(z), 0.0)


def test_train_encoder_learns_table():
    # 16 distinguishable "scenes": spheres of varying radius; codes on a
    # smooth 1-D manifold of the radius (a real latent table is smooth
    # in shape parameters too). The encoder must map observation subsets
    # of scene i to code i — pure amortized regression, no decoder.
    S, P, L = 16, 256, 8
    rng = np.random.default_rng(0)
    radii = np.linspace(0.3, 0.9, S)
    xyz = rng.uniform(-1, 1, (S, P, 3)).astype(np.float32)
    sdf = (np.linalg.norm(xyz, axis=-1)
           - radii[:, None]).astype(np.float32)
    w1, w0 = rng.normal(size=(L,)), rng.normal(size=(L,))
    codes = (radii[:, None] * w1 + w0).astype(np.float32)
    cfg = EncConfig(encoder=TINY, n_obs=64, batch_scenes=8,
                    num_steps=400, scan_chunk=200, lr=3e-3,
                    lr_schedule="constant", seed=0)
    model, state, (mu, sigma), loss = train_encoder(
        cfg, jnp.asarray(codes), xyz, sdf)
    # normalized targets have unit variance -> untrained MSE ~= 1
    assert loss < 0.15, loss
    # encode_latent round-trips through mu/sigma into table space
    z0 = encode_latent(model, state.params, jnp.asarray(xyz[0]),
                       jnp.asarray(sdf[0]), mu, sigma)
    err = float(jnp.mean(jnp.square(z0 - codes[0])))
    base = float(jnp.mean(jnp.square(codes - codes.mean(0))))
    assert err < 0.5 * base, (err, base)


def test_reconstruct_z_init_warm_start():
    dec = SdfDecoder(DecoderConfig(latent_size=8, hidden_dim=16,
                                   num_layers=3, latent_in=(2,),
                                   use_dropout=False))
    params = dec.init_params(jax.random.PRNGKey(0))
    obs_xyz = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, (32, 3)), jnp.float32)
    obs_sdf = jnp.zeros((32,), jnp.float32)
    z_init = jnp.arange(8, dtype=jnp.float32) * 0.1
    # lr=0: the optimizer never moves, so the returned latent must be
    # exactly the warm start (pins the z_init plumbing bit-for-bit)
    cfg = ReconstructConfig(num_steps=2, lr=0.0, num_inits=1)
    z, info = reconstruct_latent(dec, params, obs_xyz, obs_sdf, cfg,
                                 z_init=z_init)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z_init))
    # restart 0 of a multi-init run also starts exactly at z_init
    cfg3 = ReconstructConfig(num_steps=2, lr=0.0, num_inits=3,
                             init_std=10.0)
    z3, _ = reconstruct_latent(dec, params, obs_xyz, obs_sdf, cfg3,
                               z_init=z_init)
    assert np.isfinite(np.asarray(z3)).all()


def test_snapshots_fire_when_chunk_does_not_divide_interval():
    # scan_chunk=300, snapshot_every=500: divisibility would fire only
    # at multiples of both; threshold-crossing must fire near 500 (at
    # 600) and at the final step.
    S, P, L = 4, 64, 8
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1, 1, (S, P, 3)).astype(np.float32)
    sdf = rng.normal(size=(S, P)).astype(np.float32) * 0.1
    codes = rng.normal(size=(S, L)).astype(np.float32)
    cfg = EncConfig(encoder=TINY, n_obs=16, batch_scenes=2,
                    num_steps=900, scan_chunk=300, lr=1e-3,
                    lr_schedule="constant", snapshot_every=500, seed=0)
    seen = []
    train_encoder(cfg, jnp.asarray(codes), xyz, sdf,
                  checkpoint_fn=lambda step, st, mu, sigma:
                  seen.append(step))
    assert 600 in seen and 900 in seen, seen


def test_enc_bank_device_path_for_chairs(tmp_path):
    # pipeline._enc_bank must generate the analytic:chairs observation
    # bank on device (no host-built ~400 MB upload at scale) and its SDF
    # labels must agree with the host analytic oracle.
    from latent_diffusion_models_for_shape_sdfs_tpu.config import (
        ExperimentConfig, override)
    from latent_diffusion_models_for_shape_sdfs_tpu.data import analytic
    from latent_diffusion_models_for_shape_sdfs_tpu.pipeline import (
        _enc_bank, build_dataset)

    cfg = override(ExperimentConfig(data_source="analytic:chair"),
                   **{"ad.num_scenes": 3, "encoder.obs_bank_points": 128})
    obs_xyz, obs_sdf = _enc_bank(cfg, build_dataset(cfg))
    assert isinstance(obs_xyz, jnp.ndarray)  # device arrays, not numpy
    assert obs_xyz.shape == (3, 128, 3) and obs_sdf.shape == (3, 128)
    shapes = analytic.make_synthetic_split("chair", 3, seed=cfg.ad.seed)
    for i in range(3):
        want = analytic.sdf(shapes[i], np.asarray(obs_xyz[i]))
        np.testing.assert_allclose(np.asarray(obs_sdf[i]), want,
                                   atol=5e-4)
