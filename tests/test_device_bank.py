"""Device-resident sample bank: draw distribution + trainer integration."""

import numpy as np
import jax
import jax.numpy as jnp

from latent_diffusion_models_for_shape_sdfs_tpu.config import (
    AdConfig, DecoderConfig)
from latent_diffusion_models_for_shape_sdfs_tpu.data import (
    analytic, SdfDataset)
from latent_diffusion_models_for_shape_sdfs_tpu.data.device_bank import (
    DeviceSampleBank)


def test_bank_balanced_draw_matches_store():
    shapes = analytic.make_synthetic_split("sphere", 3, seed=0)
    ds = SdfDataset.from_analytic(shapes, samples_per_shape=4000, seed=0)
    bank = DeviceSampleBank.from_dataset(ds)
    ids = jnp.asarray([2, 0], jnp.int32)
    xyz, sdf = bank.sample_batch(jax.random.PRNGKey(0), ids, 512)
    assert xyz.shape == (2, 512, 3) and sdf.shape == (2, 512)
    sdf = np.asarray(sdf)
    # balanced: first half pos, second half neg (same contract as host draw)
    assert np.all(sdf[:, :256] >= 0)
    assert np.all(sdf[:, 256:] < 0)
    # every drawn row exists in the corresponding scene's store
    xyz = np.asarray(xyz)
    for b, scene in enumerate((2, 0)):
        store = np.concatenate([ds.pos[scene], ds.neg[scene]])[:, :3]
        d = np.min(np.linalg.norm(
            store[None, :, :] - xyz[b, :32, None, :], axis=-1), axis=1)
        assert np.max(d) < 1e-6


def test_bank_draws_differ_by_key():
    shapes = analytic.make_synthetic_split("box", 2, seed=1)
    ds = SdfDataset.from_analytic(shapes, samples_per_shape=2000, seed=0)
    bank = DeviceSampleBank.from_dataset(ds)
    ids = jnp.asarray([0, 1], jnp.int32)
    a, _ = bank.sample_batch(jax.random.PRNGKey(0), ids, 128)
    b, _ = bank.sample_batch(jax.random.PRNGKey(1), ids, 128)
    c, _ = bank.sample_batch(jax.random.PRNGKey(0), ids, 128)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_device_data_trainer_converges():
    from latent_diffusion_models_for_shape_sdfs_tpu.train import (
        train_auto_decoder)
    cfg = AdConfig(decoder=DecoderConfig(latent_size=16, hidden_dim=64,
                                         num_layers=3, latent_in=(2,),
                                         use_dropout=False),
                   num_scenes=2, scenes_per_batch=2, samples_per_scene=512,
                   num_epochs=60, clamp_dist=0.5, lr_decoder=2e-3,
                   lr_latent=4e-3, device_data=True, snapshot_every=0)
    ds = SdfDataset.from_analytic(
        analytic.make_synthetic_split("sphere", 2, 0), 8000, 0)
    _, state, m = train_auto_decoder(cfg, ds)
    assert float(m["loss_l1"]) < 0.05, m
