"""Flagship integration test — BASELINE config 1 in miniature
(BASELINE.json:7): overfit the auto-decoder on one analytic shape, decode a
dense SDF grid, extract the mesh, and bound the Chamfer-L2 against exact
surface samples. Exercises every layer of the stage-1 pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from latent_diffusion_models_for_shape_sdfs_tpu.config import (
    AdConfig, DecoderConfig)
from latent_diffusion_models_for_shape_sdfs_tpu.data import (
    analytic, SdfDataset)
from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import SdfDecoder
from latent_diffusion_models_for_shape_sdfs_tpu.train.auto_decoder import (
    train_auto_decoder)
from latent_diffusion_models_for_shape_sdfs_tpu.ops import (
    decode_grid, extract_mesh)
from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
    flax_apply_fn)
from latent_diffusion_models_for_shape_sdfs_tpu.evaluation import (
    chamfer_l2, sample_mesh_surface)


@pytest.fixture(scope="module")
def trained():
    cfg = AdConfig(
        decoder=DecoderConfig(latent_size=16, hidden_dim=64, num_layers=4,
                              latent_in=(2,), use_dropout=False),
        num_scenes=1, scenes_per_batch=1, samples_per_scene=4096,
        num_epochs=300, lr_decoder=1e-3, lr_latent=2e-3,
        # clamp_dist wider than canonical 0.1: at this miniature width the
        # torch-default init saturates |pred| > 0.1 everywhere and the clamp
        # (correctly, per pinned semantics) zeroes all decoder grads.
        clamp_dist=0.5,
        lr_decay_interval=150, seed=0, snapshot_every=0)
    shape = {"type": "sphere", "r": 0.5}
    ds = SdfDataset.from_analytic([dict(shape, class_id=0)],
                                  samples_per_shape=30_000, seed=0)
    decoder, state, metrics = train_auto_decoder(cfg, ds)
    return cfg, shape, decoder, state, metrics


def test_overfit_loss_low(trained):
    _, _, _, _, metrics = trained
    assert float(metrics["loss_l1"]) < 0.01, metrics


def test_sdf_pointwise_accuracy(trained):
    cfg, shape, decoder, state, _ = trained
    rng = np.random.default_rng(5)
    xyz, gt = analytic.sample_sdf_points(shape, 2000, rng)
    z = jnp.broadcast_to(state.codes[0], (2000, cfg.decoder.latent_size))
    pred = np.asarray(decoder.apply({"params": state.params}, z,
                                    jnp.asarray(xyz), train=False))
    err = np.abs(np.clip(pred, -0.1, 0.1) - np.clip(gt, -0.1, 0.1))
    assert np.median(err) < 0.01
    assert err.mean() < 0.02


def test_mesh_chamfer(trained):
    cfg, shape, decoder, state, _ = trained
    res = 48
    apply_fn = flax_apply_fn(decoder, state.params)
    grid = np.asarray(decode_grid(apply_fn, state.codes[0], res, chunk=16384))
    verts, faces = extract_mesh(grid)
    assert len(faces) > 100
    pred_pts = sample_mesh_surface(verts, faces, 10_000, seed=0)
    gt_pts = analytic.sample_surface(shape, 10_000,
                                     np.random.default_rng(6))
    ch = chamfer_l2(pred_pts, gt_pts)
    # squared-distance metric; grid h ~= 0.043 -> surface error well under h
    assert ch < 2e-3, f"chamfer {ch}"
