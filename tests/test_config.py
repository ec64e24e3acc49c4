"""Config round-trip, overrides, experiment layout, dataset contract."""

import numpy as np

from latent_diffusion_models_for_shape_sdfs_tpu.config import (
    AdConfig, DecoderConfig, ExperimentConfig, override, experiment_layout)
from latent_diffusion_models_for_shape_sdfs_tpu.data import (
    analytic, SdfDataset)
from latent_diffusion_models_for_shape_sdfs_tpu.utils import meshio


def test_experiment_config_json_roundtrip(tmp_path):
    cfg = ExperimentConfig(name="t",
                           ad=AdConfig(num_scenes=5,
                                       decoder=DecoderConfig(hidden_dim=128)))
    cfg.save(tmp_path)
    back = ExperimentConfig.load(tmp_path)
    assert back == cfg or (back.name == cfg.name
                           and back.ad.decoder.hidden_dim == 128
                           and back.ad.num_scenes == 5)


def test_override_dotted():
    cfg = AdConfig()
    out = override(cfg, num_scenes=9, **{"decoder.hidden_dim": 64})
    assert out.num_scenes == 9 and out.decoder.hidden_dim == 64
    assert cfg.num_scenes == 1  # original untouched (frozen)


def test_experiment_layout_keys(tmp_path):
    lay = experiment_layout(tmp_path)
    assert set(lay) >= {"specs", "checkpoints", "latents", "logs",
                        "reconstructions", "samples", "evals"}


def test_dataset_balanced_sampling():
    shapes = analytic.make_synthetic_split("sphere", 3, seed=0)
    ds = SdfDataset.from_analytic(shapes, samples_per_shape=5000, seed=0)
    rng = np.random.default_rng(0)
    b = ds.sample_scene_batch(rng, np.array([0, 1, 2]), 512)
    assert b.xyz.shape == (3, 512, 3) and b.sdf.shape == (3, 512)
    assert b.num_sdf_samples == 3 * 512
    # balanced: first half of each scene's draw is pos, second half neg
    assert np.all(b.sdf[:, :256] >= 0)
    assert np.all(b.sdf[:, 256:] < 0)


def test_dataset_epoch_batches_fixed_shape():
    shapes = analytic.make_synthetic_split("box", 5, seed=1)
    ds = SdfDataset.from_analytic(shapes, samples_per_shape=2000, seed=0)
    rng = np.random.default_rng(1)
    batches = list(ds.epoch_batches(rng, scenes_per_batch=2,
                                    samples_per_scene=128))
    assert len(batches) == 3  # ceil(5/2), tail padded
    for b in batches:
        assert b.xyz.shape == (2, 128, 3)


def test_meshio_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    verts = rng.normal(size=(10, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int64)
    meshio.write_obj(tmp_path / "m.obj", verts, faces)
    v2, f2 = meshio.read_obj(tmp_path / "m.obj")
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)
    meshio.write_ply(tmp_path / "m.ply", verts, faces)
    v3, f3 = meshio.read_ply_ascii(tmp_path / "m.ply")
    np.testing.assert_allclose(v3, verts, atol=1e-5)
    np.testing.assert_array_equal(f3, faces)
