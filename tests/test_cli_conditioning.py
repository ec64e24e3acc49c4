"""Config-4 CLI e2e (BASELINE.json:10): partial-SDF-conditioned sampling
from the command line. Trains a tiny partial-SDF-conditioned experiment on
4 analytic spheres, then samples with `--obs <npz>` (observed SDF points of
one training shape) and checks the decoded meshes lean toward the target
shape (Chamfer to the target surface beats Chamfer to the most-different
shape's surface)."""

import numpy as np
import pytest

from latent_diffusion_models_for_shape_sdfs_tpu.cli import main
from latent_diffusion_models_for_shape_sdfs_tpu.data import analytic
from latent_diffusion_models_for_shape_sdfs_tpu.evaluation import (
    chamfer_l2, sample_mesh_surface)

OVERRIDES = [
    "--set", "ad.decoder.latent_size=8",
    "--set", "ad.decoder.hidden_dim=64",
    "--set", "ad.decoder.num_layers=3",
    "--set", "ad.decoder.latent_in=[2]",
    "--set", "ad.decoder.use_dropout=false",
    "--set", "ad.scenes_per_batch=4",
    "--set", "ad.samples_per_scene=2048",
    "--set", "ad.num_epochs=200",
    "--set", "ad.clamp_dist=0.5",
    "--set", "ad.lr_decoder=0.002",
    "--set", "ad.lr_latent=0.004",
    "--set", "ad.lr_decay_interval=100",
    "--set", "ad.snapshot_every=0",
    "--set", "diff.denoiser.latent_size=8",
    "--set", "diff.denoiser.hidden_dim=128",
    "--set", "diff.denoiser.num_blocks=2",
    "--set", "diff.denoiser.time_embed_dim=32",
    "--set", "diff.denoiser.partial_sdf_cond=true",
    "--set", "diff.denoiser.partial_points=128",
    "--set", "diff.denoiser.cond_drop_prob=0.1",
    "--set", "diff.timesteps=1000",
    "--set", "diff.batch_size=32",
    "--set", "diff.num_steps=3000",
    "--set", "diff.ema_decay=0.995",
    "--set", "diff.scan_chunk=500",
    "--set", "sample.grid_res=32",
    "--set", "sample.ddim_steps=50",
]


@pytest.fixture(scope="module")
def exp(tmp_path_factory):
    d = tmp_path_factory.mktemp("exp_cond")
    main(["init-experiment", str(d), "--data", "analytic:classes13",
          "--scenes", "4", *OVERRIDES])
    main(["train-ad", str(d)])
    main(["train-diff", str(d)])
    return d


def _scenes():
    return analytic.make_synthetic_split("classes13", 4, seed=0)


def _obs_npz(path, shape, n=512, seed=0):
    xyz, sdf = analytic.sample_sdf_points(shape, n, np.random.default_rng(seed))
    rows = np.concatenate([xyz, sdf[:, None]], axis=1).astype(np.float32)
    np.savez(path, rows=rows)


def test_obs_conditioned_sampling_steers_mesh(exp, tmp_path):
    shapes = _scenes()  # sphere / box / torus / capsule — distinct families
    tgt = 2  # torus: geometrically farthest from the others
    obs = tmp_path / "obs.npz"
    _obs_npz(obs, shapes[tgt])
    main(["sample", str(exp), "--num", "4", "--res", "32",
          "--obs", str(obs), "--seed", "7"])
    objs = sorted((exp / "samples").glob("*.obj"))
    assert len(objs) == 4

    from latent_diffusion_models_for_shape_sdfs_tpu.utils import meshio
    gts = [analytic.sample_surface(s, 4000, np.random.default_rng(i))
           for i, s in enumerate(shapes)]
    wins, valid = 0, 0
    for o in objs:
        v, f = meshio.read_obj(o)
        if len(f) < 20:
            continue
        valid += 1
        pts = sample_mesh_surface(v, f, 4000, seed=3)
        dists = [chamfer_l2(pts, gt) for gt in gts]
        if int(np.argmin(dists)) == tgt:
            wins += 1
    assert valid >= 3, f"only {valid}/4 samples decoded to real meshes"
    assert wins > valid // 2, (wins, valid)


def test_obs_without_cond_model_raises(exp, tmp_path):
    # guard: an unconditional-denoiser experiment must reject --obs
    import json
    import shutil
    d2 = tmp_path / "exp_uncond"
    shutil.copytree(exp, d2)
    specs = json.loads((d2 / "specs.json").read_text())
    specs["diff"]["denoiser"]["partial_sdf_cond"] = False
    (d2 / "specs.json").write_text(json.dumps(specs))
    obs = tmp_path / "obs.npz"
    _obs_npz(obs, _scenes()[0])
    with pytest.raises(ValueError, match="partial_sdf_cond"):
        main(["sample", str(d2), "--num", "1", "--res", "24",
              "--obs", str(obs)])
