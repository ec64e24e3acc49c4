"""Generate the five canonical BASELINE experiment configs into configs/
(BASELINE.json:7-11). Run: PYTHONPATH=. python tools/make_configs.py"""

import pathlib

from latent_diffusion_models_for_shape_sdfs_tpu.config import (
    ExperimentConfig, override)

ROOT = pathlib.Path(__file__).resolve().parents[1] / "configs"


def main():
    # 1. single-shape overfit (chair stand-in), 64^3 eval
    c1 = override(
        ExperimentConfig(name="config1_overfit_chair",
                         data_source="analytic:chair"),
        **{"ad.num_scenes": 1, "ad.scenes_per_batch": 1,
           "ad.num_epochs": 2001, "sample.grid_res": 64})

    # 2. latent DDPM over stage-1 codes: 1000-step schedule, DDIM-50
    c2 = override(
        ExperimentConfig(name="config2_latent_ddpm",
                         data_source="analytic:chair"),
        **{"ad.num_scenes": 64, "ad.scenes_per_batch": 64,
           "diff.timesteps": 1000, "diff.num_steps": 20000,
           "sample.ddim_steps": 50, "sample.num_samples": 1})

    # 3. chairs class: ~6k latents joint + diffusion, 128^3 reconstruction
    c3 = override(
        ExperimentConfig(name="config3_chairs_joint",
                         data_source="analytic:chair"),
        **{"ad.num_scenes": 6000, "ad.scenes_per_batch": 64,
           "ad.num_epochs": 2001,
           "diff.denoiser.hidden_dim": 1024, "diff.denoiser.num_blocks": 6,
           "diff.num_steps": 300_000, "diff.lr": 2e-4,
           "diff.lr_schedule": "cosine", "diff.warmup_steps": 2000,
           "diff.batch_size": 128,
           "sample.grid_res": 128,
           "ad.decoder.compute_dtype": "bfloat16",
           "ad.decoder.dropout_impl": "pallas"})

    # 4. conditional: class + partial-SDF denoiser; batched 256^3 decode
    c4 = override(
        ExperimentConfig(name="config4_conditional",
                         data_source="analytic:classes13"),
        **{"ad.num_scenes": 1300, "ad.scenes_per_batch": 64,
           "diff.denoiser.num_classes": 13,
           "diff.denoiser.partial_sdf_cond": True,
           "diff.denoiser.hidden_dim": 1024, "diff.denoiser.num_blocks": 6,
           "diff.num_steps": 300_000, "diff.lr": 2e-4,
           "diff.lr_schedule": "cosine", "diff.warmup_steps": 2000,
           "diff.batch_size": 128,
           "sample.grid_res": 256, "sample.num_samples": 64,
           "sample.guidance_scale": 2.0,
           "ad.decoder.compute_dtype": "bfloat16",
           "ad.decoder.dropout_impl": "pallas"})

    # 5. multi-category, data-parallel v4-8: 512^3 chunked decode,
    #    sharded DDIM sampling
    c5 = override(
        ExperimentConfig(name="config5_multicat_dp",
                         data_source="analytic:classes13"),
        **{"ad.num_scenes": 6500, "ad.scenes_per_batch": 64,
           "ad.data_parallel": True,
           "diff.denoiser.num_classes": 13,
           "diff.denoiser.hidden_dim": 1024, "diff.denoiser.num_blocks": 6,
           "diff.num_steps": 300_000, "diff.lr": 2e-4,
           "diff.lr_schedule": "cosine", "diff.warmup_steps": 2000,
           "diff.batch_size": 128,
           "sample.grid_res": 512, "sample.num_samples": 64,
           "ad.decoder.compute_dtype": "bfloat16",
           "ad.decoder.dropout_impl": "pallas"})

    for cfg in (c1, c2, c3, c4, c5):
        d = ROOT / cfg.name
        cfg.save(d)
        print(f"wrote {d}/specs.json")


if __name__ == "__main__":
    main()
