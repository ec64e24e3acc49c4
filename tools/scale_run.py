"""BASELINE config-3 at spec scale: joint auto-decoder over ~6k shape
latents + latent diffusion (BASELINE.json:9 "~6k shape latents").

The quality run (tools/quality_run.py) is the 128-shape miniature; this
is the production-scale drill on one v5e:

  1. 6144 analytic chairs, sample bank generated ON DEVICE
     (data/analytic_jax.py) — the 1-CPU host never materializes the
     ~10^8 sample store that made this scale unreachable host-side;
  2. stage-1 joint training (fused Pallas kernel, device-resident bank,
     6144x256 latent table) with throughput logging;
  3. fidelity: train-set Chamfer on 16 chairs + held-out latent-opt
     reconstruction;
  4. stage-2 latent DDPM over all 6144 codes + DDIM-50 sampling +
     generative-set metrics (MMD/COV/1-NNA, 64 vs 64).

Writes runs/scale_chairs6k/report.json and SCALE.md. ~35 min on a v5e.
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/scale_run.py
"""

import json
import pathlib
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT = ROOT / "runs" / "scale_chairs6k"

N_TRAIN = 6144
SAMPLES_PER_SHAPE = 16384
EPOCHS = 150
SCENES_PER_BATCH = 64
SAMPLES_PER_SCENE = 16384
DIFF_STEPS = 60_000
RECON_STEPS = 1600
N_GEN = 64


def main():
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from latent_diffusion_models_for_shape_sdfs_tpu.config import (
        AdConfig, DecoderConfig, DiffConfig, DenoiserConfig,
        ReconstructConfig)
    from latent_diffusion_models_for_shape_sdfs_tpu.data import (
        analytic, analytic_jax)
    from latent_diffusion_models_for_shape_sdfs_tpu.train import (
        train_auto_decoder, train_diffusion)
    from latent_diffusion_models_for_shape_sdfs_tpu.train.diffusion import (
        unnormalize_codes)
    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion import (
        DiffusionSchedule, ddim_sample)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.pallas_kernels import (
        make_pallas_apply)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_adaptive)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.isosurface import (
        extract_mesh)
    from latent_diffusion_models_for_shape_sdfs_tpu.evaluation import (
        chamfer_l2, sample_mesh_surface, evaluate_generated)
    from latent_diffusion_models_for_shape_sdfs_tpu.reconstruct import (
        reconstruct_latent)
    from latent_diffusion_models_for_shape_sdfs_tpu.utils import meshio
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.logging import (
        MetricLogger)

    OUT.mkdir(parents=True, exist_ok=True)
    np.asarray(jnp.ones(8))  # d2h channel warm
    report = {"device": str(jax.devices()[0].device_kind),
              "num_scenes": N_TRAIN,
              "samples_per_shape": SAMPLES_PER_SHAPE}

    # ---------------- data: device-generated bank (host only packs params)
    t0 = time.time()
    shapes = analytic.make_synthetic_split("chair", N_TRAIN + 1, seed=11)
    train_shapes, held_out = shapes[:N_TRAIN], shapes[N_TRAIN]
    bank = analytic_jax.bank_from_chairs(train_shapes, jax.random.PRNGKey(0),
                                         SAMPLES_PER_SHAPE)
    jax.block_until_ready(bank.pos)
    report["bank_seconds"] = time.time() - t0
    report["bank_bytes"] = int(bank.pos.nbytes + bank.neg.nbytes)
    print(f"device bank: {report['bank_seconds']:.0f}s, "
          f"{report['bank_bytes']/2**30:.2f} GiB", flush=True)

    # ---------------- stage 1
    cfg = AdConfig(
        decoder=DecoderConfig(),  # canonical 8x512, dropout 0.2
        num_scenes=N_TRAIN, scenes_per_batch=SCENES_PER_BATCH,
        samples_per_scene=SAMPLES_PER_SCENE,
        clamp_dist=0.1, num_epochs=EPOCHS, lr_decay_interval=60,
        use_pallas=True, device_data=True, seed=0)
    t0 = time.time()
    decoder, state, metrics = train_auto_decoder(
        cfg, None, bank=bank, logger=MetricLogger(OUT / "train_ad.jsonl"))
    t_ad = time.time() - t0
    steps = EPOCHS * ((N_TRAIN + SCENES_PER_BATCH - 1) // SCENES_PER_BATCH)
    report.update(ad_epochs=EPOCHS, ad_steps=steps,
                  ad_final_l1=float(metrics["loss_l1"]), ad_seconds=t_ad,
                  ad_steps_per_sec=steps / t_ad)
    print(f"stage1: l1={report['ad_final_l1']:.4f} in {t_ad:.0f}s "
          f"({report['ad_steps_per_sec']:.1f} steps/s)", flush=True)
    del bank

    # persist stage-1 result so later rounds can reuse the 6k decoder
    # without re-burning ~25 min of TPU time (restored via
    # StageCheckpointer(OUT, "ad").restore(template)).
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.checkpoint import (
        StageCheckpointer)
    ck = StageCheckpointer(OUT, "ad", max_to_keep=1)
    ck.save(EPOCHS, {"params": state.params, "codes": state.codes})
    ck.close()

    apply_fn = make_pallas_apply(decoder, state.params)

    # ---------------- train-set fidelity (16 chairs spread over the split)
    cham = []
    for i in range(0, N_TRAIN, max(N_TRAIN // 16, 1)):
        grid = decode_grid_adaptive(apply_fn, state.codes[i], 128)
        v, f = extract_mesh(grid)
        if len(f) == 0:
            cham.append(float("inf"))
            continue
        pred = sample_mesh_surface(v, f, 30_000, seed=i)
        gt = analytic.sample_surface(train_shapes[i], 30_000,
                                     np.random.default_rng(i))
        cham.append(chamfer_l2(pred, gt))
        if i == 0:
            meshio.write_obj(OUT / "train_chair_0.obj", v, f)
    report["train_chamfer_median"] = float(np.median(cham))
    report["train_chamfer_mean"] = float(np.mean(cham))
    print(f"train-set chamfer: median={report['train_chamfer_median']:.2e}",
          flush=True)

    # ---------------- held-out reconstruction
    rngh = np.random.default_rng(99)
    obs_xyz, obs_sdf = analytic.sample_sdf_points(held_out, 8000, rngh)
    z_rec, info = reconstruct_latent(
        decoder, state.params, jnp.asarray(obs_xyz), jnp.asarray(obs_sdf),
        ReconstructConfig(num_steps=RECON_STEPS, clamp_dist=0.1, num_inits=4))
    grid = decode_grid_adaptive(apply_fn, z_rec, 128)
    v, f = extract_mesh(grid)
    meshio.write_obj(OUT / "held_out_recon.obj", v, f)
    pred = sample_mesh_surface(v, f, 30_000, seed=1)
    gt = analytic.sample_surface(held_out, 30_000, np.random.default_rng(5))
    report["held_out_chamfer"] = chamfer_l2(pred, gt)
    report["held_out_opt"] = info
    print(f"held-out chamfer: {report['held_out_chamfer']:.2e}", flush=True)

    # ---------------- stage 2 over all 6144 codes
    dcfg = DiffConfig(denoiser=DenoiserConfig(), timesteps=1000,
                      batch_size=64, num_steps=DIFF_STEPS, scan_chunk=min(1000, DIFF_STEPS),
                      lr=2e-4, seed=0)
    t0 = time.time()
    model, dstate, (mu, sigma), dloss = train_diffusion(
        dcfg, state.codes, logger=MetricLogger(OUT / "train_diff.jsonl"))
    report["diff_loss"] = float(dloss)
    report["diff_steps"] = dcfg.num_steps
    report["diff_seconds"] = time.time() - t0
    print(f"stage2: loss={dloss:.3f} in {report['diff_seconds']:.0f}s",
          flush=True)
    ck = StageCheckpointer(OUT, "diff", max_to_keep=1)
    ck.save(DIFF_STEPS, {"params": dstate.params, "ema": dstate.ema_params,
                         "mu": mu, "sigma": sigma})
    ck.close()

    # ---------------- generative sample clouds (64 DDIM-50 vs 64 refs);
    # metric computation runs crash-isolated afterwards:
    # tools/metrics_run.py runs/scale_chairs6k (see its docstring)
    sch = DiffusionSchedule.create(dcfg.timesteps)
    fn = lambda z, t: model.apply({"params": dstate.ema_params}, z, t)
    zg = unnormalize_codes(
        ddim_sample(fn, sch, jax.random.PRNGKey(17), N_GEN, 256, steps=50),
        mu, sigma)
    gen_clouds, n_empty = [], 0
    for i in range(N_GEN):
        grid = decode_grid_adaptive(apply_fn, zg[i], 96)
        v, f = extract_mesh(grid)
        if len(f) < 50:
            n_empty += 1
            continue
        if i < 4:
            meshio.write_obj(OUT / f"sample_{i}.obj", v, f)
        gen_clouds.append(sample_mesh_surface(v, f, 2048, seed=100 + i))
    ref_clouds = [analytic.sample_surface(train_shapes[(i * 7) % N_TRAIN], 2048,
                                          np.random.default_rng(200 + i))
                  for i in range(N_GEN)]
    np.savez_compressed(OUT / "metric_clouds.npz",
                        gen=np.stack(gen_clouds), ref=np.stack(ref_clouds))
    report["empty_samples"] = n_empty
    print(f"metric clouds saved ({len(gen_clouds)} gen, {n_empty} empty); "
          f"run tools/metrics_run.py next", flush=True)

    (OUT / "report.json").write_text(json.dumps(report, indent=2))
    write_scale_md(report)
    print("wrote SCALE.md (generative metrics pending metrics_run)")


def write_scale_md(report: dict) -> None:
    """SCALE.md from report.json; tolerates missing generative_metrics
    (tools/metrics_run.py fills it in and calls this again)."""
    n_train = report["num_scenes"]
    md = [
        "# SCALE — BASELINE config 3 at spec scale "
        f"({n_train} chair latents, 1x v5e)\n",
        "Tooling: `tools/scale_run.py` (train + clouds, saves stage "
        "checkpoints under `runs/scale_chairs6k/`), "
        "`tools/metrics_run.py` (crash-isolated generative metrics), "
        "`tools/heldout_eval.py` (held-out battery). Raw numbers: "
        "`runs/scale_chairs6k/*.json`.\n",
        f"- device: {report['device']}; sample bank "
        f"({n_train}x{report['samples_per_shape']}, "
        f"{report['bank_bytes']/2**30:.2f} GiB) generated ON DEVICE in "
        f"{report['bank_seconds']:.0f}s (data/analytic_jax.py)",
        f"- stage-1 joint training, {n_train}x256 latent table, fused "
        f"Pallas kernel: {report['ad_epochs']} epochs "
        f"({report['ad_steps']} steps) in "
        f"{report['ad_seconds']:.0f}s = "
        f"{report['ad_steps_per_sec']:.1f} steps/s; final clamped-L1 "
        f"{report['ad_final_l1']:.4f}",
        f"- train-set Chamfer-L2 (16/{n_train} chairs, 128^3): median "
        f"{report['train_chamfer_median']:.2e}, mean "
        f"{report['train_chamfer_mean']:.2e}",
        f"- held-out chair (latent opt, best of 4 inits): Chamfer-L2 "
        f"{report['held_out_chamfer']:.2e}",
        f"- stage-2 eps-MSE after {report['diff_steps']} steps over all "
        f"{n_train} codes: {report['diff_loss']:.3f} "
        f"({report['diff_seconds']:.0f}s)",
    ]
    gm = report.get("generative_metrics")
    if gm:
        md.append(
            f"- generative metrics (64 DDIM-50 samples vs 64 refs, "
            f"2048-pt clouds): MMD-Chamfer {gm['mmd_chamfer']:.2e}, COV "
            f"{gm['coverage']:.2f}, 1-NNA {gm['one_nna']:.2f}; MMD-EMD "
            f"{gm['mmd_emd']:.4f}, COV-EMD {gm['coverage_emd']:.2f}, "
            f"1-NNA-EMD {gm['one_nna_emd']:.2f} "
            f"({report['empty_samples']} empty; EMD via "
            f"{gm.get('emd_source', 'device Sinkhorn')})")
    else:
        md.append(f"- generative metrics: clouds saved "
                  f"({report['empty_samples']} empty) — run "
                  f"`python tools/metrics_run.py runs/scale_chairs6k`")
    if "diff_sweep" in report:
        md.append(f"- stage-2 sweep (tools/diff_sweep.py): see "
                  f"SWEEP table below; production config = "
                  f"{report['diff_sweep']['chosen']}")
    md += [
        "",
        "Chamfer is squared-distance (DeepSDF convention); the 128^3 grid "
        "alone bounds it at ~2e-5 for a perfect surface.",
    ]
    (ROOT / "SCALE.md").write_text("\n".join(md) + "\n")


if __name__ == "__main__":
    main()
