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
# stage-2 config — selected by the tools/diff_sweep.py table (the sweep
# showed 1-NNA is protocol-floor-bound, not capacity-bound; big300k had
# the best eps-MSE by 3x and ties the best 1-NNA)
DIFF_STEPS = 300_000
DIFF_BATCH = 128
DIFF_LR_SCHEDULE = "cosine"
DIFF_DENOISER = {"hidden_dim": 1024, "num_blocks": 6}
RECON_STEPS = 1600
N_GEN = 64


def main():
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.tpu_lock import (
        acquire_or_die)
    _tpu_lock = acquire_or_die("tools/scale_run")  # one chip, one process
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

    import os
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.checkpoint import (
        StageCheckpointer)

    OUT.mkdir(parents=True, exist_ok=True)
    np.asarray(jnp.ones(8))  # d2h channel warm
    report = {"device": str(jax.devices()[0].device_kind),
              "num_scenes": N_TRAIN,
              "samples_per_shape": SAMPLES_PER_SHAPE}

    shapes = analytic.make_synthetic_split("chair", N_TRAIN + 1, seed=11)
    train_shapes, held_out = shapes[:N_TRAIN], shapes[N_TRAIN]

    # Reuse the saved stage-1 checkpoint when present (stage-2/eval
    # iteration costs minutes instead of re-burning ~20 min of stage-1;
    # disable with SCALE_REUSE_AD=0). The stage-1-derived report fields
    # carry over from the previous report.json.
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.checkpoint import (
        pack_tree_npz, restore_stage1)
    ck = StageCheckpointer(OUT, "ad", max_to_keep=1)
    have_stage1 = (ck.latest_step() is not None
                   or (OUT / "stage1_pack.npz").exists())
    reuse = (os.environ.get("SCALE_REUSE_AD", "1") == "1"
             and have_stage1
             and (OUT / "report.json").exists())
    ck.close()
    if reuse:
        from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import (  # noqa: E501
            SdfDecoder)
        decoder = SdfDecoder(DecoderConfig())
        tmpl = {"params": decoder.init_params(jax.random.PRNGKey(0)),
                "codes": jnp.zeros((N_TRAIN, 256), jnp.float32)}
        st = restore_stage1(OUT, tmpl)
        params, codes = st["params"], st["codes"]
        prev = json.loads((OUT / "report.json").read_text())
        for k in ("bank_seconds", "bank_bytes", "ad_epochs", "ad_steps",
                  "ad_final_l1", "ad_seconds", "ad_steps_per_sec",
                  "train_chamfer_median", "train_chamfer_mean",
                  "held_out_chamfer", "held_out_opt"):
            if k in prev:
                report[k] = prev[k]
        print(f"stage-1 restored from checkpoint "
              f"(l1={report.get('ad_final_l1', float('nan')):.4f})",
              flush=True)
    else:
        # ------------ data: device-generated bank (host packs params)
        t0 = time.time()
        bank = analytic_jax.bank_from_chairs(
            train_shapes, jax.random.PRNGKey(0), SAMPLES_PER_SHAPE)
        jax.block_until_ready(bank.pos)
        report["bank_seconds"] = time.time() - t0
        report["bank_bytes"] = int(bank.pos.nbytes + bank.neg.nbytes)
        print(f"device bank: {report['bank_seconds']:.0f}s, "
              f"{report['bank_bytes']/2**30:.2f} GiB", flush=True)

        # ------------ stage 1
        cfg = AdConfig(
            decoder=DecoderConfig(),  # canonical 8x512, dropout 0.2
            num_scenes=N_TRAIN, scenes_per_batch=SCENES_PER_BATCH,
            samples_per_scene=SAMPLES_PER_SCENE,
            clamp_dist=0.1, num_epochs=EPOCHS, lr_decay_interval=60,
            use_pallas=True, device_data=True, seed=0)
        t0 = time.time()
        decoder, state, metrics = train_auto_decoder(
            cfg, None, bank=bank,
            logger=MetricLogger(OUT / "train_ad.jsonl"))
        t_ad = time.time() - t0
        steps = EPOCHS * ((N_TRAIN + SCENES_PER_BATCH - 1)
                          // SCENES_PER_BATCH)
        report.update(ad_epochs=EPOCHS, ad_steps=steps,
                      ad_final_l1=float(metrics["loss_l1"]),
                      ad_seconds=t_ad, ad_steps_per_sec=steps / t_ad)
        print(f"stage1: l1={report['ad_final_l1']:.4f} in {t_ad:.0f}s "
              f"({report['ad_steps_per_sec']:.1f} steps/s)", flush=True)
        del bank
        ck = StageCheckpointer(OUT, "ad", max_to_keep=1)
        ck.save(EPOCHS, {"params": state.params, "codes": state.codes})
        ck.close()
        # git-persistable twin (runs/ pack survives the sandbox; the
        # orbax tree does not) — lets later rounds' evaluation tools
        # skip the ~20 min stage-1 retrain entirely
        pack_tree_npz(OUT / "stage1_pack.npz",
                      {"params": state.params, "codes": state.codes})
        params, codes = state.params, state.codes

    apply_fn = make_pallas_apply(decoder, params)

    # ---------------- train-set fidelity (16 chairs spread over the split)
    cham = []
    if reuse:
        print("train-set + held-out fidelity carried over from the "
              "previous report (stage-1 unchanged)", flush=True)
    else:
        for i in range(0, N_TRAIN, max(N_TRAIN // 16, 1)):
            grid = decode_grid_adaptive(apply_fn, codes[i], 128)
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
        print(f"train-set chamfer: "
              f"median={report['train_chamfer_median']:.2e}", flush=True)

        # ------------ held-out reconstruction
        rngh = np.random.default_rng(99)
        obs_xyz, obs_sdf = analytic.sample_sdf_points(held_out, 8000, rngh)
        z_rec, info = reconstruct_latent(
            decoder, params, jnp.asarray(obs_xyz), jnp.asarray(obs_sdf),
            ReconstructConfig(num_steps=RECON_STEPS, clamp_dist=0.1,
                              num_inits=4))
        grid = decode_grid_adaptive(apply_fn, z_rec, 128)
        v, f = extract_mesh(grid)
        meshio.write_obj(OUT / "held_out_recon.obj", v, f)
        pred = sample_mesh_surface(v, f, 30_000, seed=1)
        gt = analytic.sample_surface(held_out, 30_000,
                                     np.random.default_rng(5))
        report["held_out_chamfer"] = chamfer_l2(pred, gt)
        report["held_out_opt"] = info
        print(f"held-out chamfer: {report['held_out_chamfer']:.2e}",
              flush=True)

    # ---------------- stage 2 over all 6144 codes (config chosen by the
    # tools/diff_sweep.py table; see SCALE.md sweep section)
    dcfg = DiffConfig(denoiser=DenoiserConfig(**DIFF_DENOISER),
                      timesteps=1000,
                      batch_size=DIFF_BATCH, num_steps=DIFF_STEPS,
                      scan_chunk=min(2000, DIFF_STEPS),
                      lr=2e-4, lr_schedule=DIFF_LR_SCHEDULE,
                      warmup_steps=2000 if DIFF_LR_SCHEDULE == "cosine"
                      else 0, seed=0)
    t0 = time.time()
    model, dstate, (mu, sigma), dloss = train_diffusion(
        dcfg, codes, logger=MetricLogger(OUT / "train_diff.jsonl"))
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
    # reference clouds in BOTH protocols: `ref` = the same training
    # shapes DECODED through the identical decode->MC->sample pipeline
    # (headline — the oracle control in tools/diff_sweep.py measured a
    # 0.656 1-NNA protocol floor when refs are sampled analytically
    # instead, keyed on decode artifacts); `ref_analytic` = analytic
    # surface sampling (round-2 protocol, kept for continuity).
    ref_analytic = [analytic.sample_surface(
        train_shapes[(i * 7) % N_TRAIN], 2048,
        np.random.default_rng(200 + i)) for i in range(N_GEN)]
    ref_decoded = []
    for i in range(N_GEN):
        grid = decode_grid_adaptive(apply_fn,
                                    jnp.asarray(codes[(i * 7) % N_TRAIN]),
                                    96)
        v, f = extract_mesh(grid)
        ref_decoded.append(sample_mesh_surface(v, f, 2048, seed=200 + i))
    np.savez_compressed(OUT / "metric_clouds.npz",
                        gen=np.stack(gen_clouds),
                        ref=np.stack(ref_decoded),
                        ref_analytic=np.stack(ref_analytic))
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
        f"{report['held_out_chamfer']:.2e} (single-chair snapshot probe; "
        f"the 8-chair battery below is the authoritative held-out "
        f"evidence — per-chair spread is ~50x, see heldout_eval.json)",
        f"- stage-2 eps-MSE after {report['diff_steps']} steps over all "
        f"{n_train} codes: {report['diff_loss']:.3f} "
        f"({report['diff_seconds']:.0f}s)",
    ]
    gm = report.get("generative_metrics")
    if gm:
        md.append(
            f"- generative metrics (64 DDIM samples vs 64 refs, 2048-pt "
            f"clouds, refs {gm.get('ref_protocol', 'analytic')}): "
            f"MMD-Chamfer {gm['mmd_chamfer']:.2e}, COV "
            f"{gm['coverage']:.2f}, 1-NNA {gm['one_nna']:.2f}; MMD-EMD "
            f"{gm['mmd_emd']:.4f}, COV-EMD {gm['coverage_emd']:.2f}, "
            f"1-NNA-EMD {gm['one_nna_emd']:.2f} "
            f"({report['empty_samples']} empty; EMD via "
            f"{gm.get('emd_source', 'device Sinkhorn')})")
        if "one_nna_analytic" in gm:
            md.append(
                f"  - secondary, round-2 analytic-ref protocol (carries "
                f"a 0.66 1-NNA decode-artifact floor — see the oracle "
                f"control in diff_sweep.json): MMD-Chamfer "
                f"{gm['mmd_chamfer_analytic']:.2e}, COV "
                f"{gm['coverage_analytic']:.2f}, 1-NNA "
                f"{gm['one_nna_analytic']:.2f}")
    else:
        md.append(f"- generative metrics: clouds saved "
                  f"({report['empty_samples']} empty) — run "
                  f"`python tools/metrics_run.py runs/scale_chairs6k`")
    he_path = OUT / "heldout_eval.json"
    if he_path.exists():
        he = json.loads(he_path.read_text())
        if "held_out_budgets" in he:
            md.append("- held-out battery (8 unseen chairs, "
                      "tools/heldout_eval.py), per arm (A/B vary the "
                      "observation budget; C tightens the Gaussian "
                      "prior; D/E use the trained denoiser as the "
                      "prior via score distillation — "
                      "reconstruct_latent_diffusion_prior; F/G use the "
                      "amortized encoder — tools/encoder_run.py, "
                      "one-shot and as latent-opt warm start):")
            for bname, b in he["held_out_budgets"].items():
                spec = b.get("spec", {})
                prior = (f"sds={spec['sds']:g}" if "sds" in spec
                         else f"encoder {spec['encoder']}"
                         if "encoder" in spec
                         else f"sigma={spec.get('sigma', 10.0):g}")
                md.append(
                    f"  - {bname} ({b['n_obs']} obs, "
                    f"{int(100 * b['surface_frac'])}% surface-biased, "
                    f"{prior}): "
                    f"median Chamfer {b['median']:.2e}, worst pred->gt "
                    f"{b['worst_pred_to_gt']:.2e}, median gt->pred "
                    f"{b['median_gt_to_pred']:.2e}")
            md.append(
                "  - A-vs-B verdict: free-space carving (B: 2x obs, 4.8k "
                "uniform empty-space samples) did NOT shrink the "
                "over-completion tail — worst pred->gt moved <1% — a "
                "documented negative result (VERDICT r2 #7): the extra "
                "geometry sits where BOTH budgets sample sparsely, and "
                "the latent prior, not observation coverage, is the "
                "binding constraint at this table size")
            hb = he["held_out_budgets"]
            if "C_8k_sigma1" in hb and "E_8k_sds1e3" in hb:
                md.append(
                    "  - C/D/E verdict: swapping the prior does not fix "
                    "the tail either — C (Gaussian 100x tighter) is "
                    "within noise of A, and the score-distillation arms "
                    "trade data fit for prior pull (l1 2-6x higher), "
                    "WORSENING worst pred->gt (D 5.5e-3, E 1.2e-2 vs A "
                    "4.3e-3). The tail chairs' extra geometry is "
                    "data-consistent under every tested prior: it sits "
                    "where observations are sparse AND the decoder's "
                    "learned shape space genuinely contains furniture "
                    "there — a capacity/coverage property of the "
                    "auto-decoder, not an optimization artifact")
            if "G_enc_refine" in hb:
                f_arm, g_arm = hb.get("F_enc_oneshot"), hb["G_enc_refine"]
                er = he.get("encoder_run", {})
                md.append(
                    "  - F/G verdict: the amortized encoder is a "
                    "practical speed/quality trade — one-shot (F) "
                    f"reaches median {f_arm['median']:.2e} in "
                    f"{er.get('oneshot_ms_median', float('nan')):.1f} ms "
                    "(~1000x faster than the 1600-step optimization), "
                    "and encoder-init + refine (G, single init) lands at "
                    f"median {g_arm['median']:.2e} / worst pred->gt "
                    f"{g_arm['worst_pred_to_gt']:.2e} vs A's 4-restart "
                    f"{hb['A_8k_surf95']['median']:.2e} / "
                    f"{hb['A_8k_surf95']['worst_pred_to_gt']:.2e}")
        elif "held_out" in he:
            md.append(f"- held-out battery (8 unseen chairs): median "
                      f"Chamfer {he['held_out']['median']:.2e}")
        if "serve_256" in he:
            s = he["serve_256"]
            md.append(
                f"- serving path on trained codes (serve.serve_meshes, "
                f"256^3 compact int8 payload + payload-direct native "
                f"marching cubes, threaded host meshing): "
                f"{s['ms_per_mesh']:.0f} ms/mesh end-to-end "
                f"({s['payload_mib']:.2f} MiB d2h payload/shape, "
                f"{s['escalations']} capacity escalations)")
        if "serve_512" in he:
            s = he["serve_512"]
            md.append(
                f"- serving at 512^3 (int8 payload makes it host-link-"
                f"viable): {s['ms_per_mesh']:.0f} ms/mesh "
                f"({s['payload_mib']:.2f} MiB payload, "
                f"{s['verts_per_mesh']} verts/mesh, "
                f"{s['escalations']} escalations)")

    sweep_path = OUT / "diff_sweep.json"
    if sweep_path.exists():
        sweep = json.loads(sweep_path.read_text())
        md += [
            "",
            "## Stage-2 sweep (tools/diff_sweep.py, 64 DDIM samples / "
            "arm, decoded-ref protocol; `analytic` column = round-2 "
            "protocol with its 0.66 oracle floor)",
            "",
            "| arm | 1-NNA | COV | MMD-CD | 1-NNA (analytic refs) | "
            "eps-MSE |",
            "|---|---|---|---|---|---|",
        ]
        for k, v in sweep.items():
            eps = ("—" if v.get("eps_mse") is None
                   else f"{v['eps_mse']:.3f}")
            md.append(
                f"| {k} | {v['one_nna']:.2f} | {v['coverage']:.2f} | "
                f"{v['mmd_chamfer']:.2e} | "
                f"{v.get('one_nna_analytic', float('nan')):.2f} | "
                f"{eps} |")
        md += [
            "",
            "The oracle row (true codes of the reference shapes, decoded "
            "identically, resampled) is the protocol floor. Round 2's "
            "1-NNA 0.91 'mediocre fidelity' was this decode-artifact "
            "floor, not sampler error: with both sets rendered through "
            "the same pipeline every arm sits at 0.41-0.55 (ideal 0.5; "
            "<0.5 = memorization-leaning). Production stage-2 config = "
            "big300k (h1024/b6, 300k steps, cosine — best eps-fit, "
            "1-NNA 0.45); unet300k (0.51) is the UNet variant's "
            "demonstrated-capability run. whiten_big600k collapsed "
            "(COV 0.125, archived in diff_sweep_protocol_v1.json) — "
            "whitening amplifies the code table's noise directions.",
        ]
    if "dpm_ab" in report:
        ab = report["dpm_ab"]
        md += [
            "",
            f"## DPM-Solver++(2M) vs DDIM-50 (tools/dpm_ab_eval.py: same "
            f"z_T, same decoded refs, {ab['gen']} samples at "
            f"{ab['res']}^3)",
            "",
            "| sampler | 1-NNA | COV | MMD-CD | 1-NNA-EMD | empty | "
            "sample s (incl. jit compile) |",
            "|---|---|---|---|---|---|---|",
        ]
        for name, gm in ab["results"].items():
            md.append(
                f"| {name} | {gm['one_nna']:.2f} | {gm['coverage']:.2f} "
                f"| {gm['mmd_chamfer']:.2e} | "
                f"{gm.get('one_nna_emd', float('nan')):.2f} | "
                f"{gm['empty']} | {gm['sample_seconds']:.1f} |")
        md += [
            "",
            "Verdict: 10 DPM-Solver++(2M) denoiser calls sit in the same "
            "fidelity class as 50 DDIM steps on every metric (the two "
            "1-NNA values straddle the 0.5 ideal) — `--set "
            "sample.sampler=dpm` buys a 5x cheaper sampling loop at this "
            "scale with no measured distributional cost.",
        ]
    md += [
        "",
        "Chamfer is squared-distance (DeepSDF convention); the 128^3 grid "
        "alone bounds it at ~2e-5 for a perfect surface.",
    ]
    (ROOT / "SCALE.md").write_text("\n".join(md) + "\n")


if __name__ == "__main__":
    main()
