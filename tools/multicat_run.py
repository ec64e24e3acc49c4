"""BASELINE config-5 evidence: multi-category (13 classes), single chip.

Trains the canonical joint auto-decoder over 13 x 32 = 416 analytic
shapes spanning the classes13 families, a CLASS-CONDITIONAL latent DDPM
over the codes (CFG null-token training), then, per class: DDIM-50 CFG
samples -> hierarchical decode -> meshes, and the class-identity check
that makes conditioning measurable: each class's generated clouds must
be closer (MMD-Chamfer, device metric path) to THAT class's training
shapes than to the pool of other classes.

The DP / 512^3 / sharded-DDIM legs of config 5 are covered by
tests/test_dp_cpu.py (8-way mesh exact parity), tests/test_mesh.py (AOT
shardings incl. 2x4 'dcn','data'), and bench.py (512^3 decode rate) —
this tool supplies the multi-category generative-fidelity leg.

Writes runs/multicat13/report.json and MULTICAT.md.
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/multicat_run.py
"""

import json
import pathlib
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT = ROOT / "runs" / "multicat13"
N_PER_CLASS = 32
N_CLASSES = 13
N_TRAIN = N_PER_CLASS * N_CLASSES  # 416


def main():
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.tpu_lock import (
        acquire_or_die)
    _tpu_lock = acquire_or_die("tools/multicat_run")  # one chip, one process
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.compilation_cache \
        import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from latent_diffusion_models_for_shape_sdfs_tpu.config import (
        AdConfig, DecoderConfig, DiffConfig, DenoiserConfig)
    from latent_diffusion_models_for_shape_sdfs_tpu.data import (
        analytic, SdfDataset)
    from latent_diffusion_models_for_shape_sdfs_tpu.train import (
        train_auto_decoder, train_diffusion)
    from latent_diffusion_models_for_shape_sdfs_tpu.train.diffusion import (
        unnormalize_codes)
    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion import (
        DiffusionSchedule, ddim_sample)
    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.sampler import (
        guided_denoise_fn)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.pallas_kernels import (
        make_pallas_apply)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_adaptive)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.isosurface import (
        extract_mesh)
    from latent_diffusion_models_for_shape_sdfs_tpu.evaluation import (
        chamfer_l2, sample_mesh_surface, pairwise_metric)
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.logging import (
        MetricLogger)

    OUT.mkdir(parents=True, exist_ok=True)
    np.asarray(jnp.ones(8))
    report = {"device": str(jax.devices()[0].device_kind),
              "n_classes": N_CLASSES, "per_class": N_PER_CLASS}

    # ---------------- data: interleaved classes13 split (class_id tagged)
    t0 = time.time()
    shapes = analytic.make_synthetic_split("classes13", N_TRAIN, seed=5)
    class_ids = np.asarray([s["class_id"] for s in shapes], np.int32)
    assert (np.bincount(class_ids, minlength=13) == N_PER_CLASS).all()
    ds = SdfDataset.from_analytic(shapes, samples_per_shape=30_000, seed=0)
    report["data_seconds"] = time.time() - t0
    print(f"dataset: {report['data_seconds']:.0f}s", flush=True)

    # ---------------- stage 1: joint auto-decoder over all categories
    cfg = AdConfig(
        decoder=DecoderConfig(),
        num_scenes=N_TRAIN, scenes_per_batch=64, samples_per_scene=16384,
        clamp_dist=0.1, num_epochs=500, lr_decay_interval=200,
        use_pallas=True, device_data=True, seed=0)
    t0 = time.time()
    decoder, state, metrics = train_auto_decoder(
        cfg, ds, logger=MetricLogger(OUT / "train_ad.jsonl"))
    report["ad_final_l1"] = float(metrics["loss_l1"])
    report["ad_seconds"] = time.time() - t0
    print(f"stage1: l1={report['ad_final_l1']:.4f} "
          f"in {report['ad_seconds']:.0f}s", flush=True)
    apply_fn = make_pallas_apply(decoder, state.params)

    # train-set fidelity: one shape per class
    cham = []
    for c in range(N_CLASSES):
        i = int(np.nonzero(class_ids == c)[0][0])
        grid = decode_grid_adaptive(apply_fn, state.codes[i], 128)
        v, f = extract_mesh(grid)
        if not len(f):
            cham.append(float("inf"))
            continue
        pred = sample_mesh_surface(v, f, 20_000, seed=i)
        gt = analytic.sample_surface(shapes[i], 20_000,
                                     np.random.default_rng(i))
        cham.append(chamfer_l2(pred, gt))
    report["train_chamfer_per_class"] = cham
    report["train_chamfer_median"] = float(np.median(cham))
    print(f"train chamfer (1/class): median "
          f"{report['train_chamfer_median']:.2e}", flush=True)

    # ---------------- stage 2: class-conditional latent DDPM (CFG)
    # recipe = the config-3 sweep winner "big300k" (SCALE.md: best
    # eps-fit, 1-NNA 0.45) with the class-conditional head added
    dcfg = DiffConfig(
        denoiser=DenoiserConfig(latent_size=256, hidden_dim=1024,
                                num_blocks=6, num_classes=N_CLASSES,
                                cond_drop_prob=0.1),
        timesteps=1000, batch_size=128, num_steps=300_000,
        lr=2e-4, lr_schedule="cosine", warmup_steps=2000,
        scan_chunk=200, seed=0)
    t0 = time.time()
    model, dstate, (mu, sigma), dloss = train_diffusion(
        dcfg, state.codes, class_ids=class_ids,
        logger=MetricLogger(OUT / "train_diff.jsonl"))
    report["diff_loss"] = float(dloss)
    report["diff_seconds"] = time.time() - t0
    print(f"stage2 (class-cond): loss={report['diff_loss']:.3f} "
          f"in {report['diff_seconds']:.0f}s", flush=True)

    # ---------------- per-class CFG sampling + class-identity metrics
    sch = DiffusionSchedule.create(dcfg.timesteps)
    N_GEN = 8
    per_class = {}
    gen_by_class = {}
    for c in range(N_CLASSES):
        fn = guided_denoise_fn(
            model.apply, dstate.ema_params, 2.0,
            class_id=jnp.full((N_GEN,), c, jnp.int32))
        zc = unnormalize_codes(
            ddim_sample(fn, sch, jax.random.PRNGKey(100 + c), N_GEN, 256,
                        steps=50), mu, sigma)
        clouds, empty = [], 0
        for i in range(N_GEN):
            grid = decode_grid_adaptive(apply_fn, zc[i], 96)
            v, f = extract_mesh(grid)
            if len(f) < 50:
                empty += 1
                continue
            clouds.append(sample_mesh_surface(v, f, 1024,
                                              seed=1000 + c * N_GEN + i))
        gen_by_class[c] = clouds
        per_class[c] = {"empty": empty, "n": len(clouds)}
        print(f"class {c}: {len(clouds)}/{N_GEN} decode to geometry",
              flush=True)

    # reference clouds per class (training shapes' exact surfaces)
    ref_by_class = {
        c: [analytic.sample_surface(shapes[i], 1024,
                                    np.random.default_rng(3000 + i))
            for i in np.nonzero(class_ids == c)[0][:16]]
        for c in range(N_CLASSES)}

    # class identity: MMD(gen_c, ref_c) must beat MMD(gen_c, ref_other)
    ident_ok = 0
    for c in range(N_CLASSES):
        if not gen_by_class[c]:
            per_class[c]["mmd_own"] = float("inf")
            continue
        own = pairwise_metric(gen_by_class[c], ref_by_class[c],
                              "chamfer", chunk=16)
        other_refs = [p for cc in range(N_CLASSES) if cc != c
                      for p in ref_by_class[cc][:2]]
        oth = pairwise_metric(gen_by_class[c], other_refs, "chamfer",
                              chunk=16)
        mmd_own = float(own.min(axis=1).mean())
        mmd_oth = float(oth.min(axis=1).mean())
        per_class[c]["mmd_own"] = mmd_own
        per_class[c]["mmd_other"] = mmd_oth
        if mmd_own < mmd_oth:
            ident_ok += 1
        print(f"class {c}: mmd own {mmd_own:.2e} vs other "
              f"{mmd_oth:.2e}", flush=True)
    report["per_class"] = per_class
    report["class_identity_ok"] = ident_ok
    total_empty = sum(p["empty"] for p in per_class.values())
    report["total_empty"] = total_empty
    print(f"class identity: {ident_ok}/{N_CLASSES} classes closer to own "
          f"reference set; {total_empty} empty of "
          f"{N_CLASSES * N_GEN}", flush=True)

    (OUT / "report.json").write_text(json.dumps(report, indent=2))
    md = [
        "# MULTICAT — BASELINE config 5 (13 classes, class-conditional "
        "CFG, 1x v5e)\n",
        f"- device: {report['device']}; {N_CLASSES} classes x "
        f"{N_PER_CLASS} shapes = {N_TRAIN} latents",
        f"- stage-1 joint auto-decoder (fused Pallas): L1 "
        f"{report['ad_final_l1']:.4f} in {report['ad_seconds']:.0f}s",
        f"- train-set Chamfer-L2 (1 shape/class, 128^3): median "
        f"{report['train_chamfer_median']:.2e}",
        f"- stage-2 class-conditional DDPM (CFG null-token, 13-class "
        f"embedding; the SCALE.md sweep-winning big300k recipe: "
        f"h{dcfg.denoiser.hidden_dim}/b{dcfg.denoiser.num_blocks}, "
        f"cosine LR): eps-MSE {report['diff_loss']:.3f} after "
        f"{dcfg.num_steps} steps ({report['diff_seconds']:.0f}s)",
        f"- per-class DDIM-50 w/ CFG 2.0, 96^3 decode: "
        f"{N_CLASSES * N_GEN - total_empty}/{N_CLASSES * N_GEN} samples "
        f"produce geometry",
        f"- class identity: {ident_ok}/{N_CLASSES} classes have "
        f"MMD-Chamfer(own refs) < MMD-Chamfer(other classes) — "
        f"conditioning steers the sampler to the right category",
        "",
        "DP / 512^3 / sharded-DDIM legs of config 5: exact-parity on an "
        "8-way CPU mesh (tests/test_dp_cpu.py), AOT sharding specs "
        "(tests/test_mesh.py), 512^3 rate in BASELINE.md.",
    ]
    (ROOT / "MULTICAT.md").write_text("\n".join(md) + "\n")
    print("wrote MULTICAT.md")


if __name__ == "__main__":
    main()
