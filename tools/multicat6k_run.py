"""BASELINE config-5 at SPEC scale: 13 classes x 472 = 6136 latents,
class-conditional CFG diffusion, per-class held-out generative metrics,
CFG-scale sweep, and 512^3 serving on the conditional model
(VERDICT r3 #3 — the round-3 evidence was a 416-latent miniature with
MMD-identity ranking only).

Pipeline (one v5e):
  1. classes13 split (6136 shapes, every family), sample bank generated
     ON DEVICE via the generic packed-CSG evaluator
     (data/analytic_jax.bank_from_csg) — the multi-category twin of the
     chair-family path that made config-3 scale reachable;
  2. stage-1 joint auto-decoder (fused Pallas kernel, device bank,
     6136x256 latent table), checkpointed;
  3. stage-2 class-conditional latent DDPM over all codes (CFG
     null-token; the SCALE.md sweep-winning big300k recipe), ckpt'd;
  4. per class at CFG 1.5: 64 DDIM-50 samples -> 96^3 decode -> 2048-pt
     clouds, vs 64 HELD-OUT per-class references (fresh split seed,
     analytic SDF through the SAME hierarchical decode + MC + sampling
     — data/analytic_jax.csg_apply_flat), MMD/COV/1-NNA per class;
  5. CFG-scale sweep (1.0 / 1.5 / 2.0 / 3.0): 16 samples/class each,
     class-identity rate + mean own-class MMD vs the held-out refs;
  6. 512^3 sparse serving rate on 8 conditional samples.

Stage checkpoints under runs/multicat6k/ are reused on re-run
(MULTICAT6K_REUSE=0 disables). Writes runs/multicat6k/report.json and
rewrites MULTICAT.md from it (+ the miniature run's history line).
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/multicat6k_run.py
(TPU otherwise idle; ~60-80 min cold, minutes when stages are reused).
"""

import json
import os
import pathlib
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT = ROOT / "runs" / "multicat6k"
N_CLASSES = 13
N_PER_CLASS = 472
N_TRAIN = N_CLASSES * N_PER_CLASS          # 6136
SAMPLES_PER_SHAPE = 16384
EPOCHS = 150
SCENES_PER_BATCH = 64
DIFF_STEPS = 300_000
DIFF_BATCH = 128
DIFF_DENOISER = {"latent_size": 256, "hidden_dim": 1024, "num_blocks": 6,
                 "num_classes": N_CLASSES, "cond_drop_prob": 0.1}
N_GEN = 64                                  # per class, headline CFG
CFG_HEAD = 1.5
CFG_SWEEP = (1.0, 1.5, 2.0, 3.0)
N_SWEEP = 16                                # per class per CFG scale
SERVE_RES = 512
RES_EVAL = 96
PTS = 2048
HELD_SEED = 7707                            # training split uses seed=5


def main():
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.tpu_lock import (
        acquire_or_die)
    _tpu_lock = acquire_or_die("tools/multicat6k_run")  # one chip, one process
    global N_PER_CLASS, N_TRAIN, SAMPLES_PER_SHAPE, EPOCHS, DIFF_STEPS, \
        N_GEN, N_SWEEP, RES_EVAL, OUT
    import sys
    if "--smoke" in sys.argv:  # plumbing check: tiny everything
        N_PER_CLASS, SAMPLES_PER_SHAPE, EPOCHS = 4, 2048, 3
        N_TRAIN = N_CLASSES * N_PER_CLASS
        DIFF_STEPS, N_GEN, N_SWEEP, RES_EVAL = 600, 4, 2, 48
        global SERVE_RES
        SERVE_RES = 128
        OUT = pathlib.Path("/tmp/multicat6k_smoke")
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.compilation_cache \
        import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from latent_diffusion_models_for_shape_sdfs_tpu.config import (
        AdConfig, DecoderConfig, DiffConfig, DenoiserConfig)
    from latent_diffusion_models_for_shape_sdfs_tpu.data import (
        analytic, analytic_jax)
    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion import (
        DiffusionSchedule, ddim_sample)
    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.sampler import (
        guided_denoise_fn)
    from latent_diffusion_models_for_shape_sdfs_tpu.evaluation import (
        sample_mesh_surface)
    from latent_diffusion_models_for_shape_sdfs_tpu.evaluation.device_metrics \
        import evaluate_generated_device, pairwise_metric
    from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import (
        SdfDecoder)
    from latent_diffusion_models_for_shape_sdfs_tpu.models.denoiser import (
        CondDenoiser)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_adaptive)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.isosurface import (
        extract_mesh)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.pallas_kernels import (
        make_pallas_apply)
    from latent_diffusion_models_for_shape_sdfs_tpu.serve import (
        serve_meshes)
    from latent_diffusion_models_for_shape_sdfs_tpu.train import (
        train_auto_decoder, train_diffusion)
    from latent_diffusion_models_for_shape_sdfs_tpu.train.diffusion import (
        init_diff_state, unnormalize_codes)
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.checkpoint import (
        StageCheckpointer)
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.logging import (
        MetricLogger)

    OUT.mkdir(parents=True, exist_ok=True)
    np.asarray(jnp.ones(8))
    report_path = OUT / "report.json"
    report = {"device": str(jax.devices()[0].device_kind),
              "n_classes": N_CLASSES, "per_class": N_PER_CLASS,
              "num_scenes": N_TRAIN,
              "samples_per_shape": SAMPLES_PER_SHAPE}

    shapes = analytic.make_synthetic_split("classes13", N_TRAIN, seed=5)
    class_ids = np.asarray([s["class_id"] for s in shapes], np.int32)
    assert (np.bincount(class_ids, minlength=N_CLASSES)
            == N_PER_CLASS).all()
    reuse_env = os.environ.get("MULTICAT6K_REUSE", "1") == "1"

    # ---------------- stage 1 (device CSG bank + fused-Pallas training)
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.checkpoint import (
        pack_tree_npz, restore_stage1)
    decoder = SdfDecoder(DecoderConfig())
    ck = StageCheckpointer(OUT, "ad", max_to_keep=1)
    reuse_ad = (reuse_env
                and (ck.latest_step() is not None
                     or (OUT / "stage1_pack.npz").exists())
                and report_path.exists())
    ck.close()
    if reuse_ad:
        tmpl = {"params": decoder.init_params(jax.random.PRNGKey(0)),
                "codes": jnp.zeros((N_TRAIN, 256), jnp.float32)}
        st = restore_stage1(OUT, tmpl)
        params, codes = st["params"], st["codes"]
        prev = json.loads(report_path.read_text())
        for k in ("bank_seconds", "bank_bytes", "ad_final_l1",
                  "ad_seconds", "ad_steps_per_sec",
                  "train_chamfer_per_class", "train_chamfer_median"):
            if k in prev:
                report[k] = prev[k]
        print(f"stage-1 restored "
              f"(l1={report.get('ad_final_l1', float('nan')):.4f})",
              flush=True)
    else:
        t0 = time.time()
        bank = analytic_jax.bank_from_csg(
            shapes, jax.random.PRNGKey(0), SAMPLES_PER_SHAPE)
        jax.block_until_ready(bank.pos)
        report["bank_seconds"] = time.time() - t0
        report["bank_bytes"] = int(bank.pos.nbytes + bank.neg.nbytes)
        print(f"device CSG bank: {report['bank_seconds']:.0f}s, "
              f"{report['bank_bytes']/2**30:.2f} GiB", flush=True)
        cfg = AdConfig(
            decoder=DecoderConfig(),
            num_scenes=N_TRAIN, scenes_per_batch=SCENES_PER_BATCH,
            samples_per_scene=SAMPLES_PER_SHAPE,
            clamp_dist=0.1, num_epochs=EPOCHS, lr_decay_interval=60,
            use_pallas=True, device_data=True, seed=0)
        t0 = time.time()
        decoder, state, metrics = train_auto_decoder(
            cfg, None, bank=bank,
            logger=MetricLogger(OUT / "train_ad.jsonl"))
        t_ad = time.time() - t0
        steps = EPOCHS * ((N_TRAIN + SCENES_PER_BATCH - 1)
                          // SCENES_PER_BATCH)
        report.update(ad_final_l1=float(metrics["loss_l1"]),
                      ad_seconds=t_ad, ad_steps_per_sec=steps / t_ad)
        print(f"stage1: l1={report['ad_final_l1']:.4f} in {t_ad:.0f}s "
              f"({steps / t_ad:.1f} steps/s)", flush=True)
        del bank
        ck = StageCheckpointer(OUT, "ad", max_to_keep=1)
        ck.save(EPOCHS, {"params": state.params, "codes": state.codes})
        ck.close()
        # git-persistable twin of the orbax tree (see tools/scale_run.py)
        pack_tree_npz(OUT / "stage1_pack.npz",
                      {"params": state.params, "codes": state.codes})
        params, codes = state.params, state.codes
        report_path.write_text(json.dumps(report, indent=2,
                                          default=float))
    apply_fn = make_pallas_apply(decoder, params)

    # train-set fidelity: one decoded shape per class vs its analytic
    # surface (gridMC protocol for symmetry with the refs below)
    from latent_diffusion_models_for_shape_sdfs_tpu.evaluation import (
        chamfer_l2)
    if "train_chamfer_per_class" not in report:
        packed_train = analytic_jax.pack_csg(shapes)
        flat_train = packed_train.flat()
        cham = []
        for c in range(N_CLASSES):
            i = int(np.nonzero(class_ids == c)[0][0])
            grid = decode_grid_adaptive(apply_fn, codes[i], 128)
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
        report_path.write_text(json.dumps(report, indent=2,
                                          default=float))

    # ---------------- stage 2: class-conditional DDPM (CFG null token)
    dcfg = DiffConfig(
        denoiser=DenoiserConfig(**DIFF_DENOISER),
        timesteps=1000, batch_size=DIFF_BATCH, num_steps=DIFF_STEPS,
        lr=2e-4, lr_schedule="cosine", warmup_steps=2000,
        scan_chunk=min(2000, DIFF_STEPS), seed=0)
    dmodel = CondDenoiser(dcfg.denoiser)
    dck = StageCheckpointer(OUT, "diff", max_to_keep=1)
    reuse_diff = reuse_env and dck.latest_step() is not None
    if reuse_diff:
        tmpl_d = init_diff_state(dcfg, dmodel, jax.random.PRNGKey(0))
        drest = dck.restore({"params": tmpl_d.params,
                             "ema": tmpl_d.ema_params,
                             "mu": jnp.zeros(256),
                             "sigma": jnp.zeros(256)})
        dck.close()
        ema, mu, sigma = drest["ema"], drest["mu"], drest["sigma"]
        prev = json.loads(report_path.read_text())
        for k in ("diff_loss", "diff_seconds"):
            if k in prev:
                report[k] = prev[k]
        print("stage-2 restored", flush=True)
    else:
        t0 = time.time()
        model, dstate, (mu, sigma), dloss = train_diffusion(
            dcfg, codes, class_ids=class_ids,
            logger=MetricLogger(OUT / "train_diff.jsonl"))
        report["diff_loss"] = float(dloss)
        report["diff_seconds"] = time.time() - t0
        print(f"stage2 (class-cond): loss={report['diff_loss']:.3f} "
              f"in {report['diff_seconds']:.0f}s", flush=True)
        dck.save(DIFF_STEPS, {"params": dstate.params,
                              "ema": dstate.ema_params,
                              "mu": mu, "sigma": sigma})
        dck.close()
        ema = dstate.ema_params
        report_path.write_text(json.dumps(report, indent=2,
                                          default=float))
    sch = DiffusionSchedule.create(dcfg.timesteps)

    def sample_class(c, n, scale, seed):
        fn = guided_denoise_fn(dmodel.apply, ema, scale,
                               class_id=jnp.full((n,), c, jnp.int32))
        return unnormalize_codes(
            ddim_sample(fn, sch, jax.random.PRNGKey(seed), n, 256,
                        steps=50), mu, sigma)

    def decode_clouds(zs, seed0, pts=PTS):
        clouds, empty = [], 0
        for i in range(zs.shape[0]):
            grid = decode_grid_adaptive(apply_fn, zs[i], RES_EVAL)
            v, f = extract_mesh(grid)
            if len(f) < 50:
                empty += 1
                continue
            clouds.append(sample_mesh_surface(v, f, pts, seed=seed0 + i))
        return clouds, empty

    # ---------------- held-out per-class reference clouds (gridMC:
    # analytic SDF through the IDENTICAL decode pipeline, one compiled
    # program for all shapes via the flat CSG packing)
    # 2x pool per class: the CSG `difference` family can draw the EMPTY
    # SET (subtracted primitive swallows the base — e.g. seed-7707 shape
    # 422, two spheres with dist+r_base < r_sub; 1/58 differences in the
    # 832-draw). A surface-free shape has no point cloud, so it cannot
    # participate in cloud metrics by construction — skip it and take
    # the next held-out draw of the same class (mirrors the gen side,
    # where empty decodes are skipped and counted). The pool is class-
    # balanced (128/class) and its first 832 draws equal the 832-draw
    # (sequential rng), so non-degenerate refs are unchanged.
    held_shapes = analytic.make_synthetic_split(
        "classes13", 2 * N_CLASSES * N_GEN, seed=HELD_SEED)
    held_ids = np.asarray([s["class_id"] for s in held_shapes], np.int32)
    flat_held = analytic_jax.pack_csg(held_shapes).flat()

    t0 = time.time()
    ref_by_class = {}
    ref_degenerate = {}
    for c in range(N_CLASSES):
        idx = np.nonzero(held_ids == c)[0]
        clouds = []
        skipped = 0
        for j in idx:
            if len(clouds) == N_GEN:
                break
            grid = decode_grid_adaptive(analytic_jax.csg_apply_flat,
                                        flat_held[int(j)], RES_EVAL)
            v, f = extract_mesh(grid)
            if len(f) < 50:    # degenerate analytic draw (empty set)
                skipped += 1
                continue
            clouds.append(sample_mesh_surface(v, f, PTS,
                                              seed=50_000 + int(j)))
        assert len(clouds) == N_GEN, \
            (f"class {c}: only {len(clouds)}/{N_GEN} non-degenerate "
             f"held-out refs in a {len(idx)}-draw pool")
        ref_by_class[c] = clouds
        if skipped:
            ref_degenerate[c] = skipped
    report["ref_degenerate_skipped"] = ref_degenerate
    print(f"held-out gridMC refs ({N_CLASSES}x{N_GEN}) in "
          f"{time.time()-t0:.0f}s", flush=True)

    # ---------------- headline: per-class generative metrics at CFG 1.5
    t0 = time.time()
    per_class = {}
    gen_by_class = {}
    for c in range(N_CLASSES):
        zc = sample_class(c, N_GEN, CFG_HEAD, 100 + c)
        clouds, empty = decode_clouds(zc, 10_000 + c * N_GEN)
        gen_by_class[c] = clouds
        m = min(len(clouds), len(ref_by_class[c]))
        if m == 0:   # every sample decoded empty (a real model failure
            # for this class — record it, don't crash the battery)
            per_class[c] = {"one_nna": 1.0, "coverage": 0.0,
                            "mmd_chamfer": float("inf"),
                            "empty": empty, "n": 0}
            print(f"class {c}: ALL {N_GEN} samples empty", flush=True)
            continue
        row = evaluate_generated_device(clouds[:m], ref_by_class[c][:m],
                                        metrics=("chamfer",), chunk=8)
        row["empty"] = empty
        row["n"] = m
        per_class[c] = row
        print(f"class {c}: 1nna={row['one_nna']:.2f} "
              f"cov={row['coverage']:.2f} mmd={row['mmd_chamfer']:.2e} "
              f"({empty} empty)", flush=True)
    report["per_class_heldout"] = per_class
    report["headline_cfg"] = CFG_HEAD
    report["one_nna_median"] = float(np.median(
        [r["one_nna"] for r in per_class.values()]))
    report["coverage_median"] = float(np.median(
        [r["coverage"] for r in per_class.values()]))
    report["mmd_median"] = float(np.median(
        [r["mmd_chamfer"] for r in per_class.values()]))
    report["total_empty_headline"] = int(sum(
        r["empty"] for r in per_class.values()))
    report["headline_seconds"] = time.time() - t0
    print(f"headline medians: 1nna={report['one_nna_median']:.2f} "
          f"cov={report['coverage_median']:.2f} "
          f"mmd={report['mmd_median']:.2e}", flush=True)
    report_path.write_text(json.dumps(report, indent=2, default=float))

    # class identity at the headline scale: own-class MMD must beat
    # the pooled other-class MMD (the miniature run's check, now against
    # HELD-OUT refs)
    ident_ok = 0
    for c in range(N_CLASSES):
        if not gen_by_class[c]:
            continue
        own = per_class[c]["mmd_chamfer"]
        other_refs = [p for cc in range(N_CLASSES) if cc != c
                      for p in ref_by_class[cc][:5]]
        oth = pairwise_metric(gen_by_class[c], other_refs, "chamfer",
                              chunk=8)
        per_class[c]["mmd_other"] = float(oth.min(axis=1).mean())
        if own < per_class[c]["mmd_other"]:
            ident_ok += 1
    report["class_identity_ok_heldout"] = ident_ok
    print(f"class identity vs held-out refs: {ident_ok}/{N_CLASSES}",
          flush=True)
    report_path.write_text(json.dumps(report, indent=2, default=float))

    # ---------------- CFG-scale sweep (identity + own-class MMD)
    sweep = {}
    for scale in CFG_SWEEP:
        t0 = time.time()
        ok = 0
        mmds = []
        empties = 0
        for c in range(N_CLASSES):
            zc = sample_class(c, N_SWEEP, scale, 900 + c)
            clouds, empty = decode_clouds(zc, 60_000 + c * N_SWEEP,
                                          pts=1024)
            empties += empty
            if not clouds:
                continue
            refs_small = [r[:1024] for r in ref_by_class[c][:16]]
            own = pairwise_metric(clouds, refs_small, "chamfer", chunk=8)
            other_refs = [ref_by_class[cc][j][:1024]
                          for cc in range(N_CLASSES) if cc != c
                          for j in range(2)]
            oth = pairwise_metric(clouds, other_refs, "chamfer", chunk=8)
            mmd_own = float(own.min(axis=1).mean())
            if mmd_own < float(oth.min(axis=1).mean()):
                ok += 1
            mmds.append(mmd_own)
        sweep[str(scale)] = {
            "identity_ok": ok, "empty": empties,
            "mmd_own_median": float(np.median(mmds)) if mmds else None,
            "seconds": round(time.time() - t0, 1)}
        mm = sweep[str(scale)]["mmd_own_median"]
        print(f"cfg {scale}: identity {ok}/{N_CLASSES}, "
              f"mmd_own median "
              f"{'n/a (all empty)' if mm is None else format(mm, '.2e')},"
              f" {empties} empty", flush=True)
    report["cfg_sweep"] = sweep
    report_path.write_text(json.dumps(report, indent=2, default=float))

    # ---------------- 512^3 serving on the conditional model
    z8 = sample_class(3, 8, CFG_HEAD, 4321)   # a geometric class (box?)
    zs = [jax.block_until_ready(z8[i]) for i in range(8)]
    next(iter(serve_meshes(apply_fn, zs[:1], res=SERVE_RES)))  # warm
    t0 = time.time()
    nmesh = nverts = 0
    for v, f, stt in serve_meshes(apply_fn, zs[1:], res=SERVE_RES):
        nmesh += 1
        nverts += len(v)
    dt = (time.time() - t0) / max(nmesh, 1)
    report["serve_512_res"] = SERVE_RES
    report["serve_512_ms_per_mesh"] = dt * 1e3
    report["serve_512_verts_per_mesh"] = nverts // max(nmesh, 1)
    print(f"serve {SERVE_RES}^3 (conditional samples): {dt*1e3:.0f} "
          f"ms/mesh ({nverts // max(nmesh, 1)} verts)", flush=True)
    report_path.write_text(json.dumps(report, indent=2, default=float))
    if "--smoke" in sys.argv:
        print("SMOKE DONE")
    else:
        write_multicat_md(report)
        print("wrote MULTICAT.md")


def write_multicat_md(report: dict) -> None:
    mini = {}
    mini_path = ROOT / "runs" / "multicat13" / "report.json"
    if mini_path.exists():
        mini = json.loads(mini_path.read_text())
    pc = report["per_class_heldout"]
    nna = [round(pc[c]["one_nna"], 2) for c in sorted(pc, key=int)]
    cov = [round(pc[c]["coverage"], 2) for c in sorted(pc, key=int)]
    sweep_lines = [
        f"  - CFG {s}: identity {v['identity_ok']}/13, own-class MMD "
        f"median "
        f"{'n/a (all empty)' if v['mmd_own_median'] is None else format(v['mmd_own_median'], '.2e')}"  # noqa: E501
        f", {v['empty']} empty"
        for s, v in report["cfg_sweep"].items()]
    md = [
        "# MULTICAT — BASELINE config 5 at spec scale "
        f"({report['num_scenes']} latents = 13 x "
        f"{report['per_class']}, class-conditional CFG, 1x v5e)\n",
        "Tooling: `tools/multicat6k_run.py` (stage checkpoints under "
        "`runs/multicat6k/`); raw numbers `runs/multicat6k/report.json`."
        " The 416-latent miniature (round 3, `tools/multicat_run.py`) "
        "remains in `runs/multicat13/`.\n",
        f"- device: {report['device']}; multi-category sample bank "
        f"({report['num_scenes']}x{report['samples_per_shape']}, "
        f"{report.get('bank_bytes', 0)/2**30:.2f} GiB) generated ON "
        f"DEVICE via the generic packed-CSG evaluator in "
        f"{report.get('bank_seconds', float('nan')):.0f}s "
        f"(data/analytic_jax.bank_from_csg)",
        f"- stage-1 joint auto-decoder over all 13 families (fused "
        f"Pallas): L1 {report['ad_final_l1']:.4f} in "
        f"{report.get('ad_seconds', float('nan')):.0f}s "
        f"({report.get('ad_steps_per_sec', float('nan')):.1f} steps/s)",
        f"- train-set Chamfer-L2 (1/class, 128^3): median "
        f"{report['train_chamfer_median']:.2e}",
        f"- stage-2 class-conditional DDPM (big300k recipe + 13-class "
        f"embedding, CFG null-token): eps-MSE "
        f"{report['diff_loss']:.3f} after {DIFF_STEPS} steps "
        f"({report.get('diff_seconds', float('nan')):.0f}s)",
        f"- per-class generative metrics at CFG {report['headline_cfg']}"
        f", {N_GEN}/class DDIM-50 vs {N_GEN}/class HELD-OUT refs (fresh "
        f"split seed {HELD_SEED}, analytic SDF through the identical "
        f"96^3 decode->MC->2048-pt pipeline): 1-NNA median "
        f"**{report['one_nna_median']:.2f}**, COV median "
        f"{report['coverage_median']:.2f}, MMD median "
        f"{report['mmd_median']:.2e}; per-class 1-NNA {nna}; per-class "
        f"COV {cov}; {report['total_empty_headline']} empty of "
        f"{13 * N_GEN}",
        f"- class identity vs held-out refs: "
        f"{report['class_identity_ok_heldout']}/13 classes closer to "
        f"their own reference set than to the other-class pool",
        "- CFG-scale sweep (16/class):",
        *sweep_lines,
        f"- 512^3 sparse serving on conditional samples: "
        f"{report['serve_512_ms_per_mesh']:.0f} ms/mesh "
        f"({report['serve_512_verts_per_mesh']} verts)",
    ]
    deg = report.get("ref_degenerate_skipped") or {}
    if deg:
        md += [
            f"- held-out ref provenance: {sum(deg.values())} degenerate "
            f"analytic draw(s) skipped (class:count {deg}) — the CSG "
            f"`difference` family can draw the empty set (subtracted "
            f"primitive swallows the base); surface-free shapes cannot "
            f"participate in cloud metrics, the next held-out draw of "
            f"the same class substitutes",
        ]
    if mini:
        md += [
            "",
            f"History (round-3 miniature, 416 latents): class identity "
            f"{mini.get('class_identity_ok', '?')}/13, "
            f"{104 - mini.get('total_empty', 0)}/104 geometry, "
            f"stage-1 L1 {mini.get('ad_final_l1', float('nan')):.4f}.",
        ]
    md += [
        "",
        "DP / 512^3 / sharded-DDIM legs of config 5: exact-parity on an "
        "8-way CPU mesh incl. the fused-Pallas shard_map paths "
        "(tests/test_dp_cpu.py), AOT sharding specs (tests/test_mesh.py"
        "), 512^3 rate in BASELINE.md.",
    ]
    (ROOT / "MULTICAT.md").write_text("\n".join(md) + "\n")


if __name__ == "__main__":
    main()
