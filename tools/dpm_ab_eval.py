"""DPM-Solver++(2M) vs DDIM-50 generative fidelity A/B at the 6k scale.

Restores the stage-1/stage-2 checkpoints persisted by tools/scale_run.py
under runs/scale_chairs6k (no retraining), samples 64 latents with each
sampler from the SAME z_T, decodes through the identical
decode->MC->sample pipeline, and computes MMD/COV/1-NNA (both metrics,
tools/metrics_run.compute_metrics ladder) against the SAME decoded
reference clouds the headline SCALE.md row used (metric_clouds.npz
['ref']) — so the DPM rows are directly comparable to the DDIM-50
headline. Results merge into report.json ("dpm_ab") and print a
markdown row block to paste into SCALE.md.

Usage (TPU, serialized with other device work):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/dpm_ab_eval.py \
      [--steps 10] [--gen 64]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT = ROOT / "runs" / "scale_chairs6k"
sys.path.insert(0, str(ROOT))

N_TRAIN = 6144
DIFF_DENOISER = {"hidden_dim": 1024, "num_blocks": 6}


def main(argv=None):
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.tpu_lock import (
        acquire_or_die)
    _tpu_lock = acquire_or_die("tools/dpm_ab_eval")  # one chip, one process
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10,
                    help="DPM-Solver++(2M) denoiser calls")
    ap.add_argument("--gen", type=int, default=64)
    ap.add_argument("--res", type=int, default=96)
    args = ap.parse_args(argv)

    from latent_diffusion_models_for_shape_sdfs_tpu.utils. \
        compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from latent_diffusion_models_for_shape_sdfs_tpu.config import (
        DecoderConfig, DenoiserConfig)
    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion import (
        DiffusionSchedule)
    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.sampler \
        import ddim_sample, dpm_solver_sample
    from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import (
        SdfDecoder)
    from latent_diffusion_models_for_shape_sdfs_tpu.models.denoiser import (
        CondDenoiser)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_adaptive)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.isosurface import (
        extract_mesh)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.pallas_kernels \
        import make_pallas_apply
    from latent_diffusion_models_for_shape_sdfs_tpu.evaluation import (
        sample_mesh_surface)
    from latent_diffusion_models_for_shape_sdfs_tpu.train.diffusion import (
        unnormalize_codes)
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.checkpoint \
        import StageCheckpointer
    from tools.metrics_run import compute_metrics

    np.asarray(jnp.ones(8))  # d2h channel warm

    # ---------------- restore both stages (scale_run layouts)
    decoder = SdfDecoder(DecoderConfig())
    ck = StageCheckpointer(OUT, "ad", max_to_keep=1)
    st = ck.restore({"params": decoder.init_params(jax.random.PRNGKey(0)),
                     "codes": jnp.zeros((N_TRAIN, 256), jnp.float32)})
    ck.close()
    params = st["params"]
    apply_fn = make_pallas_apply(decoder, params)

    # scale_run's train_diffusion builds CondDenoiser (the conditional
    # wrapper; unconditional here since the run had no classes)
    den = CondDenoiser(DenoiserConfig(**DIFF_DENOISER))
    dtmpl = den.init({"params": jax.random.PRNGKey(0)},
                     jnp.zeros((1, 256)), jnp.zeros((1,), jnp.int32))
    ckd = StageCheckpointer(OUT, "diff", max_to_keep=1)
    std = ckd.restore({"params": dtmpl["params"], "ema": dtmpl["params"],
                       "mu": jnp.zeros((256,)),
                       "sigma": jnp.zeros((256,))})
    ckd.close()
    fn = lambda z, t: den.apply({"params": std["ema"]}, z, t)
    sch = DiffusionSchedule.create(1000)

    refs = np.load(OUT / "metric_clouds.npz")["ref"]
    ref_clouds = [refs[i] for i in range(len(refs))]

    # same z_T for both samplers: the A/B isolates the solver
    key = jax.random.PRNGKey(17)
    _, k0 = jax.random.split(key)
    z_T = jax.random.normal(k0, (args.gen, 256), jnp.float32)

    def clouds_for(sampler, steps):
        t0 = time.time()
        if sampler == "ddim":
            zn = ddim_sample(fn, sch, key, args.gen, 256, steps=steps,
                             z_init=z_T)
        else:
            zn = dpm_solver_sample(fn, sch, key, args.gen, 256,
                                   steps=steps, z_init=z_T)
        zg = unnormalize_codes(zn, std["mu"], std["sigma"])
        jax.block_until_ready(zg)
        t_sample = time.time() - t0
        out, n_empty = [], 0
        for i in range(args.gen):
            grid = decode_grid_adaptive(apply_fn, zg[i], args.res)
            v, f = extract_mesh(grid)
            if len(f) < 50:
                n_empty += 1
                continue
            out.append(sample_mesh_surface(v, f, 2048, seed=100 + i))
        return out, n_empty, t_sample

    results = {}
    for name, sampler, steps in (("ddim50", "ddim", 50),
                                 (f"dpm{args.steps}", "dpm", args.steps)):
        gen, n_empty, t_sample = clouds_for(sampler, steps)
        gm = compute_metrics(gen, ref_clouds)
        gm["empty"] = n_empty
        gm["sample_seconds"] = t_sample
        results[name] = gm
        print(f"[{name}] 1-NNA {gm['one_nna']:.2f} COV "
              f"{gm['coverage']:.2f} MMD-CD {gm['mmd_chamfer']:.2e} "
              f"1-NNA-EMD {gm.get('one_nna_emd', float('nan')):.2f} "
              f"empty {n_empty} sample_s {t_sample:.2f}", flush=True)

    rep_path = OUT / "report.json"
    rep = json.loads(rep_path.read_text()) if rep_path.exists() else {}
    rep["dpm_ab"] = {"steps": args.steps, "gen": args.gen,
                     "res": args.res, "results": results}
    rep_path.write_text(json.dumps(rep, indent=2))

    print("\nSCALE.md rows (same-z_T A/B, decoded-ref protocol):")
    for name, gm in results.items():
        print(f"| {name} | {gm['one_nna']:.2f} | {gm['coverage']:.2f} | "
              f"{gm['mmd_chamfer']:.2e} | "
              f"{gm.get('one_nna_emd', float('nan')):.2f} | "
              f"{gm['empty']} | {gm['sample_seconds']:.2f}s |")


if __name__ == "__main__":
    main()
