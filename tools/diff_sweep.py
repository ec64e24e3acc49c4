"""Stage-2 fidelity sweep at the 6k spec scale (VERDICT r2 #2).

Round 2's latent DDPM measured 1-NNA 0.91 at the 6144-latent scale —
the sampler's output distribution was easily separable from the
training codes. Stage-2 training costs ~1s/1200 steps on the v5e (the
whole dataset is a 6 MB device-resident table), so the honest fix is an
actual sweep: training length + LR schedule, denoiser capacity, the
UNet variant's first real run, DDPM-1000 vs DDIM-50 sampling, and ZCA-
whitened codes (per-dim normalization leaves strong cross-dim
correlations in auto-decoder latents; full whitening makes the prior
N(0, I) actually match the data's second moment).

Reuses the stage-1 checkpoint saved by tools/scale_run.py — no decoder
retraining. Each arm: train -> 64 DDIM/DDPM samples -> decode 96^3 ->
2048-pt clouds -> device Chamfer MMD/COV/1-NNA vs 64 fixed refs.
Resume-safe: arms already in diff_sweep.json are skipped.

Writes runs/scale_chairs6k/diff_sweep.json (+ per-arm sample clouds for
the winner).
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/diff_sweep.py
"""

import json
import pathlib
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT = ROOT / "runs" / "scale_chairs6k"
N_TRAIN = 6144
N_GEN = 64

ARMS = {
    # name: (DiffConfig overrides, sampler, whiten)
    "base60k": (dict(num_steps=60_000, lr=2e-4, batch_size=64),
                "ddim", False),
    "long300k": (dict(num_steps=300_000, lr=2e-4, batch_size=64,
                      lr_schedule="cosine", warmup_steps=2000),
                 "ddim", False),
    "big300k": (dict(num_steps=300_000, lr=2e-4, batch_size=128,
                     lr_schedule="cosine", warmup_steps=2000,
                     denoiser=dict(hidden_dim=1024, num_blocks=6)),
                "ddim", False),
    "long300k_ddpm": (dict(num_steps=300_000, lr=2e-4, batch_size=64,
                           lr_schedule="cosine", warmup_steps=2000),
                      "ddpm", False),
    "unet300k": (dict(num_steps=300_000, lr=2e-4, batch_size=64,
                      lr_schedule="cosine", warmup_steps=2000,
                      denoiser=dict(arch="unet")),
                 "ddim", False),
    "whiten300k": (dict(num_steps=300_000, lr=2e-4, batch_size=64,
                        lr_schedule="cosine", warmup_steps=2000),
                   "ddim", True),
}
# dropped after round-3 v1: whiten_big600k (bs256, h1024) collapsed to
# COV 0.125 / MMD 8.6e-3 — whitening amplifies the code table's noise
# directions and the big net memorizes them; documented negative result
# (runs/scale_chairs6k/diff_sweep_protocol_v1.json).


def zca(codes: np.ndarray, eps: float = 1e-4):
    """ZCA whitening of the code table. Returns (whitened, mu, W, W_inv).

    eps regularizes small eigenvalues (the 6144x256 table is full rank
    but the tail eigenvalues are tiny — unregularized whitening blows
    the noise directions up into the diffusion training signal)."""
    mu = codes.mean(0)
    x = codes - mu
    cov = x.T @ x / len(x)
    evals, evecs = np.linalg.eigh(cov)
    evals = np.maximum(evals, 0.0) + eps
    W = evecs @ np.diag(evals ** -0.5) @ evecs.T
    W_inv = evecs @ np.diag(evals ** 0.5) @ evecs.T
    return (x @ W).astype(np.float32), mu, W, W_inv


def main():
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.tpu_lock import (
        acquire_or_die)
    _tpu_lock = acquire_or_die("tools/diff_sweep")  # one chip, one process
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.compilation_cache import (  # noqa: E501
        enable_compilation_cache)
    enable_compilation_cache()
    import dataclasses
    import jax
    import jax.numpy as jnp
    from latent_diffusion_models_for_shape_sdfs_tpu.config import (
        DecoderConfig, DiffConfig, DenoiserConfig)
    from latent_diffusion_models_for_shape_sdfs_tpu.data import analytic
    from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import (
        SdfDecoder)
    from latent_diffusion_models_for_shape_sdfs_tpu.train import (
        train_diffusion)
    from latent_diffusion_models_for_shape_sdfs_tpu.train.diffusion import (
        unnormalize_codes)
    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion import (
        DiffusionSchedule, ddim_sample, ddpm_sample)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.pallas_kernels import (
        make_pallas_apply)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_adaptive)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.isosurface import (
        extract_mesh)
    from latent_diffusion_models_for_shape_sdfs_tpu.evaluation import (
        evaluate_generated_device, sample_mesh_surface)
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.checkpoint import (
        StageCheckpointer)

    np.asarray(jnp.ones(8))
    sweep_path = OUT / "diff_sweep.json"
    sweep = (json.loads(sweep_path.read_text())
             if sweep_path.exists() else {})

    decoder = SdfDecoder(DecoderConfig())
    tmpl = {"params": decoder.init_params(jax.random.PRNGKey(0)),
            "codes": jnp.zeros((N_TRAIN, 256), jnp.float32)}
    ck = StageCheckpointer(OUT, "ad", max_to_keep=1)
    st = ck.restore(tmpl)
    ck.close()
    params, codes = st["params"], np.asarray(st["codes"])
    apply_fn = make_pallas_apply(decoder, params)

    shapes = analytic.make_synthetic_split("chair", N_TRAIN + 1, seed=11)
    # analytic reference clouds (round-2 protocol, kept for continuity)
    ref_analytic = [analytic.sample_surface(shapes[(i * 7) % N_TRAIN],
                                            2048,
                                            np.random.default_rng(200 + i))
                    for i in range(N_GEN)]
    # DECODED reference clouds — the headline protocol. The oracle
    # control exposed a ~0.66 1-NNA floor when generated (decoded) and
    # reference (analytic) clouds go through different pipelines: the
    # 1-NN classifier keys on decode/meshing artifacts, not sampler
    # error. Processing both sets identically (decode the true code of
    # each reference shape through the same decode->MC->sample chain)
    # removes that confound; this is the point-cloud literature's
    # same-renderer convention.
    ref_cache = OUT / "ref_decoded_96.npz"
    if ref_cache.exists():
        ref_decoded = list(np.load(ref_cache)["ref"])
    else:
        ref_decoded = []
        for i in range(N_GEN):
            idx = (i * 7) % N_TRAIN
            grid = decode_grid_adaptive(apply_fn, jnp.asarray(codes[idx]),
                                        96)
            v, f = extract_mesh(grid)
            ref_decoded.append(sample_mesh_surface(v, f, 2048,
                                                   seed=200 + i))
        np.savez_compressed(ref_cache, ref=np.stack(ref_decoded))

    def both_metrics(gen_clouds):
        gm_d = evaluate_generated_device(gen_clouds, ref_decoded,
                                         metrics=("chamfer",), chunk=4)
        gm_a = evaluate_generated_device(gen_clouds, ref_analytic,
                                         metrics=("chamfer",), chunk=4)
        return {"one_nna": round(gm_d["one_nna"], 4),
                "coverage": round(gm_d["coverage"], 4),
                "mmd_chamfer": gm_d["mmd_chamfer"],
                "one_nna_analytic": round(gm_a["one_nna"], 4),
                "coverage_analytic": round(gm_a["coverage"], 4),
                "mmd_chamfer_analytic": gm_a["mmd_chamfer"]}

    # ---- control arm: NO diffusion — the TRUE training codes of the
    # reference shapes, decoded identically but surface-sampled with a
    # different seed. Against ref_decoded these are paired twins: the
    # ideal/floor of the headline protocol (should read ~0.5). Against
    # ref_analytic it measures the decode-pipeline artifact gap (read
    # 0.656 in round 3 — the motivation for the decoded-ref protocol).
    if "oracle_true_codes" not in sweep:
        gen_clouds = []
        for i in range(N_GEN):
            idx = (i * 7) % N_TRAIN
            grid = decode_grid_adaptive(apply_fn,
                                        jnp.asarray(codes[idx]), 96)
            v, f = extract_mesh(grid)
            gen_clouds.append(sample_mesh_surface(v, f, 2048,
                                                  seed=100 + i))
        row = both_metrics(gen_clouds)
        row.update({"empty": 0, "eps_mse": None,
                    "sampler": "none (true codes of the ref shapes)",
                    "whiten": False, "train_seconds": 0.0, "config": {}})
        sweep["oracle_true_codes"] = row
        sweep_path.write_text(json.dumps(sweep, indent=2))
        print(f"[oracle_true_codes] 1nna={row['one_nna']} (analytic "
              f"{row['one_nna_analytic']}) mmd={row['mmd_chamfer']:.2e}",
              flush=True)

    for name, (over, sampler, whiten) in ARMS.items():
        if name in sweep:
            print(f"[{name}] cached: {sweep[name]}", flush=True)
            continue
        t0 = time.time()
        dn_over = over.pop("denoiser", {})
        dcfg = DiffConfig(denoiser=DenoiserConfig(**dn_over),
                          timesteps=1000, scan_chunk=2000, seed=0, **over)
        train_codes = codes
        if whiten:
            train_codes, w_mu, _W, W_inv = zca(codes)
        model, dstate, (mu, sigma), dloss = train_diffusion(
            dcfg, train_codes)
        t_train = time.time() - t0

        sch = DiffusionSchedule.create(dcfg.timesteps)
        fn = lambda z, t: model.apply({"params": dstate.ema_params}, z, t)
        key = jax.random.PRNGKey(17)
        if sampler == "ddim":
            zn = ddim_sample(fn, sch, key, N_GEN, 256, steps=50)
        else:
            zn = ddpm_sample(fn, sch, key, N_GEN, 256)
        zs = np.asarray(unnormalize_codes(zn, mu, sigma))
        if whiten:
            zs = zs @ np.asarray(W_inv) + w_mu
        del model, dstate

        gen_clouds, n_empty = [], 0
        for i in range(N_GEN):
            grid = decode_grid_adaptive(apply_fn, jnp.asarray(zs[i]), 96)
            v, f = extract_mesh(grid)
            if len(f) < 50:
                n_empty += 1
                continue
            gen_clouds.append(sample_mesh_surface(v, f, 2048,
                                                  seed=100 + i))
        row = both_metrics(gen_clouds)
        row.update({"empty": n_empty, "eps_mse": float(dloss),
                    "sampler": sampler, "whiten": whiten,
                    "train_seconds": round(t_train, 1),
                    "config": {**over, **({"denoiser": dn_over}
                                          if dn_over else {})}})
        sweep[name] = row
        sweep_path.write_text(json.dumps(sweep, indent=2))
        print(f"[{name}] 1nna={row['one_nna']} (analytic "
              f"{row['one_nna_analytic']}) cov={row['coverage']} "
              f"mmd={row['mmd_chamfer']:.2e} empty={n_empty} "
              f"loss={dloss:.3f} ({t_train:.0f}s train)", flush=True)

    best = min(sweep, key=lambda k: (abs(sweep[k]["one_nna"] - 0.5),
                                     sweep[k]["empty"]))
    print(f"best arm: {best} -> {sweep[best]}", flush=True)


if __name__ == "__main__":
    main()
