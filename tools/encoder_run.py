"""Amortized-encoder evidence at config-3 scale (6144 chairs, 1x v5e).

Trains the amortized latent encoder (models/encoder.py) against the
saved 6k-chair stage-1 checkpoint and adds two arms to the held-out
battery (runs/scale_chairs6k/heldout_eval.json):

  F_enc_oneshot — one forward pass of the encoder (no optimization);
  G_enc_refine  — encoder prediction as z_init for the standard
                  latent-opt budget (reconstruct_latent(z_init=...)).

The training observation bank (6144 x BANK_P x 4) is generated ON
DEVICE (data/analytic_jax.sample_sdf_points_device — same preprocessor
contract as the held-out arms' observations), so the 1-CPU host never
materializes or uploads it. Run after tools/scale_run.py:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/encoder_run.py
"""

import json
import pathlib
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT = ROOT / "runs" / "scale_chairs6k"
N_TRAIN = 6144
BANK_P = 4096          # stored obs rows per scene (subsets drawn per step)
N_OBS = 2048           # obs points fed to the encoder (train AND eval)
ENC_STEPS = 30_000
HELD_N_OBS = 8000      # held-out arms' observation budget (matches arm A)


def main():
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.tpu_lock import (
        acquire_or_die)
    _tpu_lock = acquire_or_die("tools/encoder_run")  # one chip, one process
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from latent_diffusion_models_for_shape_sdfs_tpu.config import (
        DecoderConfig, EncConfig, ReconstructConfig)
    from latent_diffusion_models_for_shape_sdfs_tpu.data import (
        analytic, analytic_jax)
    from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import (
        SdfDecoder)
    from latent_diffusion_models_for_shape_sdfs_tpu.models.encoder import (
        encode_latent)
    from latent_diffusion_models_for_shape_sdfs_tpu.train.encoder import (
        train_encoder)
    from latent_diffusion_models_for_shape_sdfs_tpu.reconstruct import (
        reconstruct_latent)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.pallas_kernels \
        import make_pallas_apply
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_adaptive)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.isosurface import (
        extract_mesh)
    from latent_diffusion_models_for_shape_sdfs_tpu.evaluation import (
        chamfer_l2, fscore, sample_mesh_surface)
    from latent_diffusion_models_for_shape_sdfs_tpu.evaluation.chamfer \
        import chamfer_l2_directed
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.checkpoint import (
        StageCheckpointer)
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.logging import (
        MetricLogger)

    np.asarray(jnp.ones(8))  # d2h channel warm

    decoder = SdfDecoder(DecoderConfig())
    tmpl = {"params": decoder.init_params(jax.random.PRNGKey(0)),
            "codes": jnp.zeros((N_TRAIN, 256), jnp.float32)}
    ck = StageCheckpointer(OUT, "ad", max_to_keep=1)
    st = ck.restore(tmpl)
    ck.close()
    params, codes = st["params"], st["codes"]
    apply_fn = make_pallas_apply(decoder, params)

    # same split/seed as tools/scale_run.py (seed 11, first 6144 train)
    shapes = analytic.make_synthetic_split("chair", N_TRAIN + 1, seed=11)
    train_shapes = shapes[:N_TRAIN]

    # ---- on-device observation bank [S, BANK_P, 4] (chunked vmap)
    t0 = time.time()
    cparams = analytic_jax.pack_chairs(train_shapes)

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def obs_chunk(pr, key, n):
        keys = jax.random.split(key, pr.num_shapes)
        xyz, d = jax.vmap(lambda p, k:
                          analytic_jax.sample_sdf_points_device(p, k, n))(
            pr, keys)
        return jnp.concatenate([xyz, d[..., None]], axis=-1)

    bank_parts = []
    kb = jax.random.PRNGKey(771)
    for s in range(0, N_TRAIN, 512):
        size = min(512, N_TRAIN - s)
        bank_parts.append(obs_chunk(cparams.slice(s, size),
                                    jax.random.fold_in(kb, s), BANK_P))
    bank = jnp.concatenate(bank_parts, axis=0)
    bank = jax.block_until_ready(bank)
    bank_s = time.time() - t0
    print(f"obs bank {bank.shape} on device in {bank_s:.0f}s", flush=True)

    # ---- train the encoder (fully on-device scan)
    cfg = EncConfig(n_obs=N_OBS, batch_scenes=64, num_steps=ENC_STEPS,
                    lr=3e-4, lr_schedule="cosine", warmup_steps=1000,
                    scan_chunk=500, seed=0, snapshot_every=ENC_STEPS)
    logger = MetricLogger(OUT / "train_enc.jsonl", echo=True)
    eck = StageCheckpointer(OUT, "enc", max_to_keep=1)

    def save(step, stt, mu, sigma):
        eck.save(step, {"state": stt._asdict(), "mu": mu, "sigma": sigma})

    t0 = time.time()
    model, estate, (mu, sigma), loss = train_encoder(
        cfg, codes, bank[..., :3], bank[..., 3], logger=logger,
        checkpoint_fn=save)
    enc_s = time.time() - t0
    eck.close()
    logger.close()
    print(f"encoder trained: final normalized-MSE {loss:.4f} in "
          f"{enc_s:.0f}s", flush=True)

    # ---- held-out arms F (one-shot) / G (encoder-init + refine)
    held = analytic.make_synthetic_split("chair", 8, seed=4242)
    enc_apply = jax.jit(lambda ox, od: encode_latent(
        model, estate.params, ox, od, mu, sigma))
    rcfg = ReconstructConfig(num_steps=1600, clamp_dist=0.1, num_inits=1)

    def eval_z(z, i, shape):
        grid = decode_grid_adaptive(apply_fn, z, 128)
        v, f = extract_mesh(grid)
        if not len(f):
            return {"chamfer": float("inf")}
        pred = sample_mesh_surface(v, f, 30_000, seed=i)
        gt = analytic.sample_surface(shape, 30_000,
                                     np.random.default_rng(2000 + i))
        return {"chamfer": chamfer_l2(pred, gt),
                "pred_to_gt": chamfer_l2_directed(pred, gt),
                "gt_to_pred": chamfer_l2_directed(gt, pred),
                "fscore_tau01": fscore(pred, gt, tau=0.01)["fscore"]}

    rows_f, rows_g, oneshot_ms = [], [], []
    for i, shape in enumerate(held):
        rng = np.random.default_rng(1000 + i)  # same obs as arm A
        ox, od = analytic.sample_sdf_points(shape, HELD_N_OBS, rng,
                                            surface_frac=0.95)
        sub = np.random.default_rng(500 + i).permutation(
            HELD_N_OBS)[:N_OBS]
        oxj = jnp.asarray(ox[sub], jnp.float32)
        odj = jnp.asarray(od[sub], jnp.float32)
        z1 = jax.block_until_ready(enc_apply(oxj, odj))  # warm/compile
        t0 = time.time()
        z1 = jax.block_until_ready(enc_apply(oxj + 0.0, odj))
        oneshot_ms.append((time.time() - t0) * 1e3)
        rows_f.append(eval_z(z1, i, shape))
        zg, info = reconstruct_latent(decoder, params, jnp.asarray(ox),
                                      jnp.asarray(od), rcfg, z_init=z1)
        rg = eval_z(zg, i, shape)
        rg["l1_last"] = info["l1_last"]
        rows_g.append(rg)
        print(f"held-out[{i}]: one-shot {rows_f[-1]['chamfer']:.2e} "
              f"(p2g {rows_f[-1].get('pred_to_gt', float('nan')):.2e}) "
              f"-> refined {rows_g[-1]['chamfer']:.2e} "
              f"(p2g {rows_g[-1].get('pred_to_gt', float('nan')):.2e})",
              flush=True)

    def battery(rows, spec, n_obs):
        ch = [r["chamfer"] for r in rows]
        return {"n_obs": n_obs, "surface_frac": 0.95, "spec": spec,
                "rows": rows, "median": float(np.median(ch)),
                "mean": float(np.mean(ch)),
                "worst_pred_to_gt": float(max(
                    r.get("pred_to_gt", np.inf) for r in rows)),
                "median_gt_to_pred": float(np.median(
                    [r.get("gt_to_pred", np.inf) for r in rows])),
                "median_fscore_tau01": float(np.median(
                    [r.get("fscore_tau01", 0.0) for r in rows]))}

    he_path = OUT / "heldout_eval.json"
    he = json.loads(he_path.read_text()) if he_path.exists() else {}
    he.setdefault("held_out_budgets", {})
    he["held_out_budgets"]["F_enc_oneshot"] = battery(
        rows_f, {"encoder": "oneshot"}, N_OBS)
    he["held_out_budgets"]["G_enc_refine"] = battery(
        rows_g, {"encoder": "refine1600"}, HELD_N_OBS)
    he["encoder_run"] = {
        "bank_shape": list(bank.shape), "bank_seconds": bank_s,
        "train_steps": ENC_STEPS, "train_seconds": enc_s,
        "final_normalized_mse": loss,
        "oneshot_ms_median": float(np.median(oneshot_ms))}
    he_path.write_text(json.dumps(he, indent=2))
    print(f"one-shot encode: {np.median(oneshot_ms):.1f} ms median "
          f"(vs 1600-step latent opt)", flush=True)

    import sys
    sys.path.insert(0, str(ROOT / "tools"))
    from scale_run import write_scale_md
    write_scale_md(json.loads((OUT / "report.json").read_text()))
    print("rewrote SCALE.md")


if __name__ == "__main__":
    main()
