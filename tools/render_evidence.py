"""Qualitative preview renders from the saved 6k-chair checkpoints.

Sphere-traces (ops/render.py — no grid decode, no meshing) three
trained codes and three fresh DDIM-50 samples straight off the decoder
and writes PNGs next to the scale-run evidence, so SCALE.md's numbers
have pictures: runs/scale_chairs6k/preview_{train,sample}_*.png.

Run (after tools/scale_run.py has saved the checkpoints):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/render_evidence.py
"""

import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT = ROOT / "runs" / "scale_chairs6k"
N_TRAIN = 6144


def main():
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.tpu_lock import (
        acquire_or_die)
    _tpu_lock = acquire_or_die("tools/render_evidence")  # one chip, one process
    from latent_diffusion_models_for_shape_sdfs_tpu.utils. \
        compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from latent_diffusion_models_for_shape_sdfs_tpu.config import (
        DecoderConfig, DenoiserConfig, DiffConfig)
    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion import (
        DiffusionSchedule)
    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.sampler \
        import ddim_sample
    from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import (
        SdfDecoder)
    from latent_diffusion_models_for_shape_sdfs_tpu.models.denoiser import (
        CondDenoiser)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.fused_decoder \
        import make_fast_apply
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.render import (
        render_sdf)
    from latent_diffusion_models_for_shape_sdfs_tpu.train.diffusion import (
        init_diff_state, unnormalize_codes)
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.checkpoint \
        import StageCheckpointer
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.image import (
        write_png)
    sys.path.insert(0, str(ROOT / "tools"))
    import scale_run as _sr

    np.asarray(jnp.ones(8))  # channel warm

    decoder = SdfDecoder(DecoderConfig())
    tmpl = {"params": decoder.init_params(jax.random.PRNGKey(0)),
            "codes": jnp.zeros((N_TRAIN, 256), jnp.float32)}
    ck = StageCheckpointer(OUT, "ad", max_to_keep=1)
    state = ck.restore(tmpl)
    ck.close()
    apply_fn = make_fast_apply(decoder, state["params"])

    t0 = time.time()
    for i, scene in enumerate((0, 7, 21)):
        rgb, hit = render_sdf(apply_fn, state["codes"][scene],
                              width=448, height=448,
                              eye=(1.5, 1.05, 1.5))
        write_png(OUT / f"preview_train_{i}.png", rgb)
        print(f"train scene {scene}: {int(hit.sum())} hit px "
              f"({time.time()-t0:.1f}s)", flush=True)

    dcfg = DiffConfig(denoiser=DenoiserConfig(**_sr.DIFF_DENOISER),
                      timesteps=1000)
    dmodel = CondDenoiser(dcfg.denoiser)
    tmpl_state = init_diff_state(dcfg, dmodel, jax.random.PRNGKey(0))
    dck = StageCheckpointer(OUT, "diff", max_to_keep=1)
    drest = dck.restore({"params": tmpl_state.params,
                         "ema": tmpl_state.ema_params,
                         "mu": jnp.zeros(256), "sigma": jnp.zeros(256)})
    dck.close()
    ema = drest["ema"]
    fn = lambda z, t: dmodel.apply({"params": ema}, z, t)
    sch = DiffusionSchedule.create(dcfg.timesteps)
    zg = unnormalize_codes(
        ddim_sample(fn, sch, jax.random.PRNGKey(31), 3, 256, steps=50),
        drest["mu"], drest["sigma"])
    for i in range(3):
        rgb, hit = render_sdf(apply_fn, zg[i], width=448, height=448,
                              eye=(1.5, 1.05, 1.5))
        write_png(OUT / f"preview_sample_{i}.png", rgb)
        print(f"ddim sample {i}: {int(hit.sum())} hit px", flush=True)
    print(f"previews written under {OUT} in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
