"""Test-time latent inference (lineage `reconstruct.py` semantics).

Given a frozen decoder and observed (xyz, sdf) samples of an unseen or
partial shape, MAP-optimize a latent code:

    min_z  clamped_l1(decoder(z, xyz), sdf) + (1/sigma^2) ||z||^2 / N

~800 Adam steps, lr 5e-3 dropped 10x at step 400 (lineage default
adjust_learning_rate schedule). The whole optimization is ONE compiled
`lax.scan` on device — observations upload once, the loop never touches
the host (SURVEY.md s3.5).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from latent_diffusion_models_for_shape_sdfs_tpu.config import ReconstructConfig
from latent_diffusion_models_for_shape_sdfs_tpu import losses
from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import SdfDecoder


def reconstruct_latent(decoder: SdfDecoder, params: dict,
                       obs_xyz: jnp.ndarray, obs_sdf: jnp.ndarray,
                       cfg: ReconstructConfig = ReconstructConfig(),
                       key: Optional[jax.Array] = None,
                       z_init: Optional[jnp.ndarray] = None,
                       sds_prior: Optional[dict] = None) -> tuple:
    """Optimize one latent against observations. Returns (z [L], info).

    cfg.num_inits > 1 runs that many random restarts concurrently (Adam on
    [k, L] is k independent Adams — one compiled program, canonical
    lineage practice of re-running with several seeds) and returns the
    restart with the lowest final data term.

    `z_init` [L] warm-starts the optimization (e.g. an amortized-encoder
    prediction, models/encoder.py): restart 0 begins exactly at z_init,
    restarts 1..k-1 at z_init + the usual init_std jitter. Default None
    keeps the lineage cold start (N(0, init_std^2)).

    `sds_prior` optionally adds a score-distillation gradient from a
    trained stage-2 denoiser (see `reconstruct_latent_diffusion_prior`,
    the public entry point that builds this dict): keys `denoise_fn`,
    `sched`, `mu`, `sigma`, `weight`, `t_lo`, `t_hi`, `anneal`. With
    weight == 0 (or None) the compiled program is byte-identical to the
    plain MAP path — the branch is resolved at trace time.
    """
    key = jax.random.PRNGKey(cfg.seed) if key is None else key
    # the SDS noise stream is folded off `key` so the z0 init stream is
    # identical to the plain path's given the same key (the
    # sds_weight==0 parity test in tests/test_reconstruct_prior.py pins
    # this).
    sds_key = jax.random.fold_in(key, 0x5D5)
    sp = (sds_prior if sds_prior is not None
          and sds_prior.get("weight", 0.0) > 0.0 else None)
    L = decoder.cfg.latent_size
    k = max(1, cfg.num_inits)
    z0 = cfg.init_std * jax.random.normal(key, (k, L), jnp.float32)
    if z_init is not None:
        base = jnp.asarray(z_init, jnp.float32)
        z0 = base[None, :] + z0.at[0].set(0.0)
    tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    n = obs_xyz.shape[0]
    prior_w = 1.0 / (cfg.code_reg_sigma ** 2)
    if sp is not None:
        sds_w = float(sp["weight"])
        sched = sp["sched"]
        denoise_fn = sp["denoise_fn"]
        T = sched.timesteps
        s_mu = jnp.asarray(sp["mu"], jnp.float32)
        s_sigma = jnp.asarray(sp["sigma"], jnp.float32)
        t_lo, t_hi = float(sp["t_lo"]), float(sp["t_hi"])
        anneal = bool(sp["anneal"])

    def loss_fn(z, xyz, sdf):
        zz = jnp.broadcast_to(z, (n, L))
        pred = decoder.apply({"params": params}, zz, xyz, train=False)
        l1 = losses.clamped_l1(pred, sdf, cfg.clamp_dist, n)
        reg = prior_w * jnp.sum(z * z) / n
        return l1 + reg, l1

    @partial(jax.jit, donate_argnums=())
    def run(z0, xyz, sdf):
        def body(carry, step):
            z, opt = carry                                  # z [k, L]
            (loss, l1), g = jax.vmap(
                jax.value_and_grad(loss_fn, has_aux=True),
                in_axes=(0, None, None))(z, xyz, sdf)
            if sp is not None:
                # score distillation (DreamFusion eq. 8 in latent space):
                # diffuse the normalized code, ask the trained denoiser
                # for eps_hat, and pull z toward the learned latent
                # distribution where the data term is silent. The
                # 1/sigma factor is the chain rule through code
                # normalization; the denoiser Jacobian is skipped (SDS).
                ks = jax.random.fold_in(sds_key, step)
                if anneal:
                    # DreamTime schedule: coarse layout first, detail last
                    frac = step.astype(jnp.float32) / max(cfg.num_steps - 1,
                                                          1)
                    tf = t_hi + (t_lo - t_hi) * frac
                else:
                    tf = jax.random.uniform(jax.random.fold_in(ks, 1),
                                            minval=t_lo, maxval=t_hi)
                t = jnp.clip((tf * T).astype(jnp.int32), 0, T - 1)
                t = jnp.full((k,), t, jnp.int32)
                eps = jax.random.normal(jax.random.fold_in(ks, 2),
                                        (k, L), jnp.float32)
                z_n = (z - s_mu) / s_sigma
                z_t = sched.q_sample(z_n, t, eps)
                eps_hat = denoise_fn(z_t, t)
                g = g + sds_w * (eps_hat - eps) / s_sigma
            lr = jnp.where(step < cfg.lr_decay_at, cfg.lr, cfg.lr * 0.1)
            upd, opt = tx.update(g, opt)
            z = z - lr * upd
            return (z, opt), (loss, l1)

        (z, _), (hist, l1_hist) = jax.lax.scan(
            body, (z0, tx.init(z0)), jnp.arange(cfg.num_steps))
        best = jnp.argmin(l1_hist[-1])
        return z[best], hist[:, best], l1_hist[:, best]

    z, hist, l1_hist = run(z0, jnp.asarray(obs_xyz, jnp.float32),
                           jnp.asarray(obs_sdf, jnp.float32))
    info = {"loss_first": float(hist[0]), "loss_last": float(hist[-1]),
            "l1_last": float(l1_hist[-1]), "steps": cfg.num_steps,
            "num_inits": k}
    return z, info


def reconstruct_latent_diffusion_prior(
        decoder: SdfDecoder, params: dict,
        obs_xyz: jnp.ndarray, obs_sdf: jnp.ndarray,
        denoise_fn, sched, mu: jnp.ndarray, sigma: jnp.ndarray,
        cfg: ReconstructConfig = ReconstructConfig(),
        key: Optional[jax.Array] = None,
        sds_weight: float = 1e-3, t_lo: float = 0.02, t_hi: float = 0.98,
        anneal: bool = True,
        z_init: Optional[jnp.ndarray] = None) -> tuple:
    """Latent optimization with the trained stage-2 denoiser as the prior.

    The plain MAP form regularizes z with an isotropic Gaussian — which
    knows nothing about the learned shape distribution, so under-observed
    regions drift to whatever the auto-decoder prior likes to grow there
    (the round-2 held-out over-completion failure mode). Here the prior
    gradient is score distillation: per step draw a timestep t and noise
    eps, diffuse the normalized current code, and add

        g_prior = sds_weight * (eps_hat(z_t, t) - eps) / sigma_code

    to the data gradient. `denoise_fn(z_t [k,L], t [k] int32) -> eps_hat`
    is a trained-denoiser closure (e.g. `diffusion.sampler.
    guided_denoise_fn` over the EMA params); `sched` a
    `DiffusionSchedule`; `mu`/`sigma` the stage-2 code normalization
    moments. `anneal=True` sweeps t linearly t_hi -> t_lo over the
    optimization; False draws t ~ U[t_lo, t_hi] i.i.d.

    Thin wrapper over `reconstruct_latent(sds_prior=...)` — one optimizer
    loop, not two to keep in sync. With sds_weight == 0 this is exactly
    `reconstruct_latent` (same loss, init, optimizer, and restart
    selection) — asserted in tests/test_reconstruct_prior.py. Returns
    (z [L], info).
    """
    z, info = reconstruct_latent(
        decoder, params, obs_xyz, obs_sdf, cfg=cfg, key=key, z_init=z_init,
        sds_prior={"denoise_fn": denoise_fn, "sched": sched, "mu": mu,
                   "sigma": sigma, "weight": sds_weight, "t_lo": t_lo,
                   "t_hi": t_hi, "anneal": anneal})
    return z, {**info, "sds_weight": sds_weight}


def reconstruct_latent_batch(decoder: SdfDecoder, params: dict,
                             obs_xyz: jnp.ndarray, obs_sdf: jnp.ndarray,
                             cfg: ReconstructConfig = ReconstructConfig(),
                             key: Optional[jax.Array] = None) -> jnp.ndarray:
    """vmapped reconstruction for a batch of shapes.
    obs_xyz [B,N,3], obs_sdf [B,N] -> z [B,L]."""
    key = jax.random.PRNGKey(cfg.seed) if key is None else key
    B, n, _ = obs_xyz.shape
    L = decoder.cfg.latent_size
    z0 = cfg.init_std * jax.random.normal(key, (B, L), jnp.float32)
    tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    prior_w = 1.0 / (cfg.code_reg_sigma ** 2)

    def loss_fn(z, xyz, sdf):
        zz = jnp.broadcast_to(z, (n, L))
        pred = decoder.apply({"params": params}, zz, xyz, train=False)
        return (losses.clamped_l1(pred, sdf, cfg.clamp_dist, n)
                + prior_w * jnp.sum(z * z) / n)

    @jax.jit
    def run(z0, xyz, sdf):
        def body(carry, step):
            z, opt = carry
            g = jax.vmap(jax.grad(loss_fn))(z, xyz, sdf)
            lr = jnp.where(step < cfg.lr_decay_at, cfg.lr, cfg.lr * 0.1)
            upd, opt = tx.update(g, opt)
            return (z - lr * upd, opt), ()

        (z, _), _ = jax.lax.scan(body, (z0, tx.init(z0)),
                                 jnp.arange(cfg.num_steps))
        return z

    return run(z0, jnp.asarray(obs_xyz, jnp.float32),
               jnp.asarray(obs_sdf, jnp.float32))
