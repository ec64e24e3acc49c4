"""Fully on-device DDPM / DDIM ancestral sampling via `jax.lax.scan`.

The entire reverse process is one compiled program (BASELINE.json:5 "fused
DDIM-50 latent sampling"): schedule constants are gathered per step inside
the scan, the denoiser is invoked once per step, and no host round-trips
occur. Samplers take a `denoise_fn(z_t, t[B]) -> eps_hat` closure so
conditioning / classifier-free guidance are the caller's composition
(train/diffusion.py builds them).

Batch sharding: under data parallelism the z-batch axis is sharded over the
mesh and the scan body is elementwise per latent, so no collectives appear
inside the loop (SURVEY.md section 2.3 "sharded sampling").
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.schedule import (
    DiffusionSchedule,
)

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def ddpm_sample(denoise_fn: DenoiseFn, schedule: DiffusionSchedule,
                key: jax.Array, num: int, latent_size: int) -> jnp.ndarray:
    """Ancestral DDPM: z_T ~ N(0,I), T reverse steps. Returns z_0 [num, L]."""
    T = schedule.timesteps
    key, k0 = jax.random.split(key)
    z_T = jax.random.normal(k0, (num, latent_size), jnp.float32)

    def body(z, inp):
        t, k = inp
        tb = jnp.full((num,), t, jnp.int32)
        eps_hat = denoise_fn(z, tb)
        beta = schedule.betas[t]
        alpha = schedule.alphas[t]
        somab = schedule.sqrt_one_minus_alpha_bars[t]
        mean = (z - beta / somab * eps_hat) / jnp.sqrt(alpha)
        sigma = jnp.sqrt(schedule.posterior_var[t])
        noise = jax.random.normal(k, z.shape, jnp.float32)
        z_next = mean + jnp.where(t > 0, sigma, 0.0) * noise
        return z_next, ()

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    keys = jax.random.split(key, T)
    z0, _ = jax.lax.scan(body, z_T, (ts, keys))
    return z0


def ddim_timesteps(T: int, steps: int) -> jnp.ndarray:
    """Strided subsequence t_i = (i*T)//steps, i = 0..steps-1 (ascending)."""
    return (jnp.arange(steps, dtype=jnp.int32) * T) // steps


def ddim_sample(denoise_fn: DenoiseFn, schedule: DiffusionSchedule,
                key: jax.Array, num: int, latent_size: int,
                steps: int = 50, eta: float = 0.0) -> jnp.ndarray:
    """DDIM over a strided `steps`-subsequence; eta=0 is deterministic given
    z_T (SEMANTICS.md section 6). Returns z_0 [num, L]."""
    T = schedule.timesteps
    key, k0 = jax.random.split(key)
    z_T = jax.random.normal(k0, (num, latent_size), jnp.float32)
    ts = ddim_timesteps(T, steps)                     # ascending
    abar = schedule.alpha_bars[ts]                    # [S]
    abar_prev = jnp.concatenate([jnp.ones((1,), jnp.float32), abar[:-1]])

    def body(z, inp):
        i, k = inp
        t = ts[i]
        a_t = abar[i]
        a_prev = abar_prev[i]
        tb = jnp.full((num,), t, jnp.int32)
        eps_hat = denoise_fn(z, tb)
        z0_hat = (z - jnp.sqrt(1.0 - a_t) * eps_hat) / jnp.sqrt(a_t)
        sigma = eta * jnp.sqrt((1.0 - a_prev) / (1.0 - a_t)) * jnp.sqrt(
            1.0 - a_t / a_prev)
        dir_coeff = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma ** 2, 0.0))
        noise = jax.random.normal(k, z.shape, jnp.float32)
        z_next = (jnp.sqrt(a_prev) * z0_hat + dir_coeff * eps_hat
                  + sigma * noise)
        return z_next, ()

    idx = jnp.arange(steps - 1, -1, -1, dtype=jnp.int32)
    keys = jax.random.split(key, steps)
    z0, _ = jax.lax.scan(body, z_T, (idx, keys))
    return z0


def guided_denoise_fn(apply_fn: Callable, params, guidance_scale: float,
                      class_id: jnp.ndarray | None = None,
                      **cond_kwargs) -> DenoiseFn:
    """Compose a denoiser apply into a (possibly CFG-guided) DenoiseFn.

    `cond_kwargs` are forwarded verbatim (e.g. obs_xyz/obs_sdf for the
    partial-SDF-conditioned CondDenoiser). guidance_scale == 0: plain
    conditional (or unconditional) call. guidance_scale > 0:
    eps = (1+s)*eps_cond - s*eps_uncond (classifier-free guidance over the
    class embedding).
    """
    cond_kwargs = {k: v for k, v in cond_kwargs.items() if v is not None}

    def fn(z_t, t):
        cond_eps = apply_fn({"params": params}, z_t, t, class_id=class_id,
                            **cond_kwargs)
        if guidance_scale <= 0 or class_id is None:
            return cond_eps
        uncond_eps = apply_fn({"params": params}, z_t, t, class_id=None,
                              **cond_kwargs)
        s = guidance_scale
        return (1.0 + s) * cond_eps - s * uncond_eps

    return fn
