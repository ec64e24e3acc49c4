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
                steps: int = 50, eta: float = 0.0,
                z_init: jnp.ndarray | None = None) -> jnp.ndarray:
    """DDIM over a strided `steps`-subsequence; eta=0 is deterministic given
    z_T (SEMANTICS.md section 6). Returns z_0 [num, L].

    `z_init` [num, L]: caller-provided z_T (standard normal) instead of
    drawing from `key` — the AOT sampler artifact's entry, where the
    noise must be an explicit input. The key split is unchanged so the
    eta>0 noise stream is identical either way."""
    T = schedule.timesteps
    key, k0 = jax.random.split(key)
    z_T = (jax.random.normal(k0, (num, latent_size), jnp.float32)
           if z_init is None else z_init)
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


def dpm_solver_sample(denoise_fn: DenoiseFn, schedule: DiffusionSchedule,
                      key: jax.Array, num: int, latent_size: int,
                      steps: int = 10,
                      z_init: jnp.ndarray | None = None) -> jnp.ndarray:
    """DPM-Solver++(2M): second-order multistep ODE solver in the
    data-prediction parameterization (Lu et al. 2022, the standard
    few-step sampler of the diffusers ecosystem). Integrates the SAME
    probability-flow ODE as eta=0 DDIM, but the 2nd-order multistep
    correction gives DDIM-50-quality samples in ~10 denoiser calls —
    the denoiser call count IS the sampling cost, so this is a direct
    ~5x sampling-throughput lever at matched fidelity.

    One `lax.scan`, fully on-device like ddim_sample; deterministic
    given the key (only z_T is random). Uses the same strided timestep
    subsequence as DDIM (ddim_timesteps) and, like DDIM's abar_prev[0]=1
    endpoint, finishes with a first-order step onto the clean manifold
    (the standard lower-order-final rule — the 2M correction diverges
    as lambda -> inf). Returns z_0 [num, L].

    Regime note (measured on the exact-Gaussian-denoiser oracle,
    tests/test_dpm_solver.py): vs a DDIM-400 reference trajectory the
    mean endpoint error is 5.7x below DDIM at 10 steps and 2x at 5 —
    the few-step regime this exists for. At >= 20 steps the uniform-t
    stride's exploding final lambda-intervals make the 2M extrapolation
    noisy and plain DDIM is already accurate; use DDIM there.
    """
    T = schedule.timesteps
    key, k0 = jax.random.split(key)
    z_T = (jax.random.normal(k0, (num, latent_size), jnp.float32)
           if z_init is None else z_init)

    ts_desc = ddim_timesteps(T, steps)[::-1]          # [S] descending
    abar = schedule.alpha_bars[ts_desc]               # state at step j
    a_from = jnp.sqrt(abar)
    s_from = jnp.sqrt(1.0 - abar)
    a_to = jnp.concatenate([a_from[1:], jnp.ones((1,), jnp.float32)])
    s_to = jnp.concatenate([s_from[1:], jnp.zeros((1,), jnp.float32)])
    lam = jnp.log(a_from / s_from)                    # half-logSNR
    # e^{-h_j} without forming the infinite final h: (a_from s_to) /
    # (a_to s_from) -> exactly 0 at the sigma_to = 0 endpoint
    exp_neg_h = (a_from * s_to) / (a_to * s_from)
    h = jnp.concatenate([lam[1:], lam[-1:] ]) - lam   # h[-1] unused
    # 2M correction weight c_j = h_j / (2 h_{j-1}); 0 for the first
    # step (no history) and the last (lower-order-final)
    c = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                         h[1:] / (2.0 * h[:-1])])
    c = c.at[-1].set(0.0)
    sigma_ratio = jnp.where(s_from > 0, s_to / s_from, 0.0)

    def body(carry, j):
        z, x0_prev = carry
        tb = jnp.full((num,), ts_desc[j], jnp.int32)
        eps_hat = denoise_fn(z, tb)
        x0 = (z - s_from[j] * eps_hat) / a_from[j]
        d = (1.0 + c[j]) * x0 - c[j] * x0_prev
        z_next = (sigma_ratio[j] * z
                  - a_to[j] * (exp_neg_h[j] - 1.0) * d)
        return (z_next, x0), ()

    (z0, _), _ = jax.lax.scan(body, (z_T, jnp.zeros_like(z_T)),
                              jnp.arange(steps))
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
