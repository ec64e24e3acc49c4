"""DDPM noise schedule and closed-form q/posterior quantities.

Linear beta schedule (SEMANTICS.md section 6): beta = linspace(1e-4, 0.02, T),
T = 1000 (BASELINE.json:8). All derived arrays are precomputed fp32 device
constants so the training/sampling `lax.scan` bodies are pure gathers + VPU
math — no recomputation inside the loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class DiffusionSchedule(NamedTuple):
    betas: jnp.ndarray                 # [T]
    alphas: jnp.ndarray                # [T]
    alpha_bars: jnp.ndarray            # [T]  prod_{s<=t} alpha_s
    alpha_bars_prev: jnp.ndarray       # [T]  abar_{t-1}, abar_{-1} = 1
    sqrt_alpha_bars: jnp.ndarray       # [T]
    sqrt_one_minus_alpha_bars: jnp.ndarray  # [T]
    posterior_var: jnp.ndarray         # [T]  beta_t (1-abar_{t-1})/(1-abar_t)

    @property
    def timesteps(self) -> int:
        return self.betas.shape[0]

    @classmethod
    def create(cls, timesteps: int = 1000, beta_start: float = 1e-4,
               beta_end: float = 0.02) -> "DiffusionSchedule":
        betas = jnp.linspace(beta_start, beta_end, timesteps,
                             dtype=jnp.float32)
        alphas = 1.0 - betas
        abar = jnp.cumprod(alphas)
        abar_prev = jnp.concatenate([jnp.ones((1,), jnp.float32), abar[:-1]])
        post_var = betas * (1.0 - abar_prev) / (1.0 - abar)
        return cls(
            betas=betas,
            alphas=alphas,
            alpha_bars=abar,
            alpha_bars_prev=abar_prev,
            sqrt_alpha_bars=jnp.sqrt(abar),
            sqrt_one_minus_alpha_bars=jnp.sqrt(1.0 - abar),
            posterior_var=post_var,
        )

    def q_sample(self, z0: jnp.ndarray, t: jnp.ndarray,
                 eps: jnp.ndarray) -> jnp.ndarray:
        """z_t = sqrt(abar_t) z0 + sqrt(1-abar_t) eps; t broadcasts [B]."""
        a = self.sqrt_alpha_bars[t][..., None]
        b = self.sqrt_one_minus_alpha_bars[t][..., None]
        return a * z0 + b * eps

    def predict_z0(self, z_t: jnp.ndarray, t: jnp.ndarray,
                   eps_hat: jnp.ndarray) -> jnp.ndarray:
        a = self.sqrt_alpha_bars[t][..., None]
        b = self.sqrt_one_minus_alpha_bars[t][..., None]
        return (z_t - b * eps_hat) / a
