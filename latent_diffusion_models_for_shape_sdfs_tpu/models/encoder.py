"""Amortized latent encoder: (xyz, sdf) observations -> latent code.

The lineage reconstructs unseen shapes ONLY by test-time latent
optimization (~800 Adam steps per shape; reference lineage
`reconstruct.py`, SURVEY.md s3.5). This module adds the amortized
alternative: a permutation-invariant PointNet-style encoder trained to
regress the stage-1 latent table from observation subsets, giving

  * one-shot reconstruction (one forward pass, ~ms instead of seconds),
  * a warm start for latent optimization (`reconstruct_latent(z_init=...)`)
    that cuts the refinement budget and keeps the solution on the learned
    latent manifold (the round-2/3 held-out over-completion failure mode
    is a prior problem - an encoder init IS a learned prior).

Beyond the SURVEY.md s2.2 inventory (a capability extension, like the
serving payload and DPM sampler). TPU notes: the whole network is dense
GEMMs over a [B, N, 4] point tensor - MXU-friendly at any batch; the
max+mean pooling is a cheap VPU reduction. Trained by
`train/encoder.py` in a fully on-device `lax.scan`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from latent_diffusion_models_for_shape_sdfs_tpu.config import EncoderConfig


class LatentEncoder(nn.Module):
    """PointNet-style set encoder: obs (xyz, sdf) -> latent prediction.

    Per-point MLP (widths cfg.point_widths) with LayerNorm, then masked
    max-pool AND mean-pool over the point axis (concatenated - max alone
    loses density information; mean alone washes out thin structures),
    then an MLP head to cfg.latent_size. Output is in NORMALIZED latent
    space (per-dim standardized table; see train/encoder.py) - callers
    un-normalize with the checkpoint's mu/sigma.
    """

    cfg: EncoderConfig = EncoderConfig()

    @nn.compact
    def __call__(self, obs_xyz: jnp.ndarray, obs_sdf: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """obs_xyz [B,N,3], obs_sdf [B,N], mask [B,N] bool -> [B, L]."""
        c = self.cfg
        x = jnp.concatenate([obs_xyz, obs_sdf[..., None]], axis=-1)
        for i, w in enumerate(c.point_widths):
            x = nn.Dense(w, name=f"pt{i}")(x)
            x = nn.LayerNorm(name=f"ln{i}")(x)
            x = nn.silu(x)
        if mask is None:
            mx = jnp.max(x, axis=-2)
            mn = jnp.mean(x, axis=-2)
        else:
            m = mask[..., None]
            mx = jnp.max(jnp.where(m, x, -jnp.inf), axis=-2)
            mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
            cnt = jnp.maximum(jnp.sum(m, axis=-2), 1)
            mn = jnp.sum(jnp.where(m, x, 0.0), axis=-2) / cnt
        h = jnp.concatenate([mx, mn], axis=-1)
        for i, w in enumerate(c.head_widths):
            h = nn.Dense(w, name=f"hd{i}")(h)
            h = nn.silu(h)
        # zero-init the output layer: the initial prediction is the
        # normalized-table mean (z_n = 0), the best constant guess.
        return nn.Dense(c.latent_size, name="out",
                        kernel_init=nn.initializers.zeros)(h)

    def init_params(self, key: jax.Array, n_points: int = 16) -> dict:
        ox = jnp.zeros((1, n_points, 3), jnp.float32)
        od = jnp.zeros((1, n_points), jnp.float32)
        return self.init({"params": key}, ox, od)["params"]


def encode_latent(encoder: LatentEncoder, params: dict,
                  obs_xyz: jnp.ndarray, obs_sdf: jnp.ndarray,
                  mu: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """One-shot latent prediction in TABLE space for one observation set.

    obs_xyz [N,3], obs_sdf [N] -> z [L]. The encoder predicts the
    normalized code; mu/sigma (stored in the encoder checkpoint) map it
    back to the stage-1 latent table's coordinates.
    """
    z_n = encoder.apply({"params": params}, obs_xyz[None], obs_sdf[None])[0]
    return z_n * jnp.asarray(sigma, jnp.float32) + jnp.asarray(
        mu, jnp.float32)
