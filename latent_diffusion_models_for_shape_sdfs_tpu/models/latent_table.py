"""Per-shape learnable latent codes (the auto-decoder's 'embedding').

Semantics pinned in SEMANTICS.md section 3: init N(0, (std/sqrt(L))^2);
gather one row per scene; the gradient is the dense scatter-add VJP of the
gather (untouched rows get exact zeros and still flow through Adam's m/v
decay, matching lineage dense `torch.optim.Adam` over `Embedding.weight`);
optional max-norm projection applied at gather time (lineage
`Embedding(max_norm=code_bound)`).

The table is deliberately a plain array, not a flax module: at ~6k x 256
fp32 it is ~6 MB, so under data parallelism it stays **replicated** and the
scattered row-grads are simply psum'd over the mesh (SURVEY.md section 2.3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LatentTable(NamedTuple):
    codes: jnp.ndarray  # float32 [num_scenes, latent_size]


def init_latent_table(key: jax.Array, num_scenes: int, latent_size: int,
                      code_init_std: float = 1.0) -> LatentTable:
    sigma = code_init_std / (latent_size ** 0.5)
    codes = sigma * jax.random.normal(key, (num_scenes, latent_size),
                                      jnp.float32)
    return LatentTable(codes=codes)


def gather_codes(table: LatentTable, scene_ids: jnp.ndarray,
                 code_bound: float = 0.0) -> jnp.ndarray:
    """codes[scene_ids] with optional max-norm projection. [S, L]."""
    z = table.codes[scene_ids]
    if code_bound and code_bound > 0:
        norm = jnp.linalg.norm(z, axis=-1, keepdims=True)
        z = z * jnp.minimum(1.0, code_bound / jnp.maximum(norm, 1e-12))
    return z
