"""Device-resident SDF sample bank: zero per-step host->device traffic.

The lineage streams balanced per-scene subsamples from host memory every
step. On TPU the per-step h2d feed (~17 MB for the canonical 64x16384
batch) can dominate the 93 ms fused train step wherever PCIe is slow, so
this bank uploads the ENTIRE per-scene sample store once (padded
[S, Pmax, 4], bf16 xyz+f32-safe sdf in one f32 array or bf16 with a
separate f32 sdf) and performs the *balanced pos/neg draw on device*
inside the jitted train step — same sampling distribution (uniform with
replacement, half pos / half neg per scene) as `SdfDataset.sample_scene`,
different PRNG stream.

HBM math: 6k scenes x 100k samples x 16 B = 9.6 GB fp32 (4.8 GB bf16) —
the canonical chairs config fits on one v5e; shard over the data mesh for
larger stores.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from latent_diffusion_models_for_shape_sdfs_tpu.data.sdf_dataset import (
    SdfDataset)


class DeviceSampleBank(NamedTuple):
    pos: jnp.ndarray         # [S, Pmax_pos, 4] (xyz, sdf)
    neg: jnp.ndarray         # [S, Pmax_neg, 4]
    pos_count: jnp.ndarray   # int32 [S]
    neg_count: jnp.ndarray   # int32 [S]

    @classmethod
    def from_dataset(cls, ds: SdfDataset,
                     dtype=jnp.float32) -> "DeviceSampleBank":
        S = len(ds)
        # degenerate scenes fall back to the other side's rows (mirrors
        # SdfDataset.sample_scene's top-up) — apply the fallback BEFORE
        # sizing the buffers, or a scene with zero negatives makes its
        # fallback rows overflow an nmax computed from the raw lists
        eff = []
        for i in range(S):
            p, n = ds.pos[i], ds.neg[i]
            if len(p) == 0:
                p = n
            if len(n) == 0:
                n = p
            eff.append((p, n))
        pmax = max(max(len(p) for p, _ in eff), 1)
        nmax = max(max(len(n) for _, n in eff), 1)
        pos = np.zeros((S, pmax, 4), np.float32)
        neg = np.zeros((S, nmax, 4), np.float32)
        pc = np.zeros((S,), np.int32)
        nc = np.zeros((S,), np.int32)
        for i, (p, n) in enumerate(eff):
            pos[i, :len(p)] = p
            neg[i, :len(n)] = n
            pc[i] = len(p)
            nc[i] = len(n)
        return cls(pos=jnp.asarray(pos, dtype), neg=jnp.asarray(neg, dtype),
                   pos_count=jnp.asarray(pc), neg_count=jnp.asarray(nc))

    def sample_batch(self, key: jax.Array, scene_ids: jnp.ndarray,
                     samples_per_scene: int) -> tuple:
        """Balanced on-device draw. Returns (xyz [B,P,3] f32, sdf [B,P])."""
        B = scene_ids.shape[0]
        half = samples_per_scene // 2
        rest = samples_per_scene - half
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (B, half))
        u2 = jax.random.uniform(k2, (B, rest))
        i1 = (u1 * self.pos_count[scene_ids][:, None]).astype(jnp.int32)
        i2 = (u2 * self.neg_count[scene_ids][:, None]).astype(jnp.int32)
        rows1 = self.pos[scene_ids[:, None], i1]      # [B, half, 4]
        rows2 = self.neg[scene_ids[:, None], i2]      # [B, rest, 4]
        rows = jnp.concatenate([rows1, rows2], axis=1)
        return (rows[..., :3].astype(jnp.float32),
                rows[..., 3].astype(jnp.float32))
