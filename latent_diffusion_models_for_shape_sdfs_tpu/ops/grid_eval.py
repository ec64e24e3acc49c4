"""Dense SDF grid decoding: chunked / tiled / hierarchical (SURVEY.md s5.7).

The query grid (128^3 - 512^3, up to 134M points) is this workload's long
axis; it scales by *chunking*, not sequence parallelism — every query is
independent. Three paths:

  * ``decode_grid``       — fully on-device `lax.map` over fixed-size chunks;
    chunk coordinates are synthesized from flat indices inside the compiled
    program (no host-side point upload, no res^3 x 3 coordinate array in HBM).
  * ``decode_grid_batch`` — the same, vmapped over a batch of latents
    (BASELINE.json:10 "batched 256^3 grid decode for 64 shapes/step" streams
    shape-chunks through this).
  * ``decode_grid_hierarchical`` — coarse block-center pass, then fine
    evaluation only of blocks that can contain the surface (1-Lipschitz SDF
    bound). This is how the >=1e9 effective voxels/sec target is reachable on
    a chip whose dense MXU roofline is ~4.5e7 true evals/sec (SURVEY.md s6).

Grid convention: res points per axis spanning [-1,1], spacing 2/(res-1),
flat index = (x*res + y)*res + z, matching ops/isosurface.py.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ApplyFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]  # (z, xyz)->sdf


def make_grid_points(res: int, lo: float = -1.0, hi: float = 1.0) -> np.ndarray:
    """Host-side [res^3, 3] lattice (tests / tiny grids only)."""
    axis = np.linspace(lo, hi, res, dtype=np.float32)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    return np.stack([x, y, z], axis=-1).reshape(-1, 3)


def _flat_to_xyz(flat: jnp.ndarray, res: int) -> jnp.ndarray:
    """Flat indices -> [-1,1]^3 coordinates, on device."""
    zc = flat % res
    yc = (flat // res) % res
    xc = flat // (res * res)
    ijk = jnp.stack([xc, yc, zc], axis=-1).astype(jnp.float32)
    return ijk * (2.0 / (res - 1)) - 1.0


@partial(jax.jit, static_argnums=(0, 2, 3))
def _decode_grid_impl(apply_fn: ApplyFn, z: jnp.ndarray, res: int,
                      chunk: int) -> jnp.ndarray:
    total = res ** 3
    nchunks = math.ceil(total / chunk)

    def eval_chunk(c):
        flat = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
        xyz = _flat_to_xyz(jnp.minimum(flat, total - 1), res)
        zz = jnp.broadcast_to(z, (chunk,) + z.shape)
        return apply_fn(zz, xyz)

    out = jax.lax.map(eval_chunk, jnp.arange(nchunks, dtype=jnp.int32))
    return out.reshape(-1)[:total].reshape(res, res, res)


def decode_grid(apply_fn: ApplyFn, z: jnp.ndarray, res: int,
                chunk: int = 262_144) -> jnp.ndarray:
    """Dense [res,res,res] SDF of one latent; fully on device."""
    chunk = min(chunk, res ** 3)
    return _decode_grid_impl(apply_fn, z, res, chunk)


@partial(jax.jit, static_argnums=(0, 2, 3))
def _decode_grid_batch_impl(apply_fn: ApplyFn, zs: jnp.ndarray, res: int,
                            chunk: int) -> jnp.ndarray:
    total = res ** 3
    nchunks = math.ceil(total / chunk)
    S = zs.shape[0]

    def eval_chunk(c):
        flat = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
        xyz = _flat_to_xyz(jnp.minimum(flat, total - 1), res)

        def one(zi):
            zz = jnp.broadcast_to(zi, (chunk,) + zi.shape)
            return apply_fn(zz, xyz)

        return jax.vmap(one)(zs)  # [S, chunk]

    out = jax.lax.map(eval_chunk, jnp.arange(nchunks, dtype=jnp.int32))
    out = jnp.moveaxis(out, 1, 0).reshape(S, -1)[:, :total]
    return out.reshape(S, res, res, res)


def decode_grid_batch(apply_fn: ApplyFn, zs: jnp.ndarray, res: int,
                      chunk: int = 65_536) -> jnp.ndarray:
    """Dense grids for a batch of latents [S, L] -> [S, res, res, res]."""
    chunk = min(chunk, res ** 3)
    return _decode_grid_batch_impl(apply_fn, zs, res, chunk)


# ------------------------------------------------------ hierarchical decode


@partial(jax.jit, static_argnums=(0, 2, 3))
def _eval_block_centers(apply_fn: ApplyFn, z: jnp.ndarray, res: int,
                        block: int) -> jnp.ndarray:
    """SDF at the center of every block of `block`^3 fine voxels. [nb^3]."""
    nb = res // block
    flat = jnp.arange(nb ** 3, dtype=jnp.int32)
    zc = flat % nb
    yc = (flat // nb) % nb
    xc = flat // (nb * nb)
    ijk = jnp.stack([xc, yc, zc], axis=-1).astype(jnp.float32)
    # center of the block in fine-index space -> world coords
    center_idx = ijk * block + (block - 1) / 2.0
    xyz = center_idx * (2.0 / (res - 1)) - 1.0
    zz = jnp.broadcast_to(z, (nb ** 3,) + z.shape)
    return apply_fn(zz, xyz)


@partial(jax.jit, static_argnums=(0, 3, 4))
def _eval_blocks(apply_fn: ApplyFn, z: jnp.ndarray, block_flat: jnp.ndarray,
                 res: int, block: int) -> jnp.ndarray:
    """Evaluate K blocks of block^3 fine voxels. block_flat [K] -> [K, b^3]."""
    nb = res // block
    K = block_flat.shape[0]
    zc = block_flat % nb
    yc = (block_flat // nb) % nb
    xc = block_flat // (nb * nb)
    base = jnp.stack([xc, yc, zc], axis=-1)[:, None, :] * block  # [K,1,3]
    off = jnp.arange(block ** 3, dtype=jnp.int32)
    off3 = jnp.stack([off // (block * block), (off // block) % block,
                      off % block], axis=-1)[None, :, :]         # [1,b^3,3]
    idx = (base + off3).astype(jnp.float32)
    xyz = (idx * (2.0 / (res - 1)) - 1.0).reshape(K * block ** 3, 3)
    zz = jnp.broadcast_to(z, (K * block ** 3,) + z.shape)
    return apply_fn(zz, xyz).reshape(K, block ** 3)


def decode_grid_hierarchical(apply_fn: ApplyFn, z: jnp.ndarray, res: int,
                             block: int = 8, safety: float = 1.5,
                             max_blocks_per_call: int = 4096,
                             ) -> Tuple[np.ndarray, dict]:
    """Coarse->fine sparse decode. Returns (grid[res^3] host f32, stats).

    A block can contain the zero set only if the SDF at its center is within
    half the block diagonal (1-Lipschitz bound) times `safety` (margin for
    learned-SDF Lipschitz slack). Skipped blocks are filled with their
    center value — far from the iso level by construction, so isosurfacing
    is unaffected.
    """
    assert res % block == 0, "res must be divisible by block"
    nb = res // block
    h = 2.0 / (res - 1)
    tau = safety * (block * h * math.sqrt(3.0) / 2.0)

    centers = np.asarray(_eval_block_centers(apply_fn, z, res, block))
    active = np.nonzero(np.abs(centers) <= tau)[0].astype(np.int32)
    grid = np.repeat(centers.astype(np.float32), block ** 3).reshape(
        nb, nb, nb, block, block, block)

    total_fine_evals = 0
    K = len(active)
    for start in range(0, K, max_blocks_per_call):
        ids = active[start:start + max_blocks_per_call]
        pad = (-len(ids)) % max_blocks_per_call if K > max_blocks_per_call \
            else 0
        ids_p = np.pad(ids, (0, pad), mode="edge") if pad else ids
        vals = np.asarray(_eval_blocks(apply_fn, z, jnp.asarray(ids_p), res,
                                       block))[:len(ids)]
        total_fine_evals += vals.size
        bx, by, bz = (ids // (nb * nb), (ids // nb) % nb, ids % nb)
        grid[bx, by, bz] = vals.reshape(-1, block, block, block)

    grid = grid.transpose(0, 3, 1, 4, 2, 5).reshape(res, res, res)
    stats = {
        "coarse_evals": centers.size,
        "fine_evals": total_fine_evals,
        "active_blocks": int(K),
        "total_blocks": int(nb ** 3),
        "effective_voxels": res ** 3,
    }
    return grid, stats
