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

ApplyFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
"""(z [L], xyz [N,3]) -> sdf [N] — a *single* latent against a point set,
so implementations can hoist per-shape latent projections
(ops.fused_decoder). Use `flax_apply_fn` to adapt a flax decoder."""


def flax_apply_fn(decoder, params, train: bool = False) -> ApplyFn:
    """Adapt a flax SdfDecoder to the (z, xyz) grid-eval contract."""

    def apply_fn(z, xyz):
        zz = jnp.broadcast_to(z, xyz.shape[:-1] + z.shape)
        return decoder.apply({"params": params}, zz, xyz, train=train)

    return apply_fn


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
        return apply_fn(z, xyz)

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
        return jax.vmap(lambda zi: apply_fn(zi, xyz))(zs)  # [S, chunk]

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
    return apply_fn(z, xyz)


def _block_points(block_flat: jnp.ndarray, res: int,
                  block: int) -> jnp.ndarray:
    """World coords of every fine voxel in each block. [K, b^3, 3]."""
    nb = res // block
    zc = block_flat % nb
    yc = (block_flat // nb) % nb
    xc = block_flat // (nb * nb)
    base = jnp.stack([xc, yc, zc], axis=-1)[:, None, :] * block  # [K,1,3]
    off = jnp.arange(block ** 3, dtype=jnp.int32)
    off3 = jnp.stack([off // (block * block), (off // block) % block,
                      off % block], axis=-1)[None, :, :]         # [1,b^3,3]
    idx = (base + off3).astype(jnp.float32)
    return idx * (2.0 / (res - 1)) - 1.0


# Memory bound for one flat apply_fn call inside block evaluation: keeps
# the [points, hidden] activation slab ~<= 1 GB at hidden width 512.
_MAX_POINTS_PER_GROUP = 1 << 20


@partial(jax.jit, static_argnums=(0, 3, 4))
def _eval_blocks(apply_fn: ApplyFn, z: jnp.ndarray, block_flat: jnp.ndarray,
                 res: int, block: int) -> jnp.ndarray:
    """Evaluate K blocks of block^3 fine voxels. block_flat [K] -> [K, b^3].

    Internally lax.map's over fixed-size block groups so peak activation
    memory is bounded regardless of K (a flat K*b^3-point apply at 256^3+
    would otherwise allocate tens of GB)."""
    K = block_flat.shape[0]
    group = max(1, min(K, _MAX_POINTS_PER_GROUP // block ** 3))
    ngroups = math.ceil(K / group)
    pad = ngroups * group - K
    ids = jnp.pad(block_flat, (0, pad), mode="edge").reshape(ngroups, group)

    def eval_group(gids):
        xyz = _block_points(gids, res, block).reshape(group * block ** 3, 3)
        return apply_fn(z, xyz).reshape(group, block ** 3)

    out = jax.lax.map(eval_group, ids)
    return out.reshape(ngroups * group, block ** 3)[:K]


@partial(jax.jit, static_argnums=(0, 2, 3, 4), static_argnames=("safety",))
def _decode_grid_hier_device_impl(apply_fn: ApplyFn, z: jnp.ndarray,
                                  res: int, block: int, capacity: int,
                                  safety: float = 1.5):
    nb = res // block
    h = 2.0 / (res - 1)
    tau = safety * (block * h * math.sqrt(3.0) / 2.0)
    centers = _eval_block_centers(apply_fn, z, res, block)      # [nb^3]
    absc = jnp.abs(centers)
    act = absc <= tau
    n_active = jnp.sum(act.astype(jnp.int32))
    # k blocks nearest the surface; includes every active block whenever
    # n_active <= capacity (checked by the caller via the returned count).
    score = jnp.where(act, absc, jnp.inf)
    _, idx = jax.lax.top_k(-score, capacity)                    # [capacity]
    valid = act[idx]
    vals = _eval_blocks(apply_fn, z, idx.astype(jnp.int32), res, block)
    coarse_fill = jnp.repeat(centers, block ** 3).reshape(nb ** 3,
                                                          block ** 3)
    grid = coarse_fill.at[idx].set(
        jnp.where(valid[:, None], vals, coarse_fill[idx]))
    grid = grid.reshape(nb, nb, nb, block, block, block)
    grid = grid.transpose(0, 3, 1, 4, 2, 5).reshape(res, res, res)
    return grid, n_active


def decode_grid_hierarchical_device(apply_fn: ApplyFn, z: jnp.ndarray,
                                    res: int, block: int = 16,
                                    capacity: int = 2048,
                                    safety: float = 1.5):
    """Fully on-device coarse->fine decode: ONE compiled program, zero host
    round-trips, grid stays device-resident (d2h streaming is the caller's
    choice). A fixed `capacity` of near-surface blocks is refined (top-k by
    |center SDF|), giving static shapes; the returned stats report the true
    active count so callers can detect capacity overflow and re-run with a
    larger capacity (the coarse fill keeps signs correct regardless, but
    surface blocks beyond capacity would stay at coarse resolution).

    Returns (grid [res]^3 device array, stats dict with scalar ints).
    """
    assert res % block == 0, "res must be divisible by block"
    nb = res // block
    capacity = min(capacity, nb ** 3)
    grid, n_active = _decode_grid_hier_device_impl(
        apply_fn, z, res, block, capacity, safety=safety)
    stats = {
        "coarse_evals": nb ** 3,
        "fine_evals": capacity * block ** 3,
        "active_blocks": int(n_active),
        "capacity": capacity,
        "capacity_exceeded": bool(int(n_active) > capacity),
        "total_blocks": int(nb ** 3),
        "effective_voxels": res ** 3,
    }
    return grid, stats


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
    # Pad every call to a multiple of 256 blocks: bounds the number of
    # distinct compiled shapes of _eval_blocks (K is data-dependent and
    # would otherwise trigger a recompile per shape).
    for start in range(0, K, max_blocks_per_call):
        ids = active[start:start + max_blocks_per_call]
        pad = (-len(ids)) % 256
        ids_p = np.pad(ids, (0, pad), mode="edge") if pad else ids
        vals = np.asarray(_eval_blocks(apply_fn, z, jnp.asarray(ids_p), res,
                                       block))
        total_fine_evals += vals.size  # padded evals are real compute
        vals = vals[:len(ids)]
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
