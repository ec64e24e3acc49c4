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


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _eval_blocks(apply_fn: ApplyFn, z: jnp.ndarray, block_flat: jnp.ndarray,
                 res: int, block: int,
                 points_per_group: int = _MAX_POINTS_PER_GROUP
                 ) -> jnp.ndarray:
    """Evaluate K blocks of block^3 fine voxels. block_flat [K] -> [K, b^3].

    Internally lax.map's over fixed-size block groups so peak activation
    memory is bounded regardless of K (a flat K*b^3-point apply at 256^3+
    would otherwise allocate tens of GB). Callers that vmap this (batched
    decode) must divide points_per_group by the batch size — vmap scales
    every group activation by the batch."""
    K = block_flat.shape[0]
    if K == 0:
        out_dt = jax.eval_shape(
            apply_fn, z, jnp.zeros((block ** 3, 3), jnp.float32)).dtype
        return jnp.zeros((0, block ** 3), out_dt)
    # Balance the groups instead of filling to points_per_group: with
    # e.g. K=136448 (512^3 bench caps) a greedy group of 131072 makes
    # TWO groups where the second is 96% edge-padding — the fine eval
    # then costs 2.1M applies for 1.09M useful points. ceil-dividing K
    # over the minimal group count keeps every group the same size and
    # the padding below one group's rounding.
    max_group = max(1, min(K, points_per_group // block ** 3))
    ngroups = math.ceil(K / max_group)
    group = math.ceil(K / ngroups)
    pad = ngroups * group - K
    ids = jnp.pad(block_flat, (0, pad), mode="edge").reshape(ngroups, group)

    def eval_group(gids):
        xyz = _block_points(gids, res, block).reshape(group * block ** 3, 3)
        return apply_fn(z, xyz).reshape(group, block ** 3)

    out = jax.lax.map(eval_group, ids)
    return out.reshape(ngroups * group, block ** 3)[:K]


def _assemble_blocks(fill_b: jnp.ndarray, vals: jnp.ndarray,
                     ids: jnp.ndarray, valid: jnp.ndarray, res: int,
                     block: int, layout: str) -> jnp.ndarray:
    """Merge per-block fill values and fine block values into the grid.

    fill_b [nb^3]: per-block fill; vals [cap, block^3]: fine values for
    blocks `ids` (masked by `valid`). Implemented as an inverse-permutation
    row GATHER (vals_pad[inv]) + select rather than a row scatter into a
    repeat-fill: measured on v5e, `jnp.repeat` + `.at[ids].set` lowers to
    a ~35x slower program (109ms vs 3ms at 256^3/b2=4); the gather form is
    one fused pass over the output.

    layout="xmajor": [res,res,res] via a 6D transpose. XLA pads the two
    minor dims of the transpose temp to (8,128) tiles, so this costs up to
    128/block x the grid's bytes in HBM — fine through 256^3, OOM at
    512^3/block<8. layout="block": returns [nb^3, block^3] (row = block
    x-major id, col = within-block x-major offset); convert on host with
    `unblock_grid` (one memcpy-bound pass, always cheaper than the d2h
    transfer it follows).
    """
    nb = res // block
    cap = vals.shape[0]
    inv = jnp.full((nb ** 3,), cap, jnp.int32).at[
        jnp.where(valid, ids, nb ** 3)].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop")
    vals_pad = jnp.concatenate(
        [vals, jnp.zeros((1, block ** 3), vals.dtype)], axis=0)
    grid = jnp.where((inv < cap)[:, None], vals_pad[inv], fill_b[:, None])
    if layout == "block":
        return grid
    grid = grid.reshape(nb, nb, nb, block, block, block)
    return grid.transpose(0, 3, 1, 4, 2, 5).reshape(res, res, res)


def _fill_cascade_gather(c1: jnp.ndarray, c2: jnp.ndarray,
                         idx1: jnp.ndarray, valid1: jnp.ndarray,
                         nb1: int, nb2: int, r1: int,
                         cap1: int) -> jnp.ndarray:
    """b2-granularity fill cascade (c1 -> active-parent c2) as a GATHER.

    Value-identical to the scatter form
    (`c1[parent].at[sub_ids].set(c2)`), but TPU scatters serialize: the
    cap1 x r1^3 element scatter measured ~2.4 ms at 256^3 (~15% of the
    whole three-level program) and grows 8x at 512^3. The granularity
    matters as much as the direction: an elementwise gather over the
    nb2^3 output (262k scalar fetches at 256^3) measured SLOWER than the
    scatter it replaced — TPU gathers, like scatters, want whole-row
    access. So: invert the parent rank over the nb1^3 parents (a tiny
    scatter), gather whole r1^3-value c2 ROWS per parent (the
    _assemble_blocks trick), select vs the broadcast c1 fill, and
    finish with one 6-D transpose into the b2-flat layout.
    """
    inv1 = jnp.full((nb1 ** 3,), cap1, jnp.int32).at[
        jnp.where(valid1, idx1, nb1 ** 3)].set(
        jnp.arange(cap1, dtype=jnp.int32), mode="drop")       # [nb1^3]
    c2_pad = jnp.concatenate([c2, jnp.zeros((1, r1 ** 3), c2.dtype)], 0)
    rows = c2_pad[jnp.minimum(inv1, cap1)]                   # [nb1^3,r1^3]
    rows = jnp.where((inv1 < cap1)[:, None], rows, c1[:, None])
    rows = rows.reshape(nb1, nb1, nb1, r1, r1, r1)
    # [x1,y1,z1,ox,oy,oz] -> [x1,ox,y1,oy,z1,oz]; flat = (sx*nb2+sy)*nb2+sz
    return rows.transpose(0, 3, 1, 4, 2, 5).reshape(nb2 ** 3)


def unblock_grid(block_grid: np.ndarray, res: int, block: int) -> np.ndarray:
    """Host-side block-layout -> x-major [res,res,res] (numpy view ops)."""
    nb = res // block
    g = np.asarray(block_grid).reshape(nb, nb, nb, block, block, block)
    return np.ascontiguousarray(
        g.transpose(0, 3, 1, 4, 2, 5)).reshape(res, res, res)


def auto_layout(res: int, block: int, budget_bytes: int = 4 << 30) -> str:
    """Pick xmajor when the padded transpose temp fits comfortably."""
    pad_factor = max(1, 128 // block) * max(1, 8 // block)
    return "xmajor" if res ** 3 * 4 * pad_factor <= budget_bytes else "block"


@partial(jax.jit, static_argnums=(0, 2, 3, 4),
         static_argnames=("safety", "layout"))
def _decode_grid_hier_device_impl(apply_fn: ApplyFn, z: jnp.ndarray,
                                  res: int, block: int, capacity: int,
                                  safety: float = 1.5,
                                  layout: str = "xmajor"):
    nb = res // block
    h = 2.0 / (res - 1)
    tau = safety * (block * h * math.sqrt(3.0) / 2.0)
    centers = _eval_block_centers(apply_fn, z, res, block)      # [nb^3]
    act = jnp.abs(centers) <= tau
    # O(n) cumsum-scatter compaction of active block ids (no TPU sort);
    # completeness when n_active <= capacity is checked by the caller via
    # the returned count.
    npos = jnp.cumsum(act.astype(jnp.int32)) - 1
    pos = jnp.where(act, npos, capacity)
    idx = jnp.zeros((capacity,), jnp.int32).at[pos].set(
        jnp.arange(act.shape[0], dtype=jnp.int32), mode="drop")
    n_active = npos[-1] + 1
    valid = jnp.arange(capacity) < n_active
    vals = _eval_blocks(apply_fn, z, idx.astype(jnp.int32), res, block)
    grid = _assemble_blocks(centers, vals, idx, valid, res, block, layout)
    return grid, n_active


def decode_grid_hierarchical_device(apply_fn: ApplyFn, z: jnp.ndarray,
                                    res: int, block: int = 16,
                                    capacity: int = 2048,
                                    safety: float = 1.5,
                                    layout: str = "auto"):
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
    if layout == "auto":
        layout = auto_layout(res, block)
    grid, n_active = _decode_grid_hier_device_impl(
        apply_fn, z, res, block, capacity, safety=safety, layout=layout)
    stats = {
        "layout": layout,
        "coarse_evals": nb ** 3,
        "fine_evals": capacity * block ** 3,
        "active_blocks": int(n_active),
        "capacity": capacity,
        "capacity_exceeded": bool(int(n_active) > capacity),
        "total_blocks": int(nb ** 3),
        "effective_voxels": res ** 3,
    }
    return grid, stats


@partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 6),
         static_argnames=("safety", "layout", "points_per_group",
                          "out_dtype"))
def _decode_grid_hier2_impl(apply_fn: ApplyFn, z: jnp.ndarray, res: int,
                            b1: int, b2: int, cap1: int, cap2: int,
                            safety: float = 1.5, layout: str = "xmajor",
                            points_per_group: int = _MAX_POINTS_PER_GROUP,
                            out_dtype: str = "float32"):
    """Two-level coarse->mid->fine sparse decode, single compiled program.

    L0 evaluates b1-block centers; the cap1 blocks nearest the surface are
    refined to b2-sub-block centers (L1); the cap2 sub-blocks nearest the
    surface are evaluated densely (L2). Grid assembled at b2 granularity:
    parent-center fill -> sub-center fill -> fine values.
    """
    r = b1 // b2
    nb1 = res // b1
    nb2 = res // b2
    h = 2.0 / (res - 1)
    tau1 = safety * (b1 * h * math.sqrt(3.0) / 2.0)
    tau2 = safety * (b2 * h * math.sqrt(3.0) / 2.0)

    def compact(mask, cap):
        """Indices of set mask bits, packed into a cap-sized buffer.
        O(n) cumsum+scatter — no TPU sort (top_k is a bitonic sort and
        dominated the runtime at ~200k candidates). Returns (ids [cap],
        valid [cap], n_active); overflow beyond cap is dropped."""
        n = mask.shape[0]
        npos = jnp.cumsum(mask.astype(jnp.int32)) - 1
        pos = jnp.where(mask, npos, cap)  # cap = OOB -> dropped
        ids = jnp.zeros((cap,), jnp.int32).at[pos].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        n_active = npos[-1] + 1
        valid = jnp.arange(cap) < n_active
        return ids, valid, n_active

    # ---- L0: b1-block centers
    c1 = _eval_block_centers(apply_fn, z, res, b1)             # [nb1^3]
    act1 = jnp.abs(c1) <= tau1
    idx1, valid1, n1 = compact(act1, cap1)                     # [cap1]

    # ---- L1: sub-block centers of the selected parents
    # parent block (x1,y1,z1) -> its r^3 sub-blocks in b2-block space
    x1, y1, z1 = (idx1 // (nb1 * nb1), (idx1 // nb1) % nb1, idx1 % nb1)
    off = jnp.arange(r ** 3, dtype=jnp.int32)
    ox, oy, oz = off // (r * r), (off // r) % r, off % r
    sx = x1[:, None] * r + ox[None, :]                         # [cap1, r^3]
    sy = y1[:, None] * r + oy[None, :]
    sz = z1[:, None] * r + oz[None, :]
    sub_ids = (sx * nb2 + sy) * nb2 + sz                       # b2-flat ids
    # centers of those sub-blocks in world coords
    cidx = jnp.stack([sx, sy, sz], -1).astype(jnp.float32) * b2 \
        + (b2 - 1) / 2.0
    sub_xyz = (cidx * (2.0 / (res - 1)) - 1.0).reshape(cap1 * r ** 3, 3)
    c2 = apply_fn(z, sub_xyz).reshape(cap1, r ** 3)            # [cap1, r^3]

    act2 = (jnp.abs(c2) <= tau2) & valid1[:, None]
    flat_ids = sub_ids.reshape(-1)
    sel, valid2, n2 = compact(act2.reshape(-1), cap2)
    ids2 = flat_ids[sel].astype(jnp.int32)                     # [cap2]

    # ---- L2: fine voxels of selected sub-blocks
    vals = _eval_blocks(apply_fn, z, ids2, res, b2,
                        points_per_group)                      # [cap2, b2^3]

    # ---- assemble at b2 granularity: parent b1-center fill, overwritten
    # by computed sub-centers where available, then fine block values.
    fill2 = _fill_cascade_gather(c1, c2, idx1, valid1, nb1, nb2, r, cap1)
    dt = jnp.dtype(out_dtype)
    if dt != vals.dtype:
        # bf16 output grid: halves assembly + d2h traffic; near the iso
        # level |sdf| <= ~4h so the relative bf16 step (2^-8) costs ~1e-4
        # absolute on marching-cubes vertex interpolation — far below the
        # grid-resolution error floor.
        vals, fill2 = vals.astype(dt), fill2.astype(dt)
    grid = _assemble_blocks(fill2, vals, ids2, valid2, res, b2, layout)
    return grid, n1, n2


def decode_grid_hierarchical2_device(apply_fn: ApplyFn, z: jnp.ndarray,
                                     res: int, b1: int = 16, b2: int = 4,
                                     cap1: int = 3072, cap2: int = 8192,
                                     safety: float = 1.5,
                                     check_overflow: bool = True,
                                     layout: str = "auto",
                                     out_dtype: str = "float32"):
    """Two-level on-device sparse decode (see _decode_grid_hier2_impl).

    ~3-6x fewer true evaluations than the single-level path at 256^3+.
    With check_overflow=False no host sync happens at all (stats carry
    device scalars) — the timed production path.
    """
    assert res % b1 == 0 and b1 % b2 == 0
    cap1 = min(cap1, (res // b1) ** 3)
    cap2 = min(cap2, cap1 * (b1 // b2) ** 3)
    if layout == "auto":
        layout = auto_layout(res, b2)
    grid, n1, n2 = _decode_grid_hier2_impl(apply_fn, z, res, b1, b2,
                                           cap1, cap2, safety=safety,
                                           layout=layout,
                                           out_dtype=out_dtype)
    stats = {
        "layout": layout,
        "coarse_evals": (res // b1) ** 3,
        "mid_evals": cap1 * (b1 // b2) ** 3,
        "fine_evals": cap2 * b2 ** 3,
        "active_l1": n1, "active_l2": n2,
        "cap1": cap1, "cap2": cap2,
        "effective_voxels": res ** 3,
    }
    if check_overflow:
        stats["active_l1"] = int(n1)
        stats["active_l2"] = int(n2)
        stats["capacity_exceeded"] = (stats["active_l1"] > cap1
                                      or stats["active_l2"] > cap2)
    return grid, stats


@partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 6, 7, 8),
         static_argnames=("safety", "safety3", "layout",
                          "points_per_group", "out_dtype"))
def _decode_grid_hier3_impl(apply_fn: ApplyFn, z: jnp.ndarray, res: int,
                            b1: int, b2: int, b3: int,
                            cap1: int, cap2: int, cap3: int,
                            safety: float = 1.5, safety3: float = 0.0,
                            layout: str = "xmajor",
                            points_per_group: int = _MAX_POINTS_PER_GROUP,
                            out_dtype: str = "float32"):
    """Three-level coarse->mid->sub->fine sparse decode, one program.

    Extends the two-level scheme with a b3 (=2 voxel) selection level:
    of a selected b2 block's (b2/b3)^3 sub-blocks, only those whose
    sub-center is within tau3 of the surface are evaluated densely; the
    rest keep their sub-center value. This roughly halves true fine
    evaluations again (measured 487k -> ~265k at 256^3 on a sphere) while
    the expensive assembly stays at TPU-friendly 64-wide b2 rows — b3-unit
    (8-wide) rows would pay a 16x lane-padding tax on every gather.

    Sign-exactness argument (same class as the 2-level path): an inactive
    sub-block has |c3| > tau3 = safety*b3*h*sqrt(3)/2, so for a
    <=safety-Lipschitz SDF it contains no zero and its uniform fill
    preserves every crossing; magnitudes next to active/inactive borders
    are approximate exactly as at the 2-level block borders.
    """
    r1 = b1 // b2
    r2 = b2 // b3
    nb1 = res // b1
    nb2 = res // b2
    nb3 = res // b3
    h = 2.0 / (res - 1)
    tau1 = safety * (b1 * h * math.sqrt(3.0) / 2.0)
    tau2 = safety * (b2 * h * math.sqrt(3.0) / 2.0)
    # safety3 (0 = inherit safety) widens only the finest selection
    # margin; widening is compute-free while n3 <= cap3 (the fine eval
    # runs over the static cap3 rows regardless). Measured at 256^3 on
    # two trained decoders (6k chairs L1 2e-3; 128 chairs L1 5e-3),
    # crossing-set differences vs the dense f32 decode are INVARIANT to
    # safety, safety3, AND refining every sub-block — they are not
    # selection loss at all, but per-program evaluation jitter:
    # apply_fn is bit-deterministic standalone across batch shapes, yet
    # once inlined into differently-shaped decode programs XLA fuses it
    # slightly differently and near-zero voxels (|sdf| ~ 1e-5..3e-4)
    # flip sign, shifting ~1-3% of crossings by one voxel (missed ~=
    # extra; min-|dense|-side always < 3e-4 ~ 4% of a voxel; mesh-level
    # impact below the 100k-point sampling floor).
    # tools/quality_run.py asserts the production config loses no
    # crossing whose BOTH sides are > h/2 from the iso level (the
    # lost-geometry detector); production paths pass safety3=2.0 as
    # free insurance for steeper decoders.
    tau3 = (safety3 or safety) * (b3 * h * math.sqrt(3.0) / 2.0)

    def compact(mask, cap):
        n = mask.shape[0]
        npos = jnp.cumsum(mask.astype(jnp.int32)) - 1
        pos = jnp.where(mask, npos, cap)
        ids = jnp.zeros((cap,), jnp.int32).at[pos].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        n_active = npos[-1] + 1
        valid = jnp.arange(cap) < n_active
        return ids, valid, n_active, jnp.where(mask, npos, cap)

    # ---- L0: b1-block centers
    c1 = _eval_block_centers(apply_fn, z, res, b1)               # [nb1^3]
    idx1, valid1, n1, _ = compact(jnp.abs(c1) <= tau1, cap1)

    # ---- L1: b2 sub-centers of selected parents
    x1, y1, z1 = (idx1 // (nb1 * nb1), (idx1 // nb1) % nb1, idx1 % nb1)
    off = jnp.arange(r1 ** 3, dtype=jnp.int32)
    ox, oy, oz = off // (r1 * r1), (off // r1) % r1, off % r1
    sx = x1[:, None] * r1 + ox[None, :]
    sy = y1[:, None] * r1 + oy[None, :]
    sz = z1[:, None] * r1 + oz[None, :]
    sub_ids = (sx * nb2 + sy) * nb2 + sz                        # [cap1,r1^3]
    cidx = jnp.stack([sx, sy, sz], -1).astype(jnp.float32) * b2 \
        + (b2 - 1) / 2.0
    c2 = apply_fn(z, (cidx * h - 1.0).reshape(cap1 * r1 ** 3, 3)
                  ).reshape(cap1, r1 ** 3)
    act2 = (jnp.abs(c2) <= tau2) & valid1[:, None]
    sel2, valid2, n2, _ = compact(act2.reshape(-1), cap2)
    ids2 = sub_ids.reshape(-1)[sel2].astype(jnp.int32)          # b2-flat

    # ---- L2: b3 sub-centers of selected b2 blocks
    x2, y2, z2 = (ids2 // (nb2 * nb2), (ids2 // nb2) % nb2, ids2 % nb2)
    off3 = jnp.arange(r2 ** 3, dtype=jnp.int32)
    px, py, pz = off3 // (r2 * r2), (off3 // r2) % r2, off3 % r2
    tx = x2[:, None] * r2 + px[None, :]
    ty = y2[:, None] * r2 + py[None, :]
    tz = z2[:, None] * r2 + pz[None, :]
    sub3_ids = (tx * nb3 + ty) * nb3 + tz                       # [cap2,r2^3]
    c3idx = jnp.stack([tx, ty, tz], -1).astype(jnp.float32) * b3 \
        + (b3 - 1) / 2.0
    c3 = apply_fn(z, (c3idx * h - 1.0).reshape(cap2 * r2 ** 3, 3)
                  ).reshape(cap2, r2 ** 3)
    act3 = (jnp.abs(c3) <= tau3) & valid2[:, None]
    sel3, valid3, n3, slot_rank = compact(act3.reshape(-1), cap3)
    ids3 = sub3_ids.reshape(-1)[sel3].astype(jnp.int32)         # b3-flat

    # ---- L3: fine voxels of selected b3 blocks
    vals3 = _eval_blocks(apply_fn, z, ids3, res, b3,
                         points_per_group)                      # [cap3,b3^3]

    # ---- compose 64-wide b2 rows: per (b2 block, sub-slot) pick fine
    # values (if the slot was refined) else the slot's sub-center fill.
    # slot_rank already carries each slot's row in vals3 (cap3 = dropped).
    inv_slot = slot_rank.reshape(cap2, r2 ** 3)
    vals3_pad = jnp.concatenate(
        [vals3, jnp.zeros((1, b3 ** 3), vals3.dtype)], axis=0)
    picked = vals3_pad[jnp.minimum(inv_slot, cap3)]             # [cap2,r2^3,b3^3]
    vals2 = jnp.where((inv_slot < cap3)[..., None], picked,
                      c3[..., None])
    # reorder (sub-block, within-sub) -> x-major order of the b2 block
    vals2 = vals2.reshape(cap2, r2, r2, r2, b3, b3, b3)
    vals2 = vals2.transpose(0, 1, 4, 2, 5, 3, 6).reshape(cap2, b2 ** 3)

    # ---- payload dtype: bf16 rounds (near-zero flips quantified in
    # QUALITY.md); "int8" quantizes at tau2/127 with SIGN PRESERVATION —
    # the reconstructed grid's sign pattern (hence the crossing set) is
    # exactly the f32 payload's, and MC vertex interpolation shifts stay
    # at the few-percent-of-a-voxel scale (tests/test_serve.py).
    if out_dtype in ("int8", "int4"):
        def conv(v):
            q = jnp.clip(jnp.round(v * (127.0 / tau2)), -127.0, 127.0)
            q = jnp.where((q == 0.0) & (v != 0.0), jnp.sign(v), q)
            return q.astype(jnp.int8)
    else:
        dt = jnp.dtype(out_dtype)
        conv = (lambda v: v.astype(dt)) if dt != jnp.float32 \
            else (lambda v: v)
    if out_dtype == "int4":
        if (b2 ** 3) % 2:
            raise ValueError(
                f"int4 payload packs fine-row values pairwise and needs "
                f"an even row length b2**3; got b2={b2} "
                f"(b2**3={b2 ** 3}). Use an even b2 or out_dtype='int8'.")
        # bandwidth mode: the fine rows (the payload's dominant bytes)
        # pack to 4-bit two's-complement nibbles at clip tau2/2 — still
        # >= the h*sqrt(3) bound on crossing-cell corner magnitudes, so
        # sign preservation keeps the crossing set exact; vertex
        # interpolation coarsens to a step of tau2/14 (~0.3 voxel,
        # Chamfer-negligible; quantified in tests/test_serve.py). The
        # small coarse cascade stays int8.
        def conv_vals(v):
            q = jnp.clip(jnp.round(v * (14.0 / tau2)), -7.0, 7.0)
            q = jnp.where((q == 0.0) & (v != 0.0), jnp.sign(v), q)
            q = q.astype(jnp.int8)
            lo = q[..., 0::2] & 0xF
            hi = q[..., 1::2] & 0xF
            return (lo | (hi << 4)).astype(jnp.uint8)
    else:
        conv_vals = conv
    if layout == "sparse2":
        # Compact serving payload: the coarse fill cascade ships at its
        # NATIVE granularity — c1 [nb1^3] plus the active-parent c2 rows
        # [cap1, r1^3] + idx1 [cap1] — instead of the expanded [nb2^3]
        # fill2 (512 KB of bf16 at 256^3). The host rebuilds fill2 with
        # two numpy scatters (sparse2_to_grid); values are identical, so
        # reconstruction stays bit-equal to the "sparse" payload's.
        return (conv(c1), conv(c2), idx1, conv_vals(vals2),
                ids2), n1, n2, n3

    # ---- b2-granularity fill cascade (c1 -> c2), then row assembly
    fill2 = _fill_cascade_gather(c1, c2, idx1, valid1, nb1, nb2, r1,
                                 cap1)
    vals2, fill2 = conv(vals2), conv(fill2)
    if layout == "sparse":
        # Serving-path output: skip assembly and hand back the compact
        # representation — fill2 [nb2^3] (b2-granularity coarse cascade),
        # vals2 [cap2, b2^3] fine rows for blocks ids2 (first n2 rows
        # valid). At 256^3 with cap2=16k/bf16 this is ~2.6 MB to the host
        # instead of the 33 MB full grid — the d2h link (relay-throttled
        # here, PCIe in general) is the end-to-end mesh-serving
        # bottleneck, not compute. Reconstruct with sparse_to_grid.
        return (fill2, vals2, ids2), n1, n2, n3
    grid = _assemble_blocks(fill2, vals2, ids2, valid2, res, b2, layout)
    return grid, n1, n2, n3


def decode_grid_hierarchical3_device(apply_fn: ApplyFn, z: jnp.ndarray,
                                     res: int, b1: int = 16, b2: int = 4,
                                     b3: int = 2, cap1: int = 3072,
                                     cap2: int = 8192, cap3: int = 24576,
                                     safety: float = 1.5,
                                     safety3: float = 0.0,
                                     check_overflow: bool = True,
                                     layout: str = "auto",
                                     out_dtype: str = "float32"):
    """Three-level on-device sparse decode (see _decode_grid_hier3_impl)."""
    assert res % b1 == 0 and b1 % b2 == 0 and b2 % b3 == 0
    assert out_dtype != "int8", "int8 is a sparse-payload-only dtype"
    cap1 = min(cap1, (res // b1) ** 3)
    cap2 = min(cap2, cap1 * (b1 // b2) ** 3)
    cap3 = min(cap3, cap2 * (b2 // b3) ** 3)
    if layout == "auto":
        layout = auto_layout(res, b2)
    grid, n1, n2, n3 = _decode_grid_hier3_impl(
        apply_fn, z, res, b1, b2, b3, cap1, cap2, cap3, safety=safety,
        safety3=safety3, layout=layout, out_dtype=out_dtype)
    stats = {
        "layout": layout,
        "coarse_evals": (res // b1) ** 3,
        "mid_evals": cap1 * (b1 // b2) ** 3,
        "sub_evals": cap2 * (b2 // b3) ** 3,
        "fine_evals": cap3 * b3 ** 3,
        "active_l1": n1, "active_l2": n2, "active_l3": n3,
        "cap1": cap1, "cap2": cap2, "cap3": cap3,
        "effective_voxels": res ** 3,
    }
    if check_overflow:
        stats["active_l1"] = int(n1)
        stats["active_l2"] = int(n2)
        stats["active_l3"] = int(n3)
        stats["capacity_exceeded"] = (stats["active_l1"] > cap1
                                      or stats["active_l2"] > cap2
                                      or stats["active_l3"] > cap3)
    return grid, stats


def decode_grid_hierarchical3_sparse(apply_fn: ApplyFn, z: jnp.ndarray,
                                     res: int, b1: int = 16, b2: int = 4,
                                     b3: int = 2, cap1: int = 3072,
                                     cap2: int = 8192, cap3: int = 24576,
                                     safety: float = 1.5,
                                     safety3: float = 0.0,
                                     check_overflow: bool = True,
                                     out_dtype: str = "bfloat16"):
    """Three-level sparse decode returning the COMPACT representation.

    Same program as decode_grid_hierarchical3_device minus the on-device
    assembly: returns ((fill2 [nb2^3], vals2 [cap2, b2^3], ids2 [cap2]),
    stats). Only the first stats['active_l2'] rows of vals2/ids2 are
    meaningful. Intended for the mesh-serving path where the host (or a
    downstream consumer) only needs near-surface blocks: the d2h payload
    shrinks by ~res^3 / (cap2*b2^3 + nb2^3), ~12x at 256^3 with the
    bench capacities. Reconstruct a full x-major grid with
    sparse_to_grid(...) — bit-identical to the layout="block" full path.
    """
    assert res % b1 == 0 and b1 % b2 == 0 and b2 % b3 == 0
    cap1 = min(cap1, (res // b1) ** 3)
    cap2 = min(cap2, cap1 * (b1 // b2) ** 3)
    cap3 = min(cap3, cap2 * (b2 // b3) ** 3)
    (fill2, vals2, ids2), n1, n2, n3 = _decode_grid_hier3_impl(
        apply_fn, z, res, b1, b2, b3, cap1, cap2, cap3, safety=safety,
        safety3=safety3, layout="sparse", out_dtype=out_dtype)
    stats = {"layout": "sparse", "cap1": cap1, "cap2": cap2, "cap3": cap3,
             "active_l1": n1, "active_l2": n2, "active_l3": n3,
             "payload_bytes": int(fill2.nbytes + vals2.nbytes
                                  + ids2.nbytes),
             "effective_voxels": res ** 3}
    if check_overflow:
        stats["active_l1"] = int(n1)
        stats["active_l2"] = int(n2)
        stats["active_l3"] = int(n3)
        stats["capacity_exceeded"] = (stats["active_l1"] > cap1
                                      or stats["active_l2"] > cap2
                                      or stats["active_l3"] > cap3)
    return (fill2, vals2, ids2), stats


def hier3_int8_scale(res: int, b2: int = 4, safety: float = 1.2) -> float:
    """Quantization scale of the int8 sparse payload: tau2 of the decode
    program (payload value = round(sdf * 127 / scale), sign-preserved).
    Must be called with the same (res, b2, safety) as the decode."""
    h = 2.0 / (res - 1)
    return float(safety * (b2 * h * math.sqrt(3.0) / 2.0))


def decode_grid_hierarchical3_sparse2(apply_fn: ApplyFn, z: jnp.ndarray,
                                      res: int, b1: int = 16, b2: int = 4,
                                      b3: int = 2, cap1: int = 3072,
                                      cap2: int = 8192, cap3: int = 24576,
                                      safety: float = 1.2,
                                      safety3: float = 0.0,
                                      check_overflow: bool = True,
                                      out_dtype: str = "int8"):
    """Three-level sparse decode, COMPACT v2 payload for serving.

    Returns ((c1 [nb1^3], c2 [cap1, (b1/b2)^3], idx1 [cap1],
    vals2 [cap2, b2^3], ids2 [cap2]), stats): the coarse fill cascade at
    its native granularity instead of the expanded [nb2^3] fill2 of
    decode_grid_hierarchical3_sparse, plus the same fine rows. Only the
    first stats['active_l1'] rows of c2/idx1 and 'active_l2' rows of
    vals2/ids2 are meaningful — callers (serve.serve_meshes) device-slice
    to bucketed row counts before d2h, which is where the payload shrink
    over the v1 format comes from (the v1 payload is cap-sized however
    empty the shell is). out_dtype="int8" (default) quantizes values at
    tau2/127 with sign preservation: the reconstructed crossing set is
    exactly the f32 payload's (dequantize scale: hier3_int8_scale).
    Reconstruct with sparse2_to_grid.
    """
    assert res % b1 == 0 and b1 % b2 == 0 and b2 % b3 == 0
    if out_dtype == "int4" and (b2 ** 3) % 2:
        raise ValueError(
            f"int4 payload packs fine-row values pairwise and needs an "
            f"even row length b2**3; got b2={b2} (b2**3={b2 ** 3}). "
            f"Use an even b2 or out_dtype='int8'.")
    cap1 = min(cap1, (res // b1) ** 3)
    cap2 = min(cap2, cap1 * (b1 // b2) ** 3)
    cap3 = min(cap3, cap2 * (b2 // b3) ** 3)
    arrs, n1, n2, n3 = _decode_grid_hier3_impl(
        apply_fn, z, res, b1, b2, b3, cap1, cap2, cap3, safety=safety,
        safety3=safety3, layout="sparse2", out_dtype=out_dtype)
    stats = {"layout": "sparse2", "cap1": cap1, "cap2": cap2,
             "cap3": cap3, "active_l1": n1, "active_l2": n2,
             "active_l3": n3,
             "payload_bytes": int(sum(a.nbytes for a in arrs)),
             "effective_voxels": res ** 3}
    if out_dtype in ("int8", "int4"):
        stats["quant_scale"] = hier3_int8_scale(res, b2, safety)
    if check_overflow:
        stats["active_l1"] = int(n1)
        stats["active_l2"] = int(n2)
        stats["active_l3"] = int(n3)
        stats["capacity_exceeded"] = (stats["active_l1"] > cap1
                                      or stats["active_l2"] > cap2
                                      or stats["active_l3"] > cap3)
    return arrs, stats


def _sparse2_dequant(a, dequant_scale):
    a = np.asarray(a)
    if a.dtype == np.int8:
        assert dequant_scale is not None, \
            "int8 payload needs dequant_scale (hier3_int8_scale)"
        return a.astype(np.float32) * (dequant_scale / 127.0)
    if a.dtype == np.uint8:
        # packed int4 fine rows ("int4" bandwidth mode): two's-complement
        # nibbles, even index low, odd index high; clip scale tau2/2
        assert dequant_scale is not None, \
            "int4 payload needs dequant_scale (hier3_int8_scale)"
        lo = (a & 0xF).astype(np.int8)
        hi = ((a >> 4) & 0xF).astype(np.int8)
        lo = np.where(lo > 7, lo - 16, lo)
        hi = np.where(hi > 7, hi - 16, hi)
        out = np.empty(a.shape[:-1] + (a.shape[-1] * 2,), np.float32)
        out[..., 0::2] = lo
        out[..., 1::2] = hi
        return out * (dequant_scale / 14.0)
    return a


def sparse2_fill2(c1, c2, idx1, n1: int, res: int, b1: int, b2: int,
                  dequant_scale: float = None,
                  dtype=np.float32) -> np.ndarray:
    """Rebuild the b2-granularity fill cascade [nb2^3] of the v2 payload:
    c1 broadcast to b2 blocks, active-parent c2 rows scattered over their
    sub-block ids — the numpy mirror of the device-side cascade in
    _decode_grid_hier3_impl. This small (1 MB at 256^3) array + the fine
    rows is everything the payload-direct mesher needs."""
    r1 = b1 // b2
    nb1, nb2 = res // b1, res // b2
    bx = np.arange(nb2, dtype=np.int64) // r1
    parent = (bx[:, None, None] * nb1 + bx[None, :, None]) * nb1 \
        + bx[None, None, :]
    fill2 = np.asarray(_sparse2_dequant(c1, dequant_scale),
                       dtype)[parent.reshape(-1)].copy()
    i1 = np.asarray(idx1[:n1]).astype(np.int64)
    x1, y1, z1 = i1 // (nb1 * nb1), (i1 // nb1) % nb1, i1 % nb1
    off = np.arange(r1 ** 3, dtype=np.int64)
    ox, oy, oz = off // (r1 * r1), (off // r1) % r1, off % r1
    sub = ((x1[:, None] * r1 + ox[None, :]) * nb2
           + (y1[:, None] * r1 + oy[None, :])) * nb2 \
        + (z1[:, None] * r1 + oz[None, :])
    fill2[sub.reshape(-1)] = np.asarray(
        _sparse2_dequant(c2[:n1], dequant_scale), dtype).reshape(-1)
    return fill2


def sparse2_to_grid(c1, c2, idx1, vals2, ids2, n1: int, n2: int,
                    res: int, b1: int, b2: int,
                    dequant_scale: float = None,
                    dtype=np.float32) -> np.ndarray:
    """Host-side reconstruction of the compact v2 serving payload:
    sparse2_fill2 cascade + sparse_to_grid. Bit-equal to the v1 payload
    path for the same program. int8 payloads require `dequant_scale`
    (= hier3_int8_scale of the decode's (res, b2, safety))."""
    fill2 = sparse2_fill2(c1, c2, idx1, n1, res, b1, b2,
                          dequant_scale, dtype)
    return sparse_to_grid(fill2, _sparse2_dequant(vals2, dequant_scale),
                          ids2, n2, res, b2, dtype)


def sparse_to_grid(fill2: np.ndarray, vals2: np.ndarray, ids2: np.ndarray,
                   n_active: int, res: int, b2: int,
                   dtype=np.float32) -> np.ndarray:
    """Host-side reconstruction of the sparse decode into an x-major grid.

    Value-equal to _assemble_blocks(layout="block") + unblock_grid, but
    built DIRECTLY in x-major order through a [nb,b2,nb,b2,nb,b2] view:
    the block-layout intermediate + 6-D transpose copy cost a second
    64 MB strided pass at 256^3 (~90 ms on this 1-core host — the
    serving path's largest host cost after the MC scan fix). Every block
    starts from its fill value; the n_active fine rows land via one
    mixed fancy/slice assignment. Duplicate ids (impossible from the
    device path) have unspecified winner here, unlike the old
    later-wins scatter.
    """
    nb = res // b2
    g = np.empty((res, res, res), dtype)
    gv = g.reshape(nb, b2, nb, b2, nb, b2)            # contiguous view
    gv[:] = np.asarray(fill2, dtype).reshape(nb, nb, nb)[
        :, None, :, None, :, None]
    ids = np.asarray(ids2[:n_active], np.int64)
    xs, ys, zs = ids // (nb * nb), (ids // nb) % nb, ids % nb
    # advanced indices first, sliced dims after: target [n_active,b2^3]
    gv[xs, :, ys, :, zs, :] = np.asarray(
        vals2[:n_active], dtype).reshape(-1, b2, b2, b2)
    return g


def decode_grid_hierarchical2_batch(apply_fn: ApplyFn, zs: jnp.ndarray,
                                    res: int, b1: int = 16, b2: int = 4,
                                    cap1: int = 1024, cap2: int = 9216,
                                    safety: float = 1.2,
                                    layout: str = "block",
                                    check_overflow: bool = True):
    """vmapped two-level sparse decode for a batch of latents
    (BASELINE.json:10 "batched 256^3 grid decode for 64 shapes/step").

    Returns (grids [S, ...], stats). Default layout "block" ([S, nb2^3,
    b2^3]) — batched x-major assembly multiplies the padded-transpose HBM
    traffic by S; unblock on host per shape. Batch in shape-chunks the
    caller sizes to HBM (e.g. 16 shapes x 64 MB at 256^3).
    """
    assert res % b1 == 0 and b1 % b2 == 0
    cap1 = min(cap1, (res // b1) ** 3)
    cap2 = min(cap2, cap1 * (b1 // b2) ** 3)
    if layout == "auto":
        layout = auto_layout(res, b2)
    ppg = max(b2 ** 3, _MAX_POINTS_PER_GROUP // int(zs.shape[0]))
    grids, n1, n2 = jax.vmap(
        lambda zz: _decode_grid_hier2_impl(apply_fn, zz, res, b1, b2, cap1,
                                           cap2, safety=safety,
                                           layout=layout,
                                           points_per_group=ppg))(zs)
    stats = {
        "layout": layout,
        "coarse_evals": zs.shape[0] * (res // b1) ** 3,
        "mid_evals": zs.shape[0] * cap1 * (b1 // b2) ** 3,
        "fine_evals": zs.shape[0] * cap2 * b2 ** 3,
        "active_l1": n1, "active_l2": n2,
        "cap1": cap1, "cap2": cap2,
        "effective_voxels": zs.shape[0] * res ** 3,
    }
    if check_overflow:
        stats["active_l1"] = np.asarray(n1)
        stats["active_l2"] = np.asarray(n2)
        stats["capacity_exceeded"] = bool(
            (stats["active_l1"] > cap1).any()
            or (stats["active_l2"] > cap2).any())
    return grids, stats


def decode_grid_hierarchical3_batch(apply_fn: ApplyFn, zs: jnp.ndarray,
                                    res: int, b1: int = 16, b2: int = 4,
                                    b3: int = 2, cap1: int = 1024,
                                    cap2: int = 9216, cap3: int = 24576,
                                    safety: float = 1.2,
                                    safety3: float = 2.0,
                                    layout: str = "block",
                                    out_dtype: str = "float32",
                                    check_overflow: bool = True):
    """vmapped THREE-level sparse decode for a batch of latents — the
    production carrier of BASELINE.json:10 "batched 256^3 grid decode for
    64 shapes/step". Unlike the two-level batch, the finest selection
    level gets the widened safety3 margin (default 2.0 — the same free
    insurance the single-shape serving path uses; see the tau3 notes in
    _decode_grid_hier3_impl), so batched decode shares the crossing-
    integrity story asserted by tools/quality_run.py.

    Returns (grids [S, ...], stats). Default layout "block" ([S, nb2^3,
    b2^3]): batched x-major assembly multiplies the padded-transpose HBM
    traffic by S; unblock on host per shape. Batch in shape-chunks the
    caller sizes to HBM.
    """
    assert res % b1 == 0 and b1 % b2 == 0 and b2 % b3 == 0
    cap1 = min(cap1, (res // b1) ** 3)
    cap2 = min(cap2, cap1 * (b1 // b2) ** 3)
    cap3 = min(cap3, cap2 * (b2 // b3) ** 3)
    if layout == "auto":
        layout = auto_layout(res, b2)
    ppg = max(b3 ** 3, _MAX_POINTS_PER_GROUP // int(zs.shape[0]))
    grids, n1, n2, n3 = jax.vmap(
        lambda zz: _decode_grid_hier3_impl(apply_fn, zz, res, b1, b2, b3,
                                           cap1, cap2, cap3,
                                           safety=safety, safety3=safety3,
                                           layout=layout,
                                           points_per_group=ppg,
                                           out_dtype=out_dtype))(zs)
    stats = {
        "layout": layout,
        "coarse_evals": zs.shape[0] * (res // b1) ** 3,
        "mid_evals": zs.shape[0] * cap1 * (b1 // b2) ** 3,
        "sub_evals": zs.shape[0] * cap2 * (b2 // b3) ** 3,
        "fine_evals": zs.shape[0] * cap3 * b3 ** 3,
        "active_l1": n1, "active_l2": n2, "active_l3": n3,
        "cap1": cap1, "cap2": cap2, "cap3": cap3,
        "effective_voxels": zs.shape[0] * res ** 3,
    }
    if check_overflow:
        stats["active_l1"] = np.asarray(n1)
        stats["active_l2"] = np.asarray(n2)
        stats["active_l3"] = np.asarray(n3)
        stats["capacity_exceeded"] = bool(
            (stats["active_l1"] > cap1).any()
            or (stats["active_l2"] > cap2).any()
            or (stats["active_l3"] > cap3).any())
    return grids, stats


# ------------------------------------------------ flattened batched decode
#
# The vmapped batched decodes above make every shape pay the BATCH-MAX
# capacity at each level: for a heterogeneous batch (the real BASELINE
# config-4 case — 64 *different* shapes per step) that wastes
# (max/mean - 1) of the fine-eval FLOPs, the dominant cost. The
# flattened variant compacts the active blocks of ALL shapes into ONE
# global work list per level (ids carry the shape via shape-major flat
# indexing), so total work is ~ sum(active) + one shared headroom pad
# instead of S * max(active). It needs an evaluator that accepts a
# DIFFERENT latent per point — ops.pallas_kernels.make_pallas_apply_pairs
# (or the XLA oracle ops.fused_decoder.fast_apply with z rows).

PairsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


@partial(jax.jit, static_argnums=(0, 4))
def _eval_pairs_grouped(pairs_fn: PairsFn, zs: jnp.ndarray,
                        sids: jnp.ndarray, xyz: jnp.ndarray,
                        points_per_group: int = 1 << 19) -> jnp.ndarray:
    """pairs_fn over (zs[sids], xyz) in bounded-memory groups.

    The latent rows are gathered PER GROUP, so the peak HBM transient is
    group * (L*itemsize + 12) bytes instead of the full N-point latent
    matrix — at batch-64 256^3 fine level (~5.4M points) that is
    ~270 MB versus ~2.9 GB materialized up front. zs is gathered in its
    OWN dtype (pass bf16 codes on the production path — the Pallas
    pairs kernel computes in bf16 anyway; fp32 keeps the XLA oracle
    path exact for parity tests).
    """
    n = xyz.shape[0]
    zsb = zs
    if n <= points_per_group:
        return pairs_fn(jnp.take(zsb, sids, axis=0), xyz)
    ngroups = math.ceil(n / points_per_group)
    group = math.ceil(n / ngroups)
    pad = ngroups * group - n
    sids_p = jnp.pad(sids, (0, pad), mode="edge").reshape(ngroups, group)
    xyz_p = jnp.pad(xyz, ((0, pad), (0, 0)),
                    mode="edge").reshape(ngroups, group, 3)

    def eval_group(args):
        s, x = args
        return pairs_fn(jnp.take(zsb, s, axis=0), x)

    out = jax.lax.map(eval_group, (sids_p, xyz_p))
    return out.reshape(ngroups * group)[:n]


def _fill_cascade_gather_flat(c1: jnp.ndarray, c2: jnp.ndarray,
                              idx1: jnp.ndarray, valid1: jnp.ndarray,
                              S: int, nb1: int, nb2: int, r1: int,
                              cap1: int) -> jnp.ndarray:
    """Shape-major flat twin of ``_fill_cascade_gather``: [S*nb2^3].

    Works because the shape-major flat b1 id ((s*nb1 + x1)*nb1 + y1)*nb1
    + z1 factors s into the leading transpose axis, and nb2 = nb1*r1
    makes (s*nb1 + x1)*r1 + ox == s*nb2 + sx — the child ids stay within
    their shape's segment by construction.
    """
    inv1 = jnp.full((S * nb1 ** 3,), cap1, jnp.int32).at[
        jnp.where(valid1, idx1, S * nb1 ** 3)].set(
        jnp.arange(cap1, dtype=jnp.int32), mode="drop")
    c2_pad = jnp.concatenate([c2, jnp.zeros((1, r1 ** 3), c2.dtype)], 0)
    rows = c2_pad[jnp.minimum(inv1, cap1)]            # [S*nb1^3, r1^3]
    rows = jnp.where((inv1 < cap1)[:, None], rows, c1[:, None])
    rows = rows.reshape(S * nb1, nb1, nb1, r1, r1, r1)
    return rows.transpose(0, 3, 1, 4, 2, 5).reshape(S * nb2 ** 3)


@partial(jax.jit,
         static_argnums=(0, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13))
def _decode_flat_impl(pairs_fn: PairsFn, zs: jnp.ndarray, S: int,
                      res: int, b1: int, b2: int, b3: int, cap1: int,
                      cap2: int, cap3: int, safety: float,
                      safety3: float, out_dtype: str,
                      points_per_group: int = 1 << 19):
    """Jitted body of the flat batched decode: ONE compiled program per
    (caps, res, dtype) config — the per-level compaction, index math,
    and assembly all fuse on device instead of dispatching eagerly
    (which over the axon relay would cost a host round-trip per op)."""
    r1 = b1 // b2
    r2 = b2 // b3
    nb1, nb2, nb3 = res // b1, res // b2, res // b3
    cap1 = min(cap1, S * nb1 ** 3)
    cap2 = min(cap2, cap1 * r1 ** 3)
    cap3 = min(cap3, cap2 * r2 ** 3)
    h = 2.0 / (res - 1)
    tau1 = safety * (b1 * h * math.sqrt(3.0) / 2.0)
    tau2 = safety * (b2 * h * math.sqrt(3.0) / 2.0)
    tau3 = (safety3 or safety) * (b3 * h * math.sqrt(3.0) / 2.0)

    def compact(mask, cap):
        n = mask.shape[0]
        npos = jnp.cumsum(mask.astype(jnp.int32)) - 1
        pos = jnp.where(mask, npos, cap)
        ids = jnp.zeros((cap,), jnp.int32).at[pos].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        n_active = npos[-1] + 1
        valid = jnp.arange(cap) < n_active
        return ids, valid, n_active, jnp.where(mask, npos, cap)

    # ---- L0: every shape's b1-block centers (uniform, no imbalance)
    flat = jnp.arange(nb1 ** 3, dtype=jnp.int32)
    ijk = jnp.stack([flat // (nb1 * nb1), (flat // nb1) % nb1,
                     flat % nb1], -1).astype(jnp.float32)
    xyz_c = (ijk * b1 + (b1 - 1) / 2.0) * h - 1.0
    sid0 = jnp.repeat(jnp.arange(S, dtype=jnp.int32), nb1 ** 3)
    c1 = _eval_pairs_grouped(pairs_fn, zs, sid0,
                             jnp.tile(xyz_c, (S, 1)), points_per_group)
    mask1 = jnp.abs(c1) <= tau1                         # [S*nb1^3]
    idx1, valid1, n1, _ = compact(mask1, cap1)

    # ---- L1: b2 sub-centers of selected parents (global ids)
    s1 = idx1 // nb1 ** 3
    l1 = idx1 % nb1 ** 3
    x1, y1, z1 = (l1 // (nb1 * nb1), (l1 // nb1) % nb1, l1 % nb1)
    off = jnp.arange(r1 ** 3, dtype=jnp.int32)
    ox, oy, oz = off // (r1 * r1), (off // r1) % r1, off % r1
    sx = x1[:, None] * r1 + ox[None, :]
    sy = y1[:, None] * r1 + oy[None, :]
    sz = z1[:, None] * r1 + oz[None, :]
    sub_ids = s1[:, None] * nb2 ** 3 + (sx * nb2 + sy) * nb2 + sz
    cidx = jnp.stack([sx, sy, sz], -1).astype(jnp.float32) * b2 \
        + (b2 - 1) / 2.0
    c2 = _eval_pairs_grouped(
        pairs_fn, zs, jnp.repeat(s1, r1 ** 3),
        (cidx * h - 1.0).reshape(cap1 * r1 ** 3, 3),
        points_per_group).reshape(cap1, r1 ** 3)
    act2 = (jnp.abs(c2) <= tau2) & valid1[:, None]
    sel2, valid2, n2, _ = compact(act2.reshape(-1), cap2)
    ids2 = sub_ids.reshape(-1)[sel2].astype(jnp.int32)  # global b2 ids

    # ---- L2: b3 sub-centers of selected b2 blocks
    s2 = ids2 // nb2 ** 3
    l2 = ids2 % nb2 ** 3
    x2, y2, z2 = (l2 // (nb2 * nb2), (l2 // nb2) % nb2, l2 % nb2)
    off3 = jnp.arange(r2 ** 3, dtype=jnp.int32)
    px, py, pz = off3 // (r2 * r2), (off3 // r2) % r2, off3 % r2
    tx = x2[:, None] * r2 + px[None, :]
    ty = y2[:, None] * r2 + py[None, :]
    tz = z2[:, None] * r2 + pz[None, :]
    sub3_ids = s2[:, None] * nb3 ** 3 + (tx * nb3 + ty) * nb3 + tz
    c3idx = jnp.stack([tx, ty, tz], -1).astype(jnp.float32) * b3 \
        + (b3 - 1) / 2.0
    c3 = _eval_pairs_grouped(
        pairs_fn, zs, jnp.repeat(s2, r2 ** 3),
        (c3idx * h - 1.0).reshape(cap2 * r2 ** 3, 3),
        points_per_group).reshape(cap2, r2 ** 3)
    act3 = (jnp.abs(c3) <= tau3) & valid2[:, None]
    sel3, valid3, n3, slot_rank = compact(act3.reshape(-1), cap3)
    ids3 = sub3_ids.reshape(-1)[sel3].astype(jnp.int32)  # global b3 ids

    # ---- L3: fine voxels of selected b3 blocks
    sid3 = ids3 // nb3 ** 3
    vals3 = _eval_pairs_grouped(
        pairs_fn, zs, jnp.repeat(sid3, b3 ** 3),
        _block_points(ids3 % nb3 ** 3, res, b3).reshape(cap3 * b3 ** 3, 3),
        points_per_group).reshape(cap3, b3 ** 3)

    # ---- compose 64-wide b2 rows (identical to the single-shape impl)
    inv_slot = slot_rank.reshape(cap2, r2 ** 3)
    vals3_pad = jnp.concatenate(
        [vals3, jnp.zeros((1, b3 ** 3), vals3.dtype)], axis=0)
    picked = vals3_pad[jnp.minimum(inv_slot, cap3)]
    vals2 = jnp.where((inv_slot < cap3)[..., None], picked, c3[..., None])
    vals2 = vals2.reshape(cap2, r2, r2, r2, b3, b3, b3)
    vals2 = vals2.transpose(0, 1, 4, 2, 5, 3, 6).reshape(cap2, b2 ** 3)

    if out_dtype == "int8":
        def conv(v):
            q = jnp.clip(jnp.round(v * (127.0 / tau2)), -127.0, 127.0)
            q = jnp.where((q == 0.0) & (v != 0.0), jnp.sign(v), q)
            return q.astype(jnp.int8)
    else:
        dt = jnp.dtype(out_dtype)
        conv = (lambda v: v.astype(dt)) if dt != jnp.float32 \
            else (lambda v: v)

    fill2 = _fill_cascade_gather_flat(c1, c2, idx1, valid1, S, nb1, nb2,
                                      r1, cap1)
    vals2, fill2 = conv(vals2), conv(fill2)
    # block-layout assembly over the S*nb2^3 global block axis
    inv2 = jnp.full((S * nb2 ** 3,), cap2, jnp.int32).at[
        jnp.where(valid2, ids2, S * nb2 ** 3)].set(
        jnp.arange(cap2, dtype=jnp.int32), mode="drop")
    vals2_pad = jnp.concatenate(
        [vals2, jnp.zeros((1, b2 ** 3), vals2.dtype)], axis=0)
    grids = jnp.where((inv2 < cap2)[:, None],
                      vals2_pad[jnp.minimum(inv2, cap2)],
                      fill2[:, None]).reshape(S, nb2 ** 3, b2 ** 3)

    per_shape_l1 = mask1.reshape(S, nb1 ** 3).sum(1)
    return grids, n1, n2, n3, per_shape_l1


def decode_grid_hierarchical3_batch_flat(
        pairs_fn: PairsFn, zs: jnp.ndarray, res: int, b1: int = 16,
        b2: int = 4, b3: int = 2, cap1: int = 16384, cap2: int = 147456,
        cap3: int = 393216, safety: float = 1.2, safety3: float = 2.0,
        out_dtype: str = "float32", check_overflow: bool = True,
        points_per_group: int = 1 << 19):
    """Flattened three-level batched decode: work ~ sum of actives.

    caps are GLOBAL totals across the batch (use ``probe_flat_caps``).
    Returns (grids [S, (res/b2)^3, b2^3] block layout, stats). Selection
    thresholds, fill semantics, and the sign-exactness argument are
    identical to ``_decode_grid_hier3_impl`` (same taus per level); only
    the compaction domain changes from one shape to the whole batch, so
    the crossing-integrity story carries over per shape. With
    ``check_overflow=False`` nothing syncs to host — the returned stats
    hold traced actives and the call pipelines like the vmapped path.
    """
    S = int(zs.shape[0])
    assert res % b1 == 0 and b1 % b2 == 0 and b2 % b3 == 0
    r1, r2 = b1 // b2, b2 // b3
    nb1 = res // b1
    cap1 = min(cap1, S * nb1 ** 3)
    cap2 = min(cap2, cap1 * r1 ** 3)
    cap3 = min(cap3, cap2 * r2 ** 3)
    grids, n1, n2, n3, per_shape_l1 = _decode_flat_impl(
        pairs_fn, zs, S, res, b1, b2, b3, cap1, cap2, cap3,
        float(safety), float(safety3), out_dtype, points_per_group)
    stats = {
        "layout": "block",
        "coarse_evals": S * nb1 ** 3,
        "mid_evals": cap1 * r1 ** 3,
        "sub_evals": cap2 * r2 ** 3,
        "fine_evals": cap3 * b3 ** 3,
        "active_l1": n1, "active_l2": n2, "active_l3": n3,
        "cap1": cap1, "cap2": cap2, "cap3": cap3,
        "effective_voxels": S * res ** 3,
    }
    if check_overflow:
        stats["active_l1"] = int(n1)
        stats["active_l2"] = int(n2)
        stats["active_l3"] = int(n3)
        stats["per_shape_l1"] = np.asarray(per_shape_l1)
        stats["capacity_exceeded"] = (stats["active_l1"] > cap1
                                      or stats["active_l2"] > cap2
                                      or stats["active_l3"] > cap3)
    return grids, stats


def probe_flat_caps(pairs_fn: PairsFn, zs: jnp.ndarray, res: int,
                    safety: float = 1.2, safety3: float = 2.0,
                    headroom: float = 1.25, chunk: int = 16) -> tuple:
    """Measured-active+headroom GLOBAL caps for the flat batched decode.

    The flat twin of ``probe_bench_caps``: generous-cap flat decodes
    measure the batch's true per-level totals at the production
    margins; caps = round_up(headroom * total, 512). This is what makes
    heterogeneous batches cheap — the headroom multiplies the SUM of
    actives, not S times the max.

    The probe runs in sub-batches of ``chunk`` shapes and SUMS the
    actives — valid because a shape's active blocks don't depend on its
    batch-mates. A single generous-cap probe over the whole batch is a
    compile-time HBM OOM at production scale: the B=64 256^3 probe
    program needs 20.5 GB vs the v5e's 15.75 GB (XLA memory assignment,
    measured round 5 — the round-4/5 bench `hier3_het64` HTTP-500), while
    the B=16 chunk fits in ~5 GB.
    """
    S = int(zs.shape[0])
    nb1 = res // 16
    tot1 = tot2 = tot3 = 0
    for s0 in range(0, S, chunk):
        zc = zs[s0:s0 + chunk]
        Sc = int(zc.shape[0])
        # bf16 grids: only the stats matter here, and a generous-cap
        # probe would otherwise hold GBs of f32 grid block
        _, st = decode_grid_hierarchical3_batch_flat(
            pairs_fn, zc, res, 16, 4, 2, Sc * nb1 ** 3,
            Sc * res ** 2 // 2, Sc * 2 * res ** 2, safety=safety,
            safety3=safety3, out_dtype="bfloat16", check_overflow=True)
        assert not st["capacity_exceeded"], st
        tot1 += st["active_l1"]
        tot2 += st["active_l2"]
        tot3 += st["active_l3"]

    def rnd(n):
        return -(-int(headroom * n) // 512) * 512

    return (rnd(tot1), rnd(tot2), rnd(tot3))


def probe_bench_caps(apply_fn: ApplyFn, z: jnp.ndarray, res: int,
                     safety: float = 1.1, safety3: float = 0.0,
                     headroom: float = 1.25) -> tuple:
    """Measured-active capacity policy for benchmark/serving configs.

    Runs one generous-cap three-level decode to measure the shape's true
    active block counts at the given safety margins, then returns caps =
    round_up(headroom * active, 128). This is the SINGLE definition of
    the benched 256^3 configuration's capacities: bench.py times it and
    tools/quality_run.py asserts its crossing integrity on a trained
    decoder, so the headline number and the integrity proof describe the
    same program (VERDICT r2 #3), with a stated >=25% headroom instead
    of round 2's hand-tuned caps that sat at 94% occupancy.
    """
    nb1 = res // 16
    _, st = decode_grid_hierarchical3_device(
        apply_fn, z, res, 16, 4, 2, nb1 ** 3, res ** 2 // 2, 2 * res ** 2,
        safety=safety, safety3=safety3, layout="block",
        check_overflow=True)
    assert not st["capacity_exceeded"], st

    def rnd(n):
        return -(-int(headroom * n) // 128) * 128

    return (rnd(st["active_l1"]), rnd(st["active_l2"]),
            rnd(st["active_l3"]))


def decode_grid_adaptive(apply_fn: ApplyFn, z: jnp.ndarray, res: int,
                         chunk: int = 262_144) -> np.ndarray:
    """Production single-shape decode: three-level hierarchical with
    capacity-escalation retries, dense fallback for small grids.
    Returns a host x-major [res,res,res] array."""
    if res < 64 or res % 16 != 0:
        return np.asarray(decode_grid(apply_fn, z, res, chunk=chunk))
    nb1 = res // 16
    cap1 = max(256, nb1 ** 3 // 4)
    cap2 = max(2048, res ** 2 // 4)   # ~surface-shell scale at b2=4
    cap3 = max(8192, res ** 2)        # ~surface-shell scale at b3=2
    for _ in range(4):
        # block layout: the x-major device assembly costs an extra ~30%
        # in padded-transpose HBM traffic; unblocking on host is one
        # memcpy-bound pass.
        # safety3=2.0: free insurance while n3 <= cap3 (= res^2 here,
        # ~40% occupied in practice) — see the tau3 notes in
        # _decode_grid_hier3_impl for the measured jitter-vs-loss story.
        grid, stats = decode_grid_hierarchical3_device(
            apply_fn, z, res, 16, 4, 2, cap1, cap2, cap3, safety=1.2,
            safety3=2.0, layout="block")
        if not stats["capacity_exceeded"]:
            return unblock_grid(np.asarray(grid), res, 4)
        if stats["active_l1"] > stats["cap1"]:
            cap1 *= 2
        if stats["active_l2"] > stats["cap2"]:
            cap2 *= 2
        if stats["active_l3"] > stats["cap3"]:
            cap3 *= 2
    # degenerate/huge-surface shape: dense is always correct
    return np.asarray(decode_grid(apply_fn, z, res, chunk=chunk))


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
