"""Device-side analytic-SDF sampling for fixed-structure families.

`data/analytic.py` is the host-NumPy oracle; on a 1-CPU host it becomes
the bottleneck at BASELINE config-3 scale (~6k scenes x 16k samples is
~10^8 serial SDF evals, tens of minutes). Every chair from
`analytic.make_chair` shares one CSG structure — 2 boxes + 4 capsules —
so the whole family packs into fixed-shape parameter arrays and the
entire preprocessing stage (surface Newton projection, two-variance
Gaussian shells, uniform filler, sign-split bank assembly) runs as one
jitted, vmapped program on the TPU. Same sampling *design* as
`analytic.sample_sdf_points` (SURVEY.md section 3.1 contract); different
PRNG stream, which is already the device-bank convention
(data/device_bank.py).

Parity with the host oracle is pinned by tests/test_analytic_jax.py:
the packed evaluator matches `analytic.sdf` to fp32 tolerance on random
points, and bank labels are exact analytic SDF values.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from latent_diffusion_models_for_shape_sdfs_tpu.data.device_bank import (
    DeviceSampleBank)


class ChairParams(NamedTuple):
    """Packed parameters for S chairs (analytic.make_chair structure)."""

    box_b: jnp.ndarray   # [S, 2, 3] half-extents (seat, backrest)
    box_c: jnp.ndarray   # [S, 2, 3] centers
    cap_a: jnp.ndarray   # [S, 4, 3] leg segment tops
    cap_b: jnp.ndarray   # [S, 4, 3] leg segment bottoms
    cap_r: jnp.ndarray   # [S, 4]    leg radii

    @property
    def num_shapes(self) -> int:
        return self.box_b.shape[0]

    def slice(self, start: int, size: int) -> "ChairParams":
        return ChairParams(*(a[start:start + size] for a in self))


def pack_chairs(shapes: list) -> ChairParams:
    """Pack `analytic.make_chair` trees into ChairParams arrays."""
    S = len(shapes)
    bb = np.zeros((S, 2, 3), np.float32)
    bc = np.zeros((S, 2, 3), np.float32)
    ca = np.zeros((S, 4, 3), np.float32)
    cb = np.zeros((S, 4, 3), np.float32)
    cr = np.zeros((S, 4), np.float32)
    for i, s in enumerate(shapes):
        assert s["type"] == "union", s["type"]
        boxes = [c for c in s["children"] if c["type"] == "box"]
        caps = [c for c in s["children"] if c["type"] == "capsule"]
        assert len(boxes) == 2 and len(caps) == 4, "not a make_chair tree"
        for j, b in enumerate(boxes):
            bb[i, j] = b["b"]
            bc[i, j] = b.get("c", (0.0, 0.0, 0.0))
        for j, c in enumerate(caps):
            ca[i, j] = c["a"]
            cb[i, j] = c["b"]
            cr[i, j] = c["r"]
    return ChairParams(jnp.asarray(bb), jnp.asarray(bc), jnp.asarray(ca),
                       jnp.asarray(cb), jnp.asarray(cr))


def chair_sdf(params: ChairParams, p: jnp.ndarray) -> jnp.ndarray:
    """SDF of ONE chair (unbatched params) at points p[..., 3].

    Mirrors analytic.sdf on a make_chair tree: union(min) of the exact
    box and capsule SDFs.
    """
    q = jnp.abs(p[..., None, :] - params.box_c) - params.box_b  # [..., 2, 3]
    outside = jnp.sqrt(jnp.sum(jnp.maximum(q, 0.0) ** 2, -1) + 1e-30)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    d_box = jnp.min(outside + inside, axis=-1)                  # [...]

    ab = params.cap_b - params.cap_a                            # [4, 3]
    pa = p[..., None, :] - params.cap_a                         # [..., 4, 3]
    t = jnp.clip(jnp.sum(pa * ab, -1) / jnp.sum(ab * ab, -1), 0.0, 1.0)
    closest = pa - t[..., None] * ab
    d_cap = jnp.min(
        jnp.sqrt(jnp.sum(closest ** 2, -1) + 1e-30) - params.cap_r, axis=-1)
    return jnp.minimum(d_box, d_cap)


def _surface_points(params: ChairParams, key: jax.Array, m: int,
                    iters: int = 12) -> jnp.ndarray:
    """Newton-project m random points onto one chair's zero set.

    Same scheme as analytic.sample_surface (x <- x - d * g/|g|, clip to
    the [-1.1, 1.1] cube) with the analytic gradient instead of central
    differences. Returns [m, 3]; callers draw shells from these with
    replacement, so the few non-converged stragglers only matter through
    their (exact) SDF labels.
    """
    x = jax.random.uniform(key, (m, 3), minval=-1.0, maxval=1.0)
    grad = jax.grad(lambda pt: chair_sdf(params, pt))
    gradv = jax.vmap(grad)

    def body(x, _):
        d = chair_sdf(params, x)
        g = gradv(x)
        gn = jnp.maximum(jnp.sqrt(jnp.sum(g * g, -1, keepdims=True)), 1e-8)
        x = jnp.clip(x - d[:, None] * g / gn, -1.1, 1.1)
        return x, None

    x, _ = jax.lax.scan(body, x, None, length=iters)
    return x


def sample_sdf_points_device(params: ChairParams, key: jax.Array, n: int,
                             surface_frac: float = 0.95,
                             noise_stds=(0.05, 0.0158)) -> tuple:
    """Per-chair preprocessor-contract sampling, fully on device.

    Unbatched params -> (xyz [n, 3], sdf [n]); vmap over a ChairParams
    batch for the whole-split version. Mirrors
    analytic.sample_sdf_points: two Gaussian shells around surface
    points + uniform-in-cube filler, exact analytic labels.
    """
    n_surf = int(n * surface_frac)
    n_unif = n - n_surf
    half = n_surf // 2
    m = max(half, n_surf - half)
    k_base, k_i1, k_i2, k_n1, k_n2, k_u = jax.random.split(key, 6)
    base = _surface_points(params, k_base, m)
    parts = []
    for std, k, ki, kn in zip(noise_stds, (half, n_surf - half),
                              (k_i1, k_i2), (k_n1, k_n2)):
        idx = jax.random.randint(ki, (k,), 0, m)
        parts.append(base[idx] + std * jax.random.normal(kn, (k, 3)))
    parts.append(jax.random.uniform(k_u, (n_unif, 3), minval=-1.0,
                                    maxval=1.0))
    xyz = jnp.concatenate(parts, axis=0)
    return xyz, chair_sdf(params, xyz)


@functools.partial(jax.jit, static_argnames=("n",))
def _bank_chunk(params: ChairParams, key: jax.Array, n: int) -> tuple:
    """Sign-split sample rows for a chunk of chairs.

    Returns (pos [C,n,4], neg [C,n,4], pos_count [C], neg_count [C]):
    both row arrays hold all n samples sorted so the valid side occupies
    the low slots — exactly the region DeviceSampleBank.sample_batch
    indexes (i < count).
    """
    C = params.num_shapes
    keys = jax.random.split(key, C)
    xyz, d = jax.vmap(
        lambda pr, k: sample_sdf_points_device(pr, k, n))(params, keys)
    rows = jnp.concatenate([xyz, d[..., None]], axis=-1)       # [C, n, 4]
    neg_flag = d < 0.0
    order_pos = jnp.argsort(neg_flag, axis=1, stable=True)     # pos first
    order_neg = jnp.argsort(~neg_flag, axis=1, stable=True)    # neg first
    pos = jnp.take_along_axis(rows, order_pos[..., None], axis=1)
    neg = jnp.take_along_axis(rows, order_neg[..., None], axis=1)
    nneg = jnp.sum(neg_flag, axis=1).astype(jnp.int32)
    # degenerate-side fallback (analytic.sample_scene top-up equivalent):
    # a zero count would make sample_batch read row 0 of the wrong-sign
    # array; clamping the count to n instead draws from the full set.
    npos = jnp.where(nneg == n, n, n - nneg)
    nneg = jnp.where(nneg == 0, n, nneg)
    return pos, neg, npos, nneg


def bank_from_chairs(shapes: list, key: jax.Array, samples_per_shape: int,
                     chunk: int = 512) -> DeviceSampleBank:
    """Build a DeviceSampleBank for a chair split entirely on device.

    Drop-in replacement for
    DeviceSampleBank.from_dataset(SdfDataset.from_analytic(...)) at
    config-3 scale: the host only packs parameters ([S,~30] floats);
    generation, labeling, and sign-splitting run on the TPU.
    """
    params = pack_chairs(shapes)
    S = params.num_shapes
    pos_parts, neg_parts, pc_parts, nc_parts = [], [], [], []
    for start in range(0, S, chunk):
        size = min(chunk, S - start)
        p, ng, pc, nc = _bank_chunk(params.slice(start, size),
                                    jax.random.fold_in(key, start),
                                    samples_per_shape)
        pos_parts.append(p)
        neg_parts.append(ng)
        pc_parts.append(pc)
        nc_parts.append(nc)
    return DeviceSampleBank(
        pos=jnp.concatenate(pos_parts, axis=0),
        neg=jnp.concatenate(neg_parts, axis=0),
        pos_count=jnp.concatenate(pc_parts, axis=0),
        neg_count=jnp.concatenate(nc_parts, axis=0))


# ------------------------------------------------------- generic CSG pack
# The classes13 stand-in (analytic.FAMILIES_13) is, structurally, always
# `op(children=primitives)` with op in {union, difference} and <= 6
# primitive children (chair = union of 2 boxes + 4 capsules; csg = 2-3
# primitives; singles are a 1-child union) — so the WHOLE 13-class split
# packs into fixed-shape arrays and the multi-category bank generates on
# device exactly like the chair family (BASELINE config 5 at config-3
# scale needs ~10^8 labeled samples; the 1-core host path takes ~an
# hour, the packed device path seconds).

MAX_PRIMS = 6
_PRM_W = 10  # parameter slab per primitive (superset layout below)


class CsgParams(NamedTuple):
    """Packed op-of-primitives for S shapes.

    ptype [S, K] int32: 0 sphere, 1 box, 2 torus, 3 capsule, -1 inactive
    prm   [S, K, 10] f32:
        sphere:  [c0 c1 c2 r  . . . . . .]
        box:     [b0 b1 b2 c0 c1 c2 . . . .]
        torus:   [R r c0 c1 c2 . . . . .]
        capsule: [a0 a1 a2 b0 b1 b2 r . . .]
    op    [S] int32: 0 union(min), 1 difference(max(d0, -d_rest))
    """

    ptype: jnp.ndarray
    prm: jnp.ndarray
    op: jnp.ndarray

    @property
    def num_shapes(self) -> int:
        return self.ptype.shape[0]

    def slice(self, start: int, size: int) -> "CsgParams":
        return CsgParams(*(a[start:start + size] for a in self))

    def flat(self) -> jnp.ndarray:
        """[S, K*11 + 1] f32 packing (ptype cast to f32) — lets a CSG
        shape ride in the `z` slot of the grid-eval ApplyFn contract
        (see csg_apply_flat), so ONE compiled decode program serves
        every shape of the split."""
        S = self.num_shapes
        return jnp.concatenate(
            [self.ptype.astype(jnp.float32).reshape(S, -1),
             self.prm.reshape(S, -1),
             self.op.astype(jnp.float32).reshape(S, 1)], axis=-1)


def _pack_prim(s: dict) -> tuple:
    t = s["type"]
    row = np.zeros((_PRM_W,), np.float32)
    if t == "sphere":
        row[0:3] = np.asarray(s.get("c", (0, 0, 0)), np.float32)
        row[3] = s["r"]
        return 0, row
    if t == "box":
        row[0:3] = np.asarray(s["b"], np.float32)
        row[3:6] = np.asarray(s.get("c", (0, 0, 0)), np.float32)
        return 1, row
    if t == "torus":
        row[0] = s["R"]
        row[1] = s["r"]
        row[2:5] = np.asarray(s.get("c", (0, 0, 0)), np.float32)
        return 2, row
    if t == "capsule":
        row[0:3] = np.asarray(s["a"], np.float32)
        row[3:6] = np.asarray(s["b"], np.float32)
        row[6] = s["r"]
        return 3, row
    raise ValueError(f"not a primitive: {t!r}")


def pack_csg(shapes: list) -> CsgParams:
    """Pack `analytic.make_shape` trees (any classes13 family) into
    CsgParams. Depth-1 trees only — which is all make_shape produces."""
    S = len(shapes)
    ptype = np.full((S, MAX_PRIMS), -1, np.int32)
    prm = np.zeros((S, MAX_PRIMS, _PRM_W), np.float32)
    op = np.zeros((S,), np.int32)
    for i, s in enumerate(shapes):
        t = s["type"]
        if t in ("union", "difference"):
            ch = s["children"]
            assert len(ch) <= MAX_PRIMS, (len(ch), "raise MAX_PRIMS")
            op[i] = 0 if t == "union" else 1
            for j, c in enumerate(ch):
                ptype[i, j], prm[i, j] = _pack_prim(c)
        else:
            ptype[i, 0], prm[i, 0] = _pack_prim(s)
    return CsgParams(jnp.asarray(ptype), jnp.asarray(prm),
                     jnp.asarray(op))


def csg_sdf(params: CsgParams, p: jnp.ndarray) -> jnp.ndarray:
    """SDF of ONE packed shape (unbatched params) at p[..., 3].

    Evaluates all four primitive formulas per slot and selects by type
    code — 4xK dense math per point, branch-free (TPU-friendly; bank
    generation is a one-off so the 4x overhead is irrelevant). The
    tiny +1e-30 under each sqrt keeps jax.grad finite at r=0 (the same
    guard chair_sdf uses); the value error it introduces is ~1e-15.
    """
    prm = params.prm                                  # [K, 10]
    pc = p[..., None, :]                              # [..., 1, 3]
    d_sph = jnp.sqrt(jnp.sum((pc - prm[:, 0:3]) ** 2, -1) + 1e-30) \
        - prm[:, 3]
    q = jnp.abs(pc - prm[:, 3:6]) - prm[:, 0:3]
    d_box = jnp.sqrt(jnp.sum(jnp.maximum(q, 0.0) ** 2, -1) + 1e-30) \
        + jnp.minimum(jnp.max(q, axis=-1), 0.0)
    qt = pc - prm[:, 2:5]
    xz = jnp.sqrt(qt[..., 0] ** 2 + qt[..., 2] ** 2 + 1e-30) - prm[:, 0]
    d_tor = jnp.sqrt(xz ** 2 + qt[..., 1] ** 2 + 1e-30) - prm[:, 1]
    a = prm[:, 0:3]
    ab = prm[:, 3:6] - a
    pa = pc - a
    t = jnp.clip(jnp.sum(pa * ab, -1)
                 / jnp.maximum(jnp.sum(ab * ab, -1), 1e-12), 0.0, 1.0)
    d_cap = jnp.sqrt(jnp.sum((pa - t[..., None] * ab) ** 2, -1)
                     + 1e-30) - prm[:, 6]
    tt = params.ptype                                 # [K]
    d_all = jnp.where(tt == 0, d_sph,
                      jnp.where(tt == 1, d_box,
                                jnp.where(tt == 2, d_tor, d_cap)))
    act = tt >= 0                                     # [K]
    du = jnp.min(jnp.where(act, d_all, jnp.inf), axis=-1)
    # difference: slot 0 is always active; the rest subtract
    rest = jnp.where(act[1:], -d_all[..., 1:], -jnp.inf)
    dd = jnp.maximum(d_all[..., 0], jnp.max(rest, axis=-1))
    return jnp.where(params.op == 0, du, dd)


def csg_apply_flat(z: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """grid-eval ApplyFn over a CsgParams.flat() vector — decode any
    classes13 shape's ANALYTIC SDF through the same hierarchical decode
    pipeline as the learned decoder (held-out reference protocol)."""
    K = MAX_PRIMS
    params = CsgParams(
        ptype=z[:K].astype(jnp.int32),
        prm=z[K:K + K * _PRM_W].reshape(K, _PRM_W),
        op=z[-1].astype(jnp.int32))
    return csg_sdf(params, p)


def _surface_points_any(sdf_fn, key: jax.Array, m: int,
                        iters: int = 12) -> jnp.ndarray:
    """Newton-project m random points onto sdf_fn's zero set (the
    generic form of _surface_points; same scheme/clip)."""
    x = jax.random.uniform(key, (m, 3), minval=-1.0, maxval=1.0)
    gradv = jax.vmap(jax.grad(lambda pt: sdf_fn(pt)))

    def body(x, _):
        d = sdf_fn(x)
        g = gradv(x)
        gn = jnp.maximum(jnp.sqrt(jnp.sum(g * g, -1, keepdims=True)),
                         1e-8)
        x = jnp.clip(x - d[:, None] * g / gn, -1.1, 1.1)
        return x, None

    x, _ = jax.lax.scan(body, x, None, length=iters)
    return x


def sample_sdf_points_device_any(sdf_fn, key: jax.Array, n: int,
                                 surface_frac: float = 0.95,
                                 noise_stds=(0.05, 0.0158)) -> tuple:
    """sample_sdf_points_device generalized to any device sdf_fn."""
    n_surf = int(n * surface_frac)
    n_unif = n - n_surf
    half = n_surf // 2
    m = max(half, n_surf - half)
    k_base, k_i1, k_i2, k_n1, k_n2, k_u = jax.random.split(key, 6)
    base = _surface_points_any(sdf_fn, k_base, m)
    parts = []
    for std, k, ki, kn in zip(noise_stds, (half, n_surf - half),
                              (k_i1, k_i2), (k_n1, k_n2)):
        idx = jax.random.randint(ki, (k,), 0, m)
        parts.append(base[idx] + std * jax.random.normal(kn, (k, 3)))
    parts.append(jax.random.uniform(k_u, (n_unif, 3), minval=-1.0,
                                    maxval=1.0))
    xyz = jnp.concatenate(parts, axis=0)
    return xyz, sdf_fn(xyz)


def _sign_split(rows: jnp.ndarray, d: jnp.ndarray) -> tuple:
    """Batchwise pos/neg sign split with degenerate-side fallback —
    shared by the chair and CSG bank chunks."""
    n = rows.shape[1]
    neg_flag = d < 0.0
    order_pos = jnp.argsort(neg_flag, axis=1, stable=True)
    order_neg = jnp.argsort(~neg_flag, axis=1, stable=True)
    pos = jnp.take_along_axis(rows, order_pos[..., None], axis=1)
    neg = jnp.take_along_axis(rows, order_neg[..., None], axis=1)
    nneg = jnp.sum(neg_flag, axis=1).astype(jnp.int32)
    npos = jnp.where(nneg == n, n, n - nneg)
    nneg = jnp.where(nneg == 0, n, nneg)
    return pos, neg, npos, nneg


@functools.partial(jax.jit, static_argnames=("n",))
def _bank_chunk_csg(params: CsgParams, key: jax.Array, n: int) -> tuple:
    C = params.num_shapes
    keys = jax.random.split(key, C)
    xyz, d = jax.vmap(
        lambda pr, k: sample_sdf_points_device_any(
            lambda pt: csg_sdf(pr, pt), k, n))(params, keys)
    rows = jnp.concatenate([xyz, d[..., None]], axis=-1)
    return _sign_split(rows, d)


def bank_from_csg(shapes: list, key: jax.Array, samples_per_shape: int,
                  chunk: int = 512) -> DeviceSampleBank:
    """DeviceSampleBank for ANY classes13 split, entirely on device —
    the multi-category twin of bank_from_chairs."""
    params = pack_csg(shapes)
    S = params.num_shapes
    pos_parts, neg_parts, pc_parts, nc_parts = [], [], [], []
    for start in range(0, S, chunk):
        size = min(chunk, S - start)
        p, ng, pc, nc = _bank_chunk_csg(params.slice(start, size),
                                        jax.random.fold_in(key, start),
                                        samples_per_shape)
        pos_parts.append(p)
        neg_parts.append(ng)
        pc_parts.append(pc)
        nc_parts.append(nc)
    return DeviceSampleBank(
        pos=jnp.concatenate(pos_parts, axis=0),
        neg=jnp.concatenate(neg_parts, axis=0),
        pos_count=jnp.concatenate(pc_parts, axis=0),
        neg_count=jnp.concatenate(nc_parts, axis=0))
