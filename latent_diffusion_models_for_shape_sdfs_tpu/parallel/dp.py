"""Data-parallel wrappers: sharded training step, sharded DDIM, sharded
grid decode (BASELINE.json:11 "data-parallel training on v4-8, 512^3 chunked
grid decode + sharded DDIM sampling").

Strategy (SURVEY.md s2.3): GSPMD via jit + NamedSharding. The batch axes
are sharded over the 'data' mesh axis; decoder params, the latent table
(~6 MB), and optimizer states are replicated. The latent-table gradient is
a dense scatter from sharded rows — XLA inserts the psum over ICI. No
manual collectives anywhere; semantics are bit-identical to single-device
because the loss reductions are global sums.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from latent_diffusion_models_for_shape_sdfs_tpu.config import AdConfig
from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import SdfDecoder
from latent_diffusion_models_for_shape_sdfs_tpu.parallel.mesh import (
    DATA_AXIS, batch_sharded, replicated)
from latent_diffusion_models_for_shape_sdfs_tpu.train.auto_decoder import (
    make_ad_train_step)


def make_dp_ad_train_step(decoder: SdfDecoder, cfg: AdConfig,
                          mesh: Mesh) -> Callable:
    """Sharded stage-1 train step: scene axis split over the mesh.

    cfg.scenes_per_batch must be divisible by the mesh size. Returned
    callable has the same signature as the single-chip step.
    """
    n = mesh.size  # works for Mesh and AbstractMesh (AOT sharding tests)
    assert cfg.scenes_per_batch % n == 0, (
        f"scenes_per_batch={cfg.scenes_per_batch} not divisible by "
        f"mesh size {n}")
    step = make_ad_train_step(decoder, cfg, jit=False)
    rep = replicated(mesh)
    ids_s = batch_sharded(mesh, 1)
    xyz_s = batch_sharded(mesh, 3)
    sdf_s = batch_sharded(mesh, 2)
    # state/epoch/key replicated (prefix pytree shardings), batch sharded.
    return jax.jit(
        step,
        in_shardings=(rep, ids_s, xyz_s, sdf_s, rep, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_dp_ddim_fn(denoise_fn, schedule, num: int, latent_size: int,
                    mesh: Mesh, steps: int = 50,
                    sampler: str = "ddim"):
    """Jitted key -> z0 [num, L] with the sample batch sharded over the
    mesh (factory form so AOT sharding tests can lower without devices).
    `sampler`: "ddim" or "dpm" (DPM-Solver++(2M), few-step) — both scan
    bodies are elementwise per latent, so the identical batch sharding
    applies with no collectives inside the loop."""
    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.sampler import (
        ddim_sample, dpm_solver_sample)
    n = mesh.size
    assert num % n == 0, f"num={num} not divisible by mesh size {n}"
    fn = {"ddim": ddim_sample, "dpm": dpm_solver_sample}[sampler]
    return jax.jit(
        partial(fn, denoise_fn, schedule, num=num,
                latent_size=latent_size, steps=steps),
        out_shardings=batch_sharded(mesh, 2))


def dp_ddim_sample(denoise_fn, schedule, key, num: int, latent_size: int,
                   mesh: Mesh, steps: int = 50) -> jnp.ndarray:
    """DDIM with the sample batch sharded over the mesh — the scan body is
    elementwise per latent so no collectives appear inside the loop."""
    return make_dp_ddim_fn(denoise_fn, schedule, num, latent_size, mesh,
                           steps)(key)


def make_decode_points_fn(apply_fn, mesh: Mesh):
    """Jitted (z [L], xyz [N,3]) -> [N] with the point axis sharded over
    the mesh (factory form for AOT sharding tests); N % mesh.size == 0 is
    the caller's contract."""
    pts_s = batch_sharded(mesh, 2)
    out_s = batch_sharded(mesh, 1)

    @partial(jax.jit, in_shardings=(None, pts_s), out_shardings=out_s)
    def run(zz, pts):
        return apply_fn(zz, pts)

    return run


def decode_points_sharded(apply_fn, z: jnp.ndarray, xyz: jnp.ndarray,
                          mesh: Mesh, chunk: int = 262_144) -> jnp.ndarray:
    """Evaluate one latent on a flat point set sharded over the mesh.

    This is the 512^3 scale-out path: the caller streams fixed-size point
    slabs (device_count * chunk each); every query is independent so the
    only communication is the initial shard scatter. apply_fn follows the
    grid-eval contract (z [L], xyz [N,3]) -> [N]."""
    n = mesh.size
    N = xyz.shape[0]
    assert N % n == 0, f"point count {N} not divisible by mesh size {n}"
    return make_decode_points_fn(apply_fn, mesh)(z, xyz)


def make_dp_sparse_decode_fn(apply_fn, res: int, batch: int, mesh: Mesh,
                             caps: tuple, safety: float = 1.2,
                             safety3: float = 2.0,
                             out_dtype: str = "int8"):
    """Jitted zs [batch, L] -> sparse serving payloads, shape axis sharded.

    Mesh-serving scale-out: each device runs the three-level sparse
    decode (ops.grid_eval._decode_grid_hier3_impl, layout="sparse2") for
    its shard of the latent batch — embarrassingly parallel, the only
    communication is the initial batch scatter. Returns the compact v2
    payload ((c1 [batch, nb1^3], c2 [batch, cap1, (b1/b2)^3], idx1
    [batch, cap1], vals2 [batch, cap2, b2^3], ids2 [batch, cap2]),
    (n1, n2, n3) each [batch]); all outputs stay sharded on the shape
    axis, so a host consumer pulling shape i's payload touches one
    device. batch % mesh.size == 0 is the caller's contract.
    out_dtype="int8" (default) is the sign-preserving quantized payload
    (dequantize scale: ops.grid_eval.hier3_int8_scale).
    """
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        _MAX_POINTS_PER_GROUP, _decode_grid_hier3_impl)
    assert batch % mesh.size == 0, (batch, mesh.size)
    cap1, cap2, cap3 = caps
    local = max(1, batch // mesh.size)
    ppg = max(8, _MAX_POINTS_PER_GROUP // local)

    def one(zz):
        (c1, c2, i1, v2, i2), n1, n2, n3 = _decode_grid_hier3_impl(
            apply_fn, zz, res, 16, 4, 2, cap1, cap2, cap3,
            safety=safety, safety3=safety3, layout="sparse2",
            points_per_group=ppg, out_dtype=out_dtype)
        return (c1, c2, i1, v2, i2), (n1, n2, n3)

    sh1 = batch_sharded(mesh, 1)
    sh2 = batch_sharded(mesh, 2)
    sh3 = batch_sharded(mesh, 3)
    return jax.jit(jax.vmap(one),
                   in_shardings=(sh2,),
                   out_shardings=((sh2, sh3, sh2, sh3, sh2),
                                  (sh1, sh1, sh1)))


def decode_grid_sharded(apply_fn, z: jnp.ndarray, res: int, mesh: Mesh,
                        slab_points: int = 2_097_152):
    """Full res^3 grid decode, point axis sharded over the mesh, streamed
    to host slab by slab (bounded HBM for 512^3 = 512 MB output)."""
    import numpy as np
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        _flat_to_xyz)
    n = mesh.devices.size
    slab = (slab_points // n) * n
    total = res ** 3
    out = np.empty((total,), np.float32)
    for start in range(0, total, slab):
        count = min(slab, total - start)
        pad = (-count) % n
        flat = jnp.arange(start, start + count + pad, dtype=jnp.int32)
        pts = _flat_to_xyz(jnp.minimum(flat, total - 1), res)
        vals = decode_points_sharded(apply_fn, z, pts, mesh)
        out[start:start + count] = np.asarray(vals)[:count]
    return out.reshape(res, res, res)
