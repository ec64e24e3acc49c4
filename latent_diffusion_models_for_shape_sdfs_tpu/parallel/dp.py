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
    make_ad_train_step, pallas_train_ok)


def _shard_map_pallas_vag(decoder: SdfDecoder, cfg: AdConfig,
                          mesh: Mesh) -> Callable:
    """The fused Pallas fwd+loss+bwd kernel wrapped for the device mesh.

    A pallas_call inside a GSPMD-sharded jit has no partitioning rule —
    XLA would replicate the kernel (n x the work) or fail to lower — so
    the production perf mode runs the kernel under shard_map: each
    device executes the fused kernel on its scene shard, loss/grad
    partial sums are psum'd over every mesh axis, and the (replicated)
    optimizer update stays outside in plain XLA. The loss and code-reg
    normalizations stay GLOBAL (cfg.scenes_per_batch * samples_per_scene
    and cfg.scenes_per_batch), so psum-of-partial-sums is bit-equivalent
    to the single-device reduction order per shard.
    """
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.fused_train import (
        make_pallas_ad_loss_grads)
    axes = mesh.axis_names
    vag = make_pallas_ad_loss_grads(
        decoder, cfg, reg_scene_count=cfg.scenes_per_batch)

    def local_vag(params, codes, scene_ids, xyz, sdf, epoch, key):
        # Decorrelate the in-kernel hardware-PRNG dropout streams across
        # shards (no-op for the math when dropout is off).
        for ax in axes:
            key = jax.random.fold_in(key, jax.lax.axis_index(ax))
        out = vag(params, codes, scene_ids, xyz, sdf, epoch, key)
        return jax.lax.psum(out, axes)

    # check_vma=False: pallas_call out_shapes carry no varying-manual-axes
    # metadata, so the vma checker cannot type them; replication of the
    # outputs is guaranteed by the explicit psum above.
    return jax.shard_map(
        local_vag, mesh=mesh,
        in_specs=(P(), P(), P(axes), P(axes), P(axes), P(), P()),
        out_specs=P(), check_vma=False)


def make_dp_ad_train_step(decoder: SdfDecoder, cfg: AdConfig,
                          mesh: Mesh) -> Callable:
    """Sharded stage-1 train step: scene axis split over the mesh.

    cfg.scenes_per_batch must be divisible by the mesh size. Returned
    callable has the same signature as the single-chip step. With
    cfg.use_pallas the fused train kernel runs per-shard via shard_map
    (see _shard_map_pallas_vag); the plain-XLA path stays pure GSPMD.
    """
    n = mesh.size  # works for Mesh and AbstractMesh (AOT sharding tests)
    assert cfg.scenes_per_batch % n == 0, (
        f"scenes_per_batch={cfg.scenes_per_batch} not divisible by "
        f"mesh size {n}")
    vag = (_shard_map_pallas_vag(decoder, cfg, mesh)
           if pallas_train_ok(cfg) else None)
    step = make_ad_train_step(decoder, cfg, jit=False,
                              value_and_grads=vag)
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


def make_dp_bank_step(decoder: SdfDecoder, cfg: AdConfig,
                      mesh: Mesh) -> Callable:
    """Sharded device-data train step: on-device balanced draw + step.

    The production feed (AdConfig.device_data) composed with the mesh:
    the sample bank is REPLICATED (every device holds the store — the
    same 'params/table replicated, batch sharded' DP layout; scene-
    sharded banks are the next scale-out step if per-device HBM binds),
    scene_ids are batch-sharded, so the balanced gather/draw lowers
    shard-locally under GSPMD and the step — including the fused Pallas
    kernel under shard_map when cfg.use_pallas — consumes an already-
    sharded batch. Signature matches train_auto_decoder's single-device
    bank_step: (state, bank, scene_ids, epoch, key) -> (state, metrics).
    The draw is deterministic given (key, scene_ids) and elementwise in
    batch position, so results are GSPMD-exact vs single-device.
    """
    n = mesh.size
    assert cfg.scenes_per_batch % n == 0, (
        f"scenes_per_batch={cfg.scenes_per_batch} not divisible by "
        f"mesh size {n}")
    vag = (_shard_map_pallas_vag(decoder, cfg, mesh)
           if pallas_train_ok(cfg) else None)
    raw_step = make_ad_train_step(decoder, cfg, jit=False,
                                  value_and_grads=vag)
    P_ = cfg.samples_per_scene
    rep = replicated(mesh)
    ids_s = batch_sharded(mesh, 1)

    def bank_step(state, bank_, scene_ids, epoch, key):
        k_data, k_step = jax.random.split(key)
        xyz, sdf = bank_.sample_batch(k_data, scene_ids, P_)
        return raw_step(state, scene_ids, xyz, sdf, epoch, k_step)

    return jax.jit(bank_step,
                   in_shardings=(rep, rep, ids_s, rep, rep),
                   out_shardings=(rep, rep),
                   donate_argnums=(0,))


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
    the caller's contract.

    shard_map (not bare GSPMD) so apply_fn may contain a pallas_call
    (ops.pallas_kernels.make_pallas_apply): each device runs the fused
    eval kernel on its point shard; there is no communication at all —
    queries are independent."""
    axes = mesh.axis_names
    pts_s = batch_sharded(mesh, 2)
    out_s = batch_sharded(mesh, 1)
    run = jax.shard_map(lambda zz, pts: apply_fn(zz, pts), mesh=mesh,
                        in_specs=(P(), P(axes)), out_specs=P(axes),
                        check_vma=False)  # pallas out_shapes have no vma
    return jax.jit(run, in_shardings=(replicated(mesh), pts_s),
                   out_shardings=out_s)


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


def make_dp_pairs_fn(pairs_fn, mesh: Mesh):
    """(z_rows [N, L], xyz [N, 3]) -> [N], point axis sharded over the mesh.

    The flat batched decode's evaluator under the device mesh: wrap the
    per-point-latent evaluator (ops.pallas_kernels.make_pallas_apply_pairs
    or its XLA oracle) in shard_map over the point axis and hand the
    result to ops.grid_eval.decode_grid_hierarchical3_batch_flat — every
    per-level eval of the globally-compacted work list then splits over
    devices (each point's latent row rides along, so shapes mix freely
    within a shard), while the selection/compaction bookkeeping stays
    replicated (<1% of the FLOPs). Zero collectives: queries are
    independent. Ragged N is padded up to the mesh size here, NOT by the
    caller — the flat decode's group sizes are data-dependent.
    """
    axes = mesh.axis_names
    n = mesh.size
    run = jax.shard_map(lambda zr, pts: pairs_fn(zr, pts), mesh=mesh,
                        in_specs=(P(axes), P(axes)), out_specs=P(axes),
                        check_vma=False)  # pallas out_shapes have no vma

    def dp_pairs(z_rows: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
        N = xyz.shape[0]
        pad = (-N) % n
        if pad:
            z_rows = jnp.pad(z_rows, ((0, pad), (0, 0)))
            xyz = jnp.pad(xyz, ((0, pad), (0, 0)))
        return run(z_rows, xyz)[:N]

    return dp_pairs


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

    # shard_map over the shape axis (not bare GSPMD-over-vmap): each
    # device vmaps `one` over its LOCAL batch/mesh.size shapes, so a
    # pallas_call inside apply_fn (the fused eval kernel) lowers per
    # device instead of hitting GSPMD with no partitioning rule. The
    # decode is embarrassingly parallel — zero collectives.
    axes = mesh.axis_names
    sh1 = batch_sharded(mesh, 1)
    sh2 = batch_sharded(mesh, 2)
    sh3 = batch_sharded(mesh, 3)
    pa = P(axes)
    run = jax.shard_map(jax.vmap(one), mesh=mesh, in_specs=(pa,),
                        out_specs=((pa, pa, pa, pa, pa), (pa, pa, pa)),
                        check_vma=False)  # pallas out_shapes have no vma
    return jax.jit(run,
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
