"""Pallas TPU kernels for the hot ops (SURVEY.md s2.2 `kernels/fused_mlp`).

1. ``make_pallas_apply`` — fused SDF-decoder evaluation: one kernel runs
   all 9 weight-norm-folded GEMMs for a tile of query points with weights
   and activations resident in VMEM (zero inter-layer HBM traffic). The
   per-shape latent projections are hoisted outside the kernel (as in
   ops.fused_decoder) so the kernel sees only per-point math. Points are
   fed transposed ([8, N], xyz padded to 8 rows) because a [N, 3] array
   would be lane-padded 128/3x in HBM.

2. ``relu_dropout`` — fused ReLU + inverted dropout using the TPU hardware
   PRNG (`pltpu.prng_random_bits`). The XLA path generates threefry bits
   for 4.3e9 elements per canonical training step (~200 ms); the hardware
   PRNG makes the mask effectively free. custom_vjp regenerates the same
   bits in the backward pass from the saved seed instead of storing the
   mask.

Both kernels have plain-XLA oracles and parity tests
(tests/test_pallas_kernels.py); `interpret=True` keeps them testable on
CPU.
"""

from __future__ import annotations

import functools
import math
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import SdfDecoder
from latent_diffusion_models_for_shape_sdfs_tpu.ops.fused_decoder import (
    EvalWeights, precompute_eval_weights)


def _on_cpu() -> bool:
    return jax.devices()[0].platform == "cpu"


# --------------------------------------------------------- fused MLP eval


def _build_eval_kernel(ew: EvalWeights, tile: int):
    """Kernel body specialized to the decoder's layer plan.

    Ref order: xyzT tile, then per layer: [w_h?], [w_x?], bias-row (the
    fp32 bias for plain layers / the hoisted z-projection row for latent
    layers), then the output tile.
    """
    n_layers = len(ew.layers)
    assert tile % 1024 == 0, "tile must be a multiple of 8*128"

    def kernel(*refs):
        xyzT = refs[0][...].astype(jnp.bfloat16)       # [8, tile]
        r = 1
        h = None
        for i, lay in enumerate(ew.layers):
            acc = None
            if lay.w_h is not None:
                w_h = refs[r][...]
                r += 1
                acc = jax.lax.dot_general(
                    h, w_h, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if lay.w_z is not None:
                w_x = refs[r][...]
                r += 1
                xterm = jax.lax.dot_general(
                    xyzT, w_x, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = xterm if acc is None else acc + xterm
            acc = acc + refs[r][...]                    # [1, H] bias row
            r += 1
            if i < n_layers - 1:
                h = jnp.maximum(acc, 0.0).astype(jnp.bfloat16)
            else:
                out = acc                               # [tile, 1]
        if ew.use_tanh:
            out = jnp.tanh(out)
        # [tile] -> (8, tile//8): Mosaic requires output blocks with
        # (8,128)-divisible trailing dims; row-major reshape keeps the
        # flat order contiguous per tile.
        refs[r][...] = out[:, 0].reshape(8, tile // 8)

    return kernel


def make_pallas_apply(decoder: SdfDecoder, params: dict,
                      tile: int = 2048,
                      interpret: bool | None = None) -> Callable:
    """(z [L], xyz [N,3]) -> sdf [N]: fused Pallas evaluation path.

    Weight-norm folding + latent hoisting happen once at closure time; the
    returned function matches the ops.grid_eval ApplyFn contract and the
    bf16 fused_decoder numerics (~1e-2 abs of exact fp32).
    """
    if interpret is None:
        interpret = _on_cpu()
    ew = precompute_eval_weights(decoder, params, jnp.bfloat16)
    L = ew.latent_size
    kernel = _build_eval_kernel(ew, tile)

    # Static per-layer tensors and their BlockSpecs.
    fixed_inputs = []
    fixed_specs = []
    z_slots = []  # (input_index, layer) needing the hoisted z row per call
    for lay in ew.layers:
        if lay.w_h is not None:
            fixed_inputs.append(lay.w_h)
            fixed_specs.append(pl.BlockSpec(lay.w_h.shape,
                                            lambda i: (0, 0),
                                            memory_space=pltpu.VMEM))
        if lay.w_z is not None:
            w_x = jnp.pad(lay.w_x, ((0, 8 - lay.w_x.shape[0]), (0, 0)))
            fixed_inputs.append(w_x)
            fixed_specs.append(pl.BlockSpec(w_x.shape, lambda i: (0, 0),
                                            memory_space=pltpu.VMEM))
        # bias row placeholder (filled per call for z-layers)
        z_slots.append(len(fixed_inputs))
        fixed_inputs.append(None)
        h_out = lay.b.shape[0]
        fixed_specs.append(pl.BlockSpec((1, h_out), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM))

    def apply_fn(z: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
        n = xyz.shape[0]
        npad = max(tile, ((n + tile - 1) // tile) * tile)
        ntiles = npad // tile
        xyzT = jnp.zeros((8, npad), jnp.float32)
        xyzT = xyzT.at[:3, :n].set(xyz.astype(jnp.float32).T)

        inputs = list(fixed_inputs)
        zb = z.astype(jnp.bfloat16)
        for slot, lay in zip(z_slots, ew.layers):
            row = lay.b
            if lay.w_z is not None:
                row = row + jnp.dot(zb, lay.w_z,
                                    preferred_element_type=jnp.float32)
            inputs[slot] = row[None, :].astype(jnp.float32)

        out = pl.pallas_call(
            kernel,
            grid=(ntiles,),
            in_specs=[pl.BlockSpec((8, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)] + fixed_specs,
            out_specs=pl.BlockSpec((8, tile // 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ntiles * 8, tile // 8),
                                           jnp.float32),
            interpret=interpret,
        )(xyzT, *inputs)
        return out.reshape(npad)[:n]

    return apply_fn


# ------------------------------------------------ fused MLP eval (pairs)


def _build_pairs_kernel(ew: EvalWeights, tile: int):
    """Kernel body for the PER-POINT-LATENT eval variant.

    Ref order: xyzT tile [8, tile], z tile [tile, L], then per layer:
    [w_h?], [w_x?, w_z?], bias row, then the output tile. Unlike
    ``_build_eval_kernel`` nothing is hoisted per shape — the latent
    GEMM (z_tile @ w_z) runs per tile, which costs ~2*L*H extra FLOPs
    per point at each latent-consuming layer (~+14% for the canonical
    8x512/L=256 plan) but lets ONE compiled program evaluate points
    belonging to arbitrary different shapes (the flattened batched
    decode, ops.grid_eval.decode_grid_hierarchical3_batch_flat).
    """
    n_layers = len(ew.layers)
    assert tile % 1024 == 0, "tile must be a multiple of 8*128"

    def kernel(*refs):
        xyzT = refs[0][...].astype(jnp.bfloat16)       # [8, tile]
        zt = refs[1][...]                              # [tile, L] bf16
        r = 2
        h = None
        for i, lay in enumerate(ew.layers):
            acc = None
            if lay.w_h is not None:
                w_h = refs[r][...]
                r += 1
                acc = jax.lax.dot_general(
                    h, w_h, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if lay.w_z is not None:
                w_x = refs[r][...]
                r += 1
                w_z = refs[r][...]
                r += 1
                xterm = jax.lax.dot_general(
                    xyzT, w_x, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                zterm = jax.lax.dot_general(
                    zt, w_z, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = (xterm + zterm) if acc is None \
                    else acc + xterm + zterm
            acc = acc + refs[r][...]                    # [1, H] bias row
            r += 1
            if i < n_layers - 1:
                h = jnp.maximum(acc, 0.0).astype(jnp.bfloat16)
            else:
                out = acc
        if ew.use_tanh:
            out = jnp.tanh(out)
        refs[r][...] = out[:, 0].reshape(8, tile // 8)

    return kernel


def make_pallas_apply_pairs(decoder: SdfDecoder, params: dict,
                            tile: int = 2048,
                            interpret: bool | None = None) -> Callable:
    """(z_rows [N, L], xyz [N, 3]) -> sdf [N]: multi-shape fused eval.

    The pairs twin of ``make_pallas_apply``: each query point carries its
    OWN latent row (typically an XLA gather ``codes[shape_id]`` fused
    into the feeding program), so one compiled kernel can serve a
    work list that mixes shapes — the enabler for the flattened batched
    decode where per-level active blocks are compacted ACROSS the batch
    instead of each shape paying the batch-max capacity. Oracle:
    ``ops.fused_decoder.fast_apply`` broadcasts over leading z dims.
    """
    if interpret is None:
        interpret = _on_cpu()
    ew = precompute_eval_weights(decoder, params, jnp.bfloat16)
    L = ew.latent_size
    kernel = _build_pairs_kernel(ew, tile)

    fixed_inputs = []
    fixed_specs = []
    for lay in ew.layers:
        if lay.w_h is not None:
            fixed_inputs.append(lay.w_h)
            fixed_specs.append(pl.BlockSpec(lay.w_h.shape,
                                            lambda i: (0, 0),
                                            memory_space=pltpu.VMEM))
        if lay.w_z is not None:
            w_x = jnp.pad(lay.w_x, ((0, 8 - lay.w_x.shape[0]), (0, 0)))
            fixed_inputs.append(w_x)
            fixed_specs.append(pl.BlockSpec(w_x.shape, lambda i: (0, 0),
                                            memory_space=pltpu.VMEM))
            fixed_inputs.append(lay.w_z)
            fixed_specs.append(pl.BlockSpec(lay.w_z.shape,
                                            lambda i: (0, 0),
                                            memory_space=pltpu.VMEM))
        fixed_inputs.append(lay.b[None, :].astype(jnp.float32))
        fixed_specs.append(pl.BlockSpec((1, lay.b.shape[0]),
                                        lambda i: (0, 0),
                                        memory_space=pltpu.VMEM))

    def pairs_fn(z_rows: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
        n = xyz.shape[0]
        assert z_rows.shape == (n, L), (z_rows.shape, n, L)
        npad = max(tile, ((n + tile - 1) // tile) * tile)
        ntiles = npad // tile
        xyzT = jnp.zeros((8, npad), jnp.float32)
        xyzT = xyzT.at[:3, :n].set(xyz.astype(jnp.float32).T)
        zp = jnp.zeros((npad, L), jnp.bfloat16)
        zp = zp.at[:n].set(z_rows.astype(jnp.bfloat16))

        out = pl.pallas_call(
            kernel,
            grid=(ntiles,),
            in_specs=[pl.BlockSpec((8, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((tile, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] + fixed_specs,
            out_specs=pl.BlockSpec((8, tile // 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ntiles * 8, tile // 8),
                                           jnp.float32),
            interpret=interpret,
        )(xyzT, zp, *fixed_inputs)
        return out.reshape(npad)[:n]

    return pairs_fn


# ------------------------------------------------------- relu + dropout


def _relu_dropout_kernel(seed_ref, x_ref, out_ref, *, rate: float):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bits = pltpu.prng_random_bits(x_ref.shape)
    threshold = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
    x = x_ref[...]
    scale = jnp.asarray(1.0 / (1.0 - rate), x.dtype)
    # compare in f32: the v5e VPU has no bf16 comparison
    pos = x.astype(jnp.float32) > 0
    out_ref[...] = jnp.where(keep & pos, x * scale, 0)


def _relu_dropout_fwd_impl(x2d: jnp.ndarray, seed: jnp.ndarray, rate: float,
                           interpret: bool, rows_per_tile: int):
    n, h = x2d.shape
    grid = pl.cdiv(n, rows_per_tile)
    return pl.pallas_call(
        functools.partial(_relu_dropout_kernel, rate=rate),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((rows_per_tile, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows_per_tile, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h), x2d.dtype),
        interpret=interpret,
    )(seed, x2d)


def _dropout_keep_mask_xla(shape, seed: jnp.ndarray, rate: float):
    """CPU fallback mask: same contract (deterministic per seed), threefry
    bitstream instead of the TPU hardware PRNG (which has no CPU
    interpreter rule)."""
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    return jax.random.uniform(key, shape) >= rate


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def relu_dropout(x: jnp.ndarray, seed: jnp.ndarray, rate: float = 0.2,
                 rows_per_tile: int = 1024) -> jnp.ndarray:
    """Fused dropout(relu(x)) with inverted-dropout scaling, TPU hardware
    PRNG. x [..., H]; seed: int32 scalar array. Deterministic given seed."""
    x2d = x.reshape(-1, x.shape[-1])
    if _on_cpu():
        keep = _dropout_keep_mask_xla(x2d.shape, seed, rate)
        scale = jnp.asarray(1.0 / (1.0 - rate), x2d.dtype)
        out = jnp.where(keep & (x2d > 0), x2d * scale, 0)
    else:
        out = _relu_dropout_fwd_impl(x2d, seed.reshape(1), rate, False,
                                     rows_per_tile)
    return out.reshape(x.shape)


def _relu_dropout_fwd(x, seed, rate, rows_per_tile):
    return relu_dropout(x, seed, rate, rows_per_tile), (x, seed)


def _mask_kernel(seed_ref, x_ref, g_ref, out_ref, *, rate: float):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bits = pltpu.prng_random_bits(x_ref.shape)
    threshold = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
    g = g_ref[...]
    scale = jnp.asarray(1.0 / (1.0 - rate), g.dtype)
    pos = x_ref[...].astype(jnp.float32) > 0  # no bf16 compare on v5e
    out_ref[...] = jnp.where(keep & pos, g * scale, 0)


def _relu_dropout_bwd(rate, rows_per_tile, res, g):
    x, seed = res
    x2d = x.reshape(-1, x.shape[-1])
    g2d = g.reshape(-1, g.shape[-1]).astype(x2d.dtype)
    if _on_cpu():
        keep = _dropout_keep_mask_xla(x2d.shape, seed, rate)
        scale = jnp.asarray(1.0 / (1.0 - rate), g2d.dtype)
        dx = jnp.where(keep & (x2d > 0), g2d * scale, 0)
        return dx.reshape(x.shape), None
    n, h = x2d.shape
    grid = pl.cdiv(n, rows_per_tile)
    dx = pl.pallas_call(
        functools.partial(_mask_kernel, rate=rate),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((rows_per_tile, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rows_per_tile, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows_per_tile, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h), x2d.dtype),
        interpret=_on_cpu(),
    )(seed.reshape(1), x2d, g2d)
    return dx.reshape(x.shape), None


relu_dropout.defvjp(_relu_dropout_fwd, _relu_dropout_bwd)
