"""Fast dense-eval path for the SDF decoder (the pre-Pallas hot op).

Transforms the flax decoder into a closed-form chain of MXU-shaped GEMMs:

  1. **Weight-norm folding** — effective W = g * v/||v|| is materialized
     once per (params) instead of per point.
  2. **Latent hoisting** — layer 0's input is concat(z, xyz); its weight is
     split into W_z [L,H] and W_x [3,H], and z @ W_z (+bias) is computed
     once per latent instead of per query point. The skip layer's z/xyz
     slices are hoisted the same way. Per point, only the 3-wide xyz GEMM
     and the H x H hidden GEMMs remain — exactly the MXU-friendly part.
  3. **bf16 compute** — activations and folded weights are cast to a
     configurable dtype (default bfloat16) with fp32 MXU accumulation
     (preferred_element_type), fp32 output.

The returned apply has signature (z[L] | zs[..., L] via vmap, xyz[N,3]) ->
sdf[N], the contract of ops.grid_eval. Parity with the exact flax path is
tested in tests/test_fused_decoder.py (fp32 mode: ~1e-5; bf16: ~1e-2).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from latent_diffusion_models_for_shape_sdfs_tpu.config import DecoderConfig
from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import (
    SdfDecoder, effective_weight)


class EvalLayer(NamedTuple):
    w_h: jnp.ndarray | None   # [H_prev, H] hidden-input slice (None: layer 0)
    w_z: jnp.ndarray | None   # [L, H] latent slice (layer 0 / skip layers)
    w_x: jnp.ndarray | None   # [3, H] xyz slice (layer 0 / skip layers)
    b: jnp.ndarray            # [H]


class EvalWeights(NamedTuple):
    layers: tuple             # tuple[EvalLayer]
    use_tanh: bool
    latent_size: int


def precompute_eval_weights(decoder: SdfDecoder, params: dict,
                            dtype=jnp.bfloat16) -> EvalWeights:
    cfg = decoder.cfg
    assert not cfg.xyz_in_all and not cfg.latent_dropout, (
        "fused eval paths support the canonical plan; use the flax "
        "decoder for xyz_in_all / latent_dropout variants")
    L = cfg.latent_size
    plan = decoder.layer_dims()
    layers = []
    for layer, (_, out, takes_skip) in enumerate(plan):
        p = params[f"lin{layer}"]
        w = (effective_weight(p["v"], p["g"]) if cfg.weight_norm
             else p["v"]).astype(dtype)
        b = p["b"].astype(jnp.float32)
        if layer == 0:
            layers.append(EvalLayer(None, w[:L], w[L:L + 3], b))
        elif takes_skip:
            h_prev = w.shape[0] - (L + 3)
            layers.append(EvalLayer(w[:h_prev], w[h_prev:h_prev + L],
                                    w[h_prev + L:], b))
        else:
            layers.append(EvalLayer(w, None, None, b))
    return EvalWeights(tuple(layers), cfg.use_tanh, L)


def fast_apply(ew: EvalWeights, z: jnp.ndarray,
               xyz: jnp.ndarray) -> jnp.ndarray:
    """z [L], xyz [N,3] -> sdf [N] (fp32). All hidden math in ew's dtype."""
    dtype = ew.layers[0].w_z.dtype
    # fp32 mode is the parity/oracle path: force true fp32 MXU passes
    # (TPU's default fp32 matmul is reduced precision). bf16 mode keeps the
    # default single-pass MXU for speed.
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    z = z.astype(dtype)
    xyz = xyz.astype(dtype)
    n_lin = len(ew.layers)
    h = None
    for i, lay in enumerate(ew.layers):
        acc = lay.b  # fp32 [H]
        if lay.w_z is not None:
            # latent hoist: one [L]x[L,H] GEMV per call, not per point
            acc = acc + jnp.dot(z, lay.w_z, precision=prec,
                                preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(xyz, lay.w_x, precision=prec,
                                preferred_element_type=jnp.float32)
        if lay.w_h is not None:
            acc = acc + jnp.dot(h, lay.w_h, precision=prec,
                                preferred_element_type=jnp.float32)
        if i < n_lin - 1:
            h = jax.nn.relu(acc).astype(dtype)
        else:
            out = acc
    if ew.use_tanh:
        out = jnp.tanh(out)
    return out[..., 0].astype(jnp.float32)


def make_fast_apply(decoder: SdfDecoder, params: dict,
                    dtype=jnp.bfloat16) -> Callable:
    """(z [L], xyz [N,3]) -> sdf [N], with weights folded at closure time."""
    ew = precompute_eval_weights(decoder, params, dtype)

    def apply_fn(z, xyz):
        return fast_apply(ew, z, xyz)

    return apply_fn


def make_reference_apply(decoder: SdfDecoder, params: dict) -> Callable:
    """Exact flax eval path with the same (z, xyz) contract (oracle)."""

    def apply_fn(z, xyz):
        zz = jnp.broadcast_to(z, xyz.shape[:-1] + z.shape)
        return decoder.apply({"params": params}, zz, xyz, train=False)

    return apply_fn
