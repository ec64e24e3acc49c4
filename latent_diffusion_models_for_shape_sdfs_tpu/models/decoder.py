"""DeepSDF-style auto-decoder MLP, weight-norm semantics pinned to torch.

Architecture (SEMANTICS.md section 4; lineage `deep_sdf_decoder.py` shape):
`num_layers` hidden layers of width `hidden_dim` plus a final scalar layer —
for the canonical 8x512 net that is 9 linear layers (lin0..lin8). Layers in
`latent_in` re-concatenate the full (z, xyz) input, and the *preceding*
layer's output width shrinks by the input width so the concat lands back on
`hidden_dim` (512 = 253 + 259 for the defaults).

Weight norm follows torch `weight_norm(dim=0)` for `nn.Linear`: each output
unit o has an independent scale, W[:, o] = g[o] * v[:, o] / ||v[:, o]||_2.
`g` is initialized to ||v[:, o]|| so the initial effective weight equals the
raw U(-1/sqrt(fan_in), 1/sqrt(fan_in)) init — matching torch exactly.

The module is pure fp32 by default; `compute_dtype="bfloat16"` casts
activations (never params, never the loss) for MXU-friendly bench runs.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from latent_diffusion_models_for_shape_sdfs_tpu.config import DecoderConfig


def _torch_linear_init(fan_in: int):
    """torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    k = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-k, maxval=k)

    return init


class WNLinear(nn.Module):
    """Linear layer with torch-`weight_norm(dim=0)` reparameterization."""

    features: int
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        init = _torch_linear_init(fan_in)
        v = self.param("v", init, (fan_in, self.features))
        b = self.param("b", init, (self.features,))
        if self.use_weight_norm:
            # g is initialized to 1 here and rewritten to ||v||_cols by
            # _g_to_match_torch_init (flax gives each param an independent
            # key, so g cannot see v's value during init).
            g = self.param("g", nn.initializers.ones, (self.features,))
            w = effective_weight(v, g)
        else:
            w = v
        # fp32 inputs: HIGHEST precision (TPU's default fp32 matmul is a
        # reduced-precision multi-pass; parity with the torch oracle needs
        # true fp32). bf16 inputs (compute_dtype fast path): single-pass
        # MXU with fp32 accumulation.
        if x.dtype == jnp.bfloat16:
            y = jnp.matmul(x, w.astype(x.dtype),
                           preferred_element_type=jnp.float32)
            return y + b.astype(jnp.float32)
        y = jnp.matmul(x, w.astype(x.dtype),
                       precision=jax.lax.Precision.HIGHEST)
        return y + b.astype(x.dtype)


def effective_weight(v: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """W[:, o] = g[o] * v[:, o] / ||v[:, o]||_2 (torch weight_norm dim=0)."""
    norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
    return v * (g[None, :] / jnp.maximum(norm, 1e-12))


def _g_to_match_torch_init(params: dict) -> dict:
    """Set every WNLinear's g to ||v||_cols so the initial effective weight
    equals the raw init (torch weight_norm contract). Call once after
    Module.init()."""

    def fix(p):
        if isinstance(p, dict):
            if "v" in p and "g" in p:
                v = p["v"]
                p = dict(p)
                p["g"] = jnp.sqrt(jnp.sum(v * v, axis=0))
                return p
            return {k: fix(x) for k, x in p.items()}
        return p

    return fix(params)


class SdfDecoder(nn.Module):
    """f(z, xyz) -> sdf. See module docstring for the exact layer plan."""

    cfg: DecoderConfig = DecoderConfig()

    def layer_dims(self) -> Sequence[tuple]:
        """[(in_dim, out_dim, takes_skip), ...] for each linear layer.

        Lineage option semantics: a layer feeding a `latent_in` layer
        shrinks its output by the full input width; with `xyz_in_all`,
        every non-final layer shrinks by 3 and layers > 0 (that aren't
        latent_in) re-concat xyz.
        """
        c = self.cfg
        d_in = c.latent_size + 3
        dims = [d_in] + [c.hidden_dim] * c.num_layers + [1]
        n_lin = len(dims) - 1
        plan = []
        for layer in range(n_lin):
            out = dims[layer + 1]
            if (layer + 1) in c.latent_in:
                out = dims[layer + 1] - dims[0]
            elif c.xyz_in_all and layer != n_lin - 1:
                out -= 3
            takes_skip = layer in c.latent_in
            plan.append((dims[layer], out, takes_skip))
        return plan

    @nn.compact
    def __call__(self, z: jnp.ndarray, xyz: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        z = z.astype(dtype)
        if c.latent_dropout and train:
            # lineage option: dropout(0.2) on the latent half of the input
            z = nn.Dropout(rate=0.2, deterministic=False,
                           name="latent_drop")(z)
        inp = jnp.concatenate([z, xyz.astype(dtype)], axis=-1)
        x = inp
        plan = self.layer_dims()
        n_lin = len(plan)
        for layer, (_, out, takes_skip) in enumerate(plan):
            if takes_skip:
                x = jnp.concatenate([x, inp], axis=-1)
            elif c.xyz_in_all and layer != 0:
                x = jnp.concatenate([x, xyz.astype(dtype)], axis=-1)
            x = WNLinear(out, use_weight_norm=c.weight_norm,
                         name=f"lin{layer}")(x)
            if layer < n_lin - 1:
                use_drop = c.use_dropout and c.dropout_prob > 0 and train
                if use_drop and c.dropout_impl == "pallas":
                    # fused hw-PRNG relu+dropout kernel: the XLA path's
                    # threefry mask costs ~200 ms/step at canonical batch
                    # (4.3e9 bits); the TPU hardware PRNG makes it free.
                    from latent_diffusion_models_for_shape_sdfs_tpu.ops \
                        .pallas_kernels import relu_dropout
                    key_bits = jax.random.key_data(
                        self.make_rng("dropout"))
                    seed = (key_bits[-1].astype(jnp.int32)
                            + jnp.int32(layer * 7919))
                    x = relu_dropout(x.astype(dtype), seed,
                                     c.dropout_prob)
                else:
                    # bf16 fast path accumulates each matmul in fp32; the
                    # relu input is re-cast so the next GEMM stays
                    # single-pass MXU.
                    x = nn.relu(x).astype(dtype)
                    if use_drop:
                        x = nn.Dropout(rate=c.dropout_prob,
                                       deterministic=False)(x)
        if c.use_tanh:
            x = jnp.tanh(x)
        return x[..., 0].astype(jnp.float32)

    def init_params(self, key: jax.Array) -> dict:
        """Init with torch-matching weight-norm g (use instead of .init)."""
        z = jnp.zeros((1, self.cfg.latent_size), jnp.float32)
        xyz = jnp.zeros((1, 3), jnp.float32)
        variables = self.init({"params": key}, z, xyz, train=False)
        return _g_to_match_torch_init(variables["params"])
