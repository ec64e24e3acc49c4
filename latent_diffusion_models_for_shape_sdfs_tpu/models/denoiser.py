"""Latent-space epsilon-prediction networks for the shape-latent DDPM.

The denoiser acts on single 256-d latent vectors (BASELINE.json:5 "MLP/UNet
over latent codes") — there is no long sequence axis anywhere (SURVEY.md
section 5.7). Variants:

  * ``LatentDenoiserMLP`` — time-conditioned residual MLP (the workhorse).
  * ``LatentDenoiserUNet`` — 1-D conv UNet over the latent treated as a
    (length, channels) signal; same conditioning interface.

Conditioning (BASELINE.json:10): class embedding and/or a PointNet-style
partial-SDF encoder; both are summed into the time embedding. Class
conditioning supports classifier-free guidance via a learned null embedding
(`class_id = num_classes` row) dropped in with `cond_drop_prob` at train
time.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from latent_diffusion_models_for_shape_sdfs_tpu.config import DenoiserConfig


def sinusoidal_time_embed(t: jnp.ndarray, dim: int,
                          max_period: float = 10_000.0) -> jnp.ndarray:
    """Standard DDPM sinusoidal embedding of integer timesteps. [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
                    / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimeCondEmbed(nn.Module):
    """time (+ class + partial-SDF) -> one conditioning vector [B, D]."""

    cfg: DenoiserConfig

    @nn.compact
    def __call__(self, t: jnp.ndarray, class_id: Optional[jnp.ndarray],
                 partial_embed: Optional[jnp.ndarray],
                 cond_drop: Optional[jnp.ndarray]) -> jnp.ndarray:
        c = self.cfg
        emb = sinusoidal_time_embed(t, c.time_embed_dim)
        emb = nn.Dense(c.hidden_dim, name="t1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(c.hidden_dim, name="t2")(emb)
        if c.num_classes > 0:
            # Row num_classes is the learned "null" (unconditional) token.
            table = nn.Embed(c.num_classes + 1, c.hidden_dim, name="cls")
            cid = (jnp.full(t.shape, c.num_classes, jnp.int32)
                   if class_id is None else class_id)
            if cond_drop is not None:
                cid = jnp.where(cond_drop, c.num_classes, cid)
            emb = emb + table(cid)
        if c.partial_sdf_cond and partial_embed is not None:
            emb = emb + nn.Dense(c.hidden_dim, name="partial_proj")(
                partial_embed)
        return emb


class PartialSdfEncoder(nn.Module):
    """PointNet-style encoder: observed (xyz, sdf) samples -> [B, D].

    Used for partial-SDF-conditioned generation (BASELINE.json:10): the
    denoiser sees a permutation-invariant summary of whatever SDF
    observations exist for the target shape.
    """

    features: int = 256

    @nn.compact
    def __call__(self, obs_xyz: jnp.ndarray, obs_sdf: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = jnp.concatenate([obs_xyz, obs_sdf[..., None]], axis=-1)  # [B,N,4]
        for i, width in enumerate((64, 128, self.features)):
            x = nn.Dense(width, name=f"pn{i}")(x)
            x = nn.relu(x)
        if mask is not None:
            x = jnp.where(mask[..., None], x, -jnp.inf)
        x = jnp.max(x, axis=-2)  # [B, features]
        return jnp.where(jnp.isfinite(x), x, 0.0)


class ResBlock(nn.Module):
    width: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(name="ln")(x)
        h = nn.Dense(self.width, name="fc1")(h)
        h = nn.silu(h + cond)
        h = nn.Dense(x.shape[-1], name="fc2")(h)
        return x + h


class LatentDenoiserMLP(nn.Module):
    """eps_hat(z_t, t, cond): residual MLP over the 256-d latent."""

    cfg: DenoiserConfig = DenoiserConfig()

    @nn.compact
    def __call__(self, z_t: jnp.ndarray, t: jnp.ndarray,
                 class_id: Optional[jnp.ndarray] = None,
                 partial_embed: Optional[jnp.ndarray] = None,
                 cond_drop: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = self.cfg
        cond = TimeCondEmbed(c, name="cond")(t, class_id, partial_embed,
                                             cond_drop)
        x = nn.Dense(c.hidden_dim, name="in_proj")(z_t)
        for i in range(c.num_blocks):
            x = ResBlock(c.hidden_dim, name=f"block{i}")(x, cond)
        x = nn.LayerNorm(name="out_ln")(x)
        x = nn.Dense(c.latent_size, name="out_proj",
                     kernel_init=nn.initializers.zeros)(x)
        return x


class ConvBlock1D(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        h = nn.GroupNorm(num_groups=8, name="gn")(x)
        h = nn.silu(h)
        h = nn.Conv(self.ch, kernel_size=(3,), padding="SAME", name="c1")(h)
        h = h + nn.Dense(self.ch, name="cproj")(cond)[:, None, :]
        h = nn.silu(h)
        h = nn.Conv(self.ch, kernel_size=(3,), padding="SAME", name="c2")(h)
        skip = (x if x.shape[-1] == self.ch
                else nn.Conv(self.ch, kernel_size=(1,), name="cs")(x))
        return skip + h


class LatentDenoiserUNet(nn.Module):
    """1-D conv UNet over the latent viewed as (tokens, channels).

    The 256-d latent is reshaped to a (32, 8) signal, run through a 2-level
    down/up conv UNet with time/class conditioning, and flattened back.
    Small by design — the 'sequence' is a few dozen tokens (SURVEY.md s5.7).
    """

    cfg: DenoiserConfig = DenoiserConfig()
    tokens: int = 32

    @nn.compact
    def __call__(self, z_t: jnp.ndarray, t: jnp.ndarray,
                 class_id: Optional[jnp.ndarray] = None,
                 partial_embed: Optional[jnp.ndarray] = None,
                 cond_drop: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = self.cfg
        B = z_t.shape[0]
        ch0 = c.latent_size // self.tokens
        base = max(32, c.hidden_dim // 8)
        cond = TimeCondEmbed(c, name="cond")(t, class_id, partial_embed,
                                             cond_drop)
        x = z_t.reshape(B, self.tokens, ch0)
        x = nn.Conv(base, kernel_size=(3,), padding="SAME", name="stem")(x)
        d1 = ConvBlock1D(base, name="down1")(x, cond)
        x = nn.avg_pool(d1, window_shape=(2,), strides=(2,))
        d2 = ConvBlock1D(base * 2, name="down2")(x, cond)
        x = nn.avg_pool(d2, window_shape=(2,), strides=(2,))
        x = ConvBlock1D(base * 4, name="mid")(x, cond)
        x = jax.image.resize(x, (B, x.shape[1] * 2, x.shape[2]), "nearest")
        x = ConvBlock1D(base * 2, name="up2")(
            jnp.concatenate([x, d2], axis=-1), cond)
        x = jax.image.resize(x, (B, x.shape[1] * 2, x.shape[2]), "nearest")
        x = ConvBlock1D(base, name="up1")(
            jnp.concatenate([x, d1], axis=-1), cond)
        x = nn.Conv(ch0, kernel_size=(3,), padding="SAME", name="head",
                    kernel_init=nn.initializers.zeros)(x)
        return x.reshape(B, c.latent_size)


class CondDenoiser(nn.Module):
    """Denoiser body + (optional) jointly-trained partial-SDF encoder.

    The training/sampling entry point: raw observations go in, the encoder
    (when enabled) produces the conditioning embedding, the body predicts
    epsilon. One parameter tree for checkpointing.
    """

    cfg: DenoiserConfig = DenoiserConfig()

    @nn.compact
    def __call__(self, z_t: jnp.ndarray, t: jnp.ndarray,
                 class_id: Optional[jnp.ndarray] = None,
                 obs_xyz: Optional[jnp.ndarray] = None,
                 obs_sdf: Optional[jnp.ndarray] = None,
                 obs_mask: Optional[jnp.ndarray] = None,
                 cond_drop: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = self.cfg
        partial_embed = None
        if c.partial_sdf_cond and obs_xyz is not None:
            partial_embed = PartialSdfEncoder(name="partial_enc")(
                obs_xyz, obs_sdf, obs_mask)
            if cond_drop is not None:
                partial_embed = jnp.where(cond_drop[..., None], 0.0,
                                          partial_embed)
        body_cls = {"mlp": LatentDenoiserMLP,
                    "unet": LatentDenoiserUNet}[c.arch]
        return body_cls(c, name="body")(z_t, t, class_id=class_id,
                                        partial_embed=partial_embed,
                                        cond_drop=cond_drop)


def make_denoiser(cfg: DenoiserConfig) -> nn.Module:
    if cfg.arch == "mlp":
        return LatentDenoiserMLP(cfg)
    if cfg.arch == "unet":
        return LatentDenoiserUNet(cfg)
    raise ValueError(f"unknown denoiser arch {cfg.arch!r}")
