"""TPU-native latent-diffusion-for-shape-SDFs framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
SGI-2022/Latent-Diffusion-Models-for-Shape-SDFs (a DeepSDF-style
auto-decoder + latent DDPM pipeline; reference mount is title-only,
see /root/reference/README.md:1 and SURVEY.md for the capability spec).

Pipeline stages:
  1. auto-decoder training: per-shape latent table + 8x512 SDF MLP,
     clamped-L1 loss + code regularization (``train.auto_decoder``).
  2. latent diffusion: DDPM epsilon-MSE over normalized latent codes,
     fully on-device ``lax.scan`` training loop (``train.diffusion``).
  3. sampling: DDPM / DDIM-50 ancestral loops (``diffusion.sampler``),
     dense tiled SDF grid decode (``ops.grid_eval``), isosurface
     extraction (``ops.isosurface``), Chamfer eval (``evaluation``).

TPU-first design notes live in SEMANTICS.md (bit-for-bit loss/update
semantics) and SURVEY.md sections 5-7 (sharding, kernels, roofline).
"""

__version__ = "0.1.0"

from latent_diffusion_models_for_shape_sdfs_tpu import config as config  # noqa: F401
from latent_diffusion_models_for_shape_sdfs_tpu import losses as losses  # noqa: F401
