"""Loss functions with pinned bit-for-bit semantics (SEMANTICS.md sections 1-2).

Clamp-each-operand-then-subtract, sum-reduce, divide by the batch's total
sample count — the exact reduction order of the DeepSDF lineage
(`L1Loss(reduction="sum") / num_sdf_samples`). Oracle-tested against a
torch-CPU implementation in tests/test_loss_oracle.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def clamped_l1(pred_sdf: jnp.ndarray, gt_sdf: jnp.ndarray, clamp_dist: float = 0.1,
               num_sdf_samples: int | None = None) -> jnp.ndarray:
    """Sum_i |clamp(pred_i, +-d) - clamp(gt_i, +-d)| / num_sdf_samples.

    Both operands are clamped *before* the subtraction. fp32 accumulation.
    `num_sdf_samples` defaults to the total element count of `pred_sdf`.
    """
    pred = jnp.clip(pred_sdf.astype(jnp.float32), -clamp_dist, clamp_dist)
    gt = jnp.clip(gt_sdf.astype(jnp.float32), -clamp_dist, clamp_dist)
    n = pred.size if num_sdf_samples is None else num_sdf_samples
    return jnp.sum(jnp.abs(pred - gt)) / n


def code_reg(batch_codes: jnp.ndarray, epoch: jnp.ndarray | int,
             code_reg_lambda: float = 1e-4, warmup_epochs: int = 100,
             num_sdf_samples: int = 1, squared: bool = False) -> jnp.ndarray:
    """lambda * min(1, epoch/warmup) * sum_i ||z_i|| / num_sdf_samples.

    `batch_codes` is the (rows, latent) matrix of *gathered* codes for this
    step. Default is the lineage-code form (sum of L2 norms); `squared=True`
    switches to the paper form (sum of squared norms).
    """
    z = batch_codes.astype(jnp.float32)
    sq = jnp.sum(z * z, axis=-1)
    size_loss = jnp.sum(sq) if squared else jnp.sum(jnp.sqrt(sq))
    ramp = jnp.minimum(1.0, jnp.asarray(epoch, jnp.float32) / warmup_epochs)
    return code_reg_lambda * ramp * size_loss / num_sdf_samples


def eps_mse(eps: jnp.ndarray, eps_hat: jnp.ndarray) -> jnp.ndarray:
    """Diffusion training loss: mean over batch and dims (SEMANTICS.md s6)."""
    d = eps_hat.astype(jnp.float32) - eps.astype(jnp.float32)
    return jnp.mean(d * d)
