"""Numerics-oracle tests: loss semantics vs a torch-CPU reference.

SEMANTICS.md sections 1-2 pin clamp-each-then-subtract, sum-reduce /
num_sdf_samples, and the norm-not-squared code regularizer with its epoch
warm-up ramp. torch (CPU) implements the lineage arithmetic directly; the
JAX implementations must match to fp32 tolerance on random inputs.
"""

import numpy as np
import jax.numpy as jnp
import torch

from latent_diffusion_models_for_shape_sdfs_tpu import losses


def torch_clamped_l1(pred, gt, delta, n):
    p = torch.clamp(torch.as_tensor(pred), -delta, delta)
    g = torch.clamp(torch.as_tensor(gt), -delta, delta)
    return (torch.nn.L1Loss(reduction="sum")(p, g) / n).item()


def test_clamped_l1_matches_torch():
    rng = np.random.default_rng(0)
    for delta in (0.1, 0.05, 1.0):
        pred = rng.normal(0, 0.3, size=4096).astype(np.float32)
        gt = rng.normal(0, 0.3, size=4096).astype(np.float32)
        n = pred.size
        ours = float(losses.clamped_l1(jnp.asarray(pred), jnp.asarray(gt),
                                       delta, n))
        ref = torch_clamped_l1(pred, gt, delta, n)
        assert abs(ours - ref) < 1e-6 * max(1.0, abs(ref))


def test_clamped_l1_clamp_before_subtract():
    # pred=0.3, gt=-0.3, delta=0.1: clamp-then-diff = |0.1-(-0.1)| = 0.2;
    # diff-then-clamp would give clamp(0.6)=0.1. Distinguishes the orders.
    ours = float(losses.clamped_l1(jnp.asarray([0.3]), jnp.asarray([-0.3]),
                                   0.1, 1))
    assert abs(ours - 0.2) < 1e-7


def test_clamped_l1_sum_reduction_not_mean():
    # Dividing by an explicit n different from the element count proves the
    # reduction is sum/n, not mean.
    pred = jnp.asarray([0.05, 0.05])
    gt = jnp.asarray([0.0, 0.0])
    assert abs(float(losses.clamped_l1(pred, gt, 0.1, 4)) - 0.025) < 1e-7


def test_code_reg_matches_torch_norm_form():
    rng = np.random.default_rng(1)
    z = rng.normal(size=(64, 256)).astype(np.float32)
    lam, warmup, n = 1e-4, 100, 64 * 16384
    for epoch in (0, 1, 50, 100, 5000):
        ours = float(losses.code_reg(jnp.asarray(z), epoch, lam, warmup, n))
        zt = torch.as_tensor(z)
        ref = (lam * min(1.0, epoch / warmup)
               * torch.sum(torch.norm(zt, dim=1)) / n).item()
        assert abs(ours - ref) < 1e-9 + 1e-5 * abs(ref)


def test_code_reg_squared_form():
    z = np.full((4, 16), 0.5, np.float32)
    ours = float(losses.code_reg(jnp.asarray(z), 200, 1e-4, 100, 10,
                                 squared=True))
    ref = 1e-4 * 1.0 * 4 * (16 * 0.25) / 10
    assert abs(ours - ref) < 1e-9


def test_code_reg_warmup_ramp():
    z = np.ones((1, 4), np.float32)
    at_10 = float(losses.code_reg(jnp.asarray(z), 10, 1.0, 100, 1))
    at_100 = float(losses.code_reg(jnp.asarray(z), 100, 1.0, 100, 1))
    at_200 = float(losses.code_reg(jnp.asarray(z), 200, 1.0, 100, 1))
    assert abs(at_10 / at_100 - 0.1) < 1e-6
    assert at_100 == at_200  # ramp saturates at 1
