"""Oracle tests: weight-norm linear, embedding-gather grads, and the dual
Adam trajectory vs torch CPU (SEMANTICS.md sections 3-5, SURVEY.md s4.1)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
import torch


@pytest.fixture(autouse=True)
def _highest_matmul_precision():
    """TPU's default fp32 matmul is multi-pass reduced precision; these
    oracle tests compare against torch-CPU true fp32, so pin HIGHEST — but
    only for this module: the global setting leaks into later tests'
    Pallas lowering (Mosaic rejects HIGHEST bf16 dots) if left set."""
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)

from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import (
    effective_weight,
)


def test_weight_norm_effective_weight_matches_torch():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(37, 11)).astype(np.float32)  # [in, out]
    g = rng.uniform(0.5, 2.0, size=(11,)).astype(np.float32)
    ours = np.asarray(effective_weight(jnp.asarray(v), jnp.asarray(g)))

    lin = torch.nn.Linear(37, 11, bias=False)
    lin = torch.nn.utils.weight_norm(lin, dim=0)
    with torch.no_grad():
        lin.weight_v.copy_(torch.as_tensor(v.T))
        lin.weight_g.copy_(torch.as_tensor(g[:, None]))
    x = rng.normal(size=(5, 37)).astype(np.float32)
    ref = lin(torch.as_tensor(x)).detach().numpy()
    np.testing.assert_allclose(x @ ours, ref, rtol=1e-5, atol=1e-6)


def test_embedding_gather_grad_is_dense_scatter():
    """d/dtable of sum(f(table[ids])) is a dense array with zero rows for
    untouched ids and accumulated rows for repeated ids — torch parity."""
    rng = np.random.default_rng(1)
    table = rng.normal(size=(7, 4)).astype(np.float32)
    ids = np.array([1, 3, 3, 5], np.int32)
    w = rng.normal(size=(4,)).astype(np.float32)

    def loss_jax(tbl):
        return jnp.sum(jnp.sin(tbl[ids] @ w))

    g_jax = np.asarray(jax.grad(loss_jax)(jnp.asarray(table)))

    emb = torch.nn.Embedding(7, 4)
    with torch.no_grad():
        emb.weight.copy_(torch.as_tensor(table))
    out = torch.sum(torch.sin(emb(torch.as_tensor(ids.astype(np.int64)))
                              @ torch.as_tensor(w)))
    out.backward()
    g_ref = emb.weight.grad.numpy()
    np.testing.assert_allclose(g_jax, g_ref, rtol=1e-5, atol=1e-6)
    assert np.all(g_jax[[0, 2, 4, 6]] == 0.0)  # untouched rows exactly zero


def test_dual_adam_trajectory_matches_torch():
    """10 steps of the joint (embedding + weight-norm linear) system under
    two Adam groups with different LRs: parameters must track torch to fp32
    tolerance. This exercises the full bit-for-bit update semantics chain."""
    rng = np.random.default_rng(2)
    N, L, steps = 5, 8, 10
    table0 = (rng.normal(size=(N, L)) / np.sqrt(L)).astype(np.float32)
    v0 = rng.normal(size=(L + 3, 1)).astype(np.float32) * 0.3
    g0 = np.linalg.norm(v0, axis=0).astype(np.float32)
    b0 = np.zeros((1,), np.float32)
    ids = np.array([0, 2, 2, 4], np.int32)
    xyz = rng.normal(size=(4, 3)).astype(np.float32)
    sdf_gt = rng.normal(0, 0.05, size=(4,)).astype(np.float32)
    delta, lam, lr_dec, lr_lat = 0.1, 1e-2, 5e-3, 1e-2

    # ---- torch reference
    emb = torch.nn.Embedding(N, L)
    lin = torch.nn.utils.weight_norm(torch.nn.Linear(L + 3, 1), dim=0)
    with torch.no_grad():
        emb.weight.copy_(torch.as_tensor(table0))
        lin.weight_v.copy_(torch.as_tensor(v0.T))
        lin.weight_g.copy_(torch.as_tensor(g0[:, None]))
        lin.bias.copy_(torch.as_tensor(b0))
    opt_dec = torch.optim.Adam(lin.parameters(), lr=lr_dec)
    opt_lat = torch.optim.Adam(emb.parameters(), lr=lr_lat)
    tids = torch.as_tensor(ids.astype(np.int64))
    txyz = torch.as_tensor(xyz)
    tgt = torch.clamp(torch.as_tensor(sdf_gt), -delta, delta)
    for _ in range(steps):
        opt_dec.zero_grad()
        opt_lat.zero_grad()
        z = emb(tids)
        pred = lin(torch.cat([z, txyz], dim=1))[:, 0]
        l1 = torch.nn.L1Loss(reduction="sum")(
            torch.clamp(pred, -delta, delta), tgt) / 4
        reg = lam * torch.sum(torch.norm(z, dim=1)) / 4
        (l1 + reg).backward()
        opt_dec.step()
        opt_lat.step()

    # ---- JAX implementation (same arithmetic, optax scale_by_adam)
    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    params = {"v": jnp.asarray(v0), "g": jnp.asarray(g0),
              "b": jnp.asarray(b0)}
    codes = jnp.asarray(table0)
    o_dec = adam.init(params)
    o_lat = adam.init(codes)

    def loss_fn(p, c):
        z = c[ids]
        w = effective_weight(p["v"], p["g"])
        pred = (jnp.concatenate([z, jnp.asarray(xyz)], axis=1) @ w
                + p["b"])[:, 0]
        l1 = jnp.sum(jnp.abs(jnp.clip(pred, -delta, delta)
                             - jnp.clip(jnp.asarray(sdf_gt), -delta, delta))
                     ) / 4
        reg = lam * jnp.sum(jnp.linalg.norm(z, axis=1)) / 4
        return l1 + reg

    grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    for _ in range(steps):
        gd, gl = grad_fn(params, codes)
        ud, o_dec = adam.update(gd, o_dec)
        ul, o_lat = adam.update(gl, o_lat)
        params = jax.tree.map(lambda p, u: p - lr_dec * u, params, ud)
        codes = codes - lr_lat * ul

    # Tolerances absorb 10 steps of accumulated fp32 rounding differences
    # between TPU and CPU (rsqrt/div orderings), ~1e-5 absolute — any
    # *semantic* divergence (wrong lr group, biased correction, wrong grad)
    # shows up orders of magnitude larger.
    w_torch = (lin.weight_g * lin.weight_v
               / lin.weight_v.norm(dim=1, keepdim=True)).detach().numpy()
    w_ours = np.asarray(effective_weight(params["v"], params["g"])).T
    np.testing.assert_allclose(w_ours, w_torch, rtol=2e-3, atol=3e-5)
    np.testing.assert_allclose(np.asarray(codes), emb.weight.detach().numpy(),
                               rtol=2e-3, atol=3e-5)
