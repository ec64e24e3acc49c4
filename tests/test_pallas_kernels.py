"""Pallas kernel parity tests (SURVEY.md s4.3): every kernel against its
plain-XLA oracle, including ragged tails. Runs in interpreter mode on CPU
and compiled on TPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from latent_diffusion_models_for_shape_sdfs_tpu.config import DecoderConfig
from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import SdfDecoder
from latent_diffusion_models_for_shape_sdfs_tpu.ops.fused_decoder import (
    make_fast_apply, make_reference_apply)
from latent_diffusion_models_for_shape_sdfs_tpu.ops.pallas_kernels import (
    make_pallas_apply, relu_dropout)


def _setup(cfg, seed=0, n=700):
    dec = SdfDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    z = jnp.asarray((rng.normal(size=cfg.latent_size)
                     / np.sqrt(cfg.latent_size)).astype(np.float32))
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(n, 3)).astype(np.float32))
    return dec, params, z, xyz


def test_fused_eval_kernel_matches_bf16_oracle_small():
    cfg = DecoderConfig(latent_size=16, hidden_dim=128, num_layers=3,
                        latent_in=(2,), use_dropout=False)
    dec, params, z, xyz = _setup(cfg, n=700)  # ragged: 700 % tile != 0
    oracle = np.asarray(make_fast_apply(dec, params, jnp.bfloat16)(z, xyz))
    pk = np.asarray(make_pallas_apply(dec, params, tile=1024)(z, xyz))
    np.testing.assert_allclose(pk, oracle, atol=5e-3)


def test_fused_eval_kernel_canonical():
    cfg = DecoderConfig(use_dropout=False)
    dec, params, z, xyz = _setup(cfg, seed=1, n=2048 + 131)
    exact = np.asarray(make_reference_apply(dec, params)(z, xyz))
    pk = np.asarray(make_pallas_apply(dec, params, tile=1024)(z, xyz))
    # bf16 kernel vs exact fp32: same tolerance class as the XLA bf16 path
    assert np.max(np.abs(pk - exact)) < 3e-2
    assert np.mean(np.abs(pk - exact)) < 5e-3


def test_fused_eval_kernel_tanh():
    cfg = DecoderConfig(latent_size=8, hidden_dim=32, num_layers=2,
                        latent_in=(), use_tanh=True, use_dropout=False)
    dec, params, z, xyz = _setup(cfg, seed=2, n=300)
    oracle = np.asarray(make_fast_apply(dec, params, jnp.bfloat16)(z, xyz))
    pk = np.asarray(make_pallas_apply(dec, params, tile=1024)(z, xyz))
    np.testing.assert_allclose(pk, oracle, atol=5e-3)


def _setup_pairs(cfg, seed=0, n=700):
    dec = SdfDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    zr = jnp.asarray((rng.normal(size=(n, cfg.latent_size))
                      / np.sqrt(cfg.latent_size)).astype(np.float32))
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(n, 3)).astype(np.float32))
    return dec, params, zr, xyz


def test_pairs_eval_kernel_matches_bf16_oracle():
    """Per-point-latent kernel vs fast_apply broadcast over z rows —
    ragged tail included; the oracle broadcasts natively ([N,L],[N,3])."""
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.fused_decoder import (
        precompute_eval_weights, fast_apply)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.pallas_kernels import (
        make_pallas_apply_pairs)
    cfg = DecoderConfig(latent_size=16, hidden_dim=128, num_layers=3,
                        latent_in=(2,), use_dropout=False)
    dec, params, zr, xyz = _setup_pairs(cfg, n=700)
    ew = precompute_eval_weights(dec, params, jnp.bfloat16)
    oracle = np.asarray(fast_apply(ew, zr, xyz))
    pk = np.asarray(make_pallas_apply_pairs(dec, params, tile=1024)(zr, xyz))
    np.testing.assert_allclose(pk, oracle, atol=5e-3)


def test_pairs_eval_kernel_canonical_vs_exact():
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.pallas_kernels import (
        make_pallas_apply_pairs)
    cfg = DecoderConfig(use_dropout=False)
    dec, params, zr, xyz = _setup_pairs(cfg, seed=1, n=2048 + 131)
    # exact flax forward per point (per-point z rows ARE the contract)
    exact = np.asarray(dec.apply({"params": params}, zr, xyz, train=False))
    pk = np.asarray(make_pallas_apply_pairs(dec, params, tile=1024)(zr, xyz))
    assert np.max(np.abs(pk - exact)) < 3e-2
    assert np.mean(np.abs(pk - exact)) < 5e-3


def test_pairs_eval_kernel_matches_hoisted_kernel_same_z():
    """With every row equal to one latent, the pairs kernel and the
    hoisted single-shape kernel compute the same function (bf16 class)."""
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.pallas_kernels import (
        make_pallas_apply_pairs)
    cfg = DecoderConfig(latent_size=16, hidden_dim=128, num_layers=3,
                        latent_in=(2,), use_dropout=False)
    dec, params, z, xyz = _setup(cfg, seed=3, n=1500)
    hoisted = np.asarray(make_pallas_apply(dec, params, tile=1024)(z, xyz))
    zr = jnp.broadcast_to(z, (xyz.shape[0],) + z.shape)
    pk = np.asarray(make_pallas_apply_pairs(dec, params, tile=1024)(zr, xyz))
    np.testing.assert_allclose(pk, hoisted, atol=1e-2)


def test_relu_dropout_statistics_and_determinism():
    x = jnp.ones((4096, 512), jnp.float32) * 2.0
    seed = jnp.asarray(42, jnp.int32)
    y1 = np.asarray(relu_dropout(x, seed, 0.25))
    y2 = np.asarray(relu_dropout(x, seed, 0.25))
    np.testing.assert_array_equal(y1, y2)  # deterministic given seed
    kept = y1 != 0
    # inverted dropout: survivors scaled by 1/(1-p)
    np.testing.assert_allclose(y1[kept], 2.0 / 0.75, rtol=1e-5)
    assert abs(kept.mean() - 0.75) < 0.01
    y3 = np.asarray(relu_dropout(x, jnp.asarray(43, jnp.int32), 0.25))
    assert not np.array_equal(y1, y3)  # different seed, different mask


def test_relu_dropout_relu_semantics():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1024, 256)).astype(np.float32))
    y = np.asarray(relu_dropout(x, jnp.asarray(7, jnp.int32), 0.0))
    np.testing.assert_allclose(y, np.maximum(np.asarray(x), 0), rtol=1e-6)


def test_relu_dropout_grad_matches_mask():
    x = jnp.asarray(np.random.default_rng(1)
                    .normal(size=(512, 128)).astype(np.float32))
    seed = jnp.asarray(3, jnp.int32)
    rate = 0.3

    def f(x_):
        return jnp.sum(relu_dropout(x_, seed, rate) ** 2)

    g = np.asarray(jax.grad(f)(x))
    y = np.asarray(relu_dropout(x, seed, rate))
    # d/dx sum(y^2) = 2*y*scale on kept+positive entries, 0 elsewhere
    expect = 2.0 * y / (1.0 - rate)
    np.testing.assert_allclose(g, expect, rtol=1e-5, atol=1e-6)


def test_decoder_pallas_dropout_path_runs():
    cfg = DecoderConfig(latent_size=8, hidden_dim=128, num_layers=2,
                        latent_in=(), dropout_impl="pallas",
                        compute_dtype="float32")
    dec = SdfDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(0))
    z = jnp.ones((256, 8)) * 0.1
    xyz = jnp.ones((256, 3)) * 0.2
    a = dec.apply({"params": params}, z, xyz, train=True,
                  rngs={"dropout": jax.random.PRNGKey(0)})
    b = dec.apply({"params": params}, z, xyz, train=True,
                  rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = dec.apply({"params": params}, z, xyz, train=True,
                  rngs={"dropout": jax.random.PRNGKey(9)})
    assert not np.allclose(np.asarray(a), np.asarray(c))
    # eval mode: no dropout, matches the xla-impl decoder
    d1 = dec.apply({"params": params}, z, xyz, train=False)
    cfg2 = DecoderConfig(latent_size=8, hidden_dim=128, num_layers=2,
                         latent_in=(), dropout_impl="xla",
                         compute_dtype="float32")
    d2 = SdfDecoder(cfg2).apply({"params": params}, z, xyz, train=False)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)
