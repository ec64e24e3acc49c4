"""Fast-eval path parity: weight-norm folding + latent hoisting + dtype
casts must reproduce the exact flax decoder (SURVEY.md s4.3 pattern — every
optimized path has a plain reference oracle)."""

import numpy as np
import jax
import jax.numpy as jnp

from latent_diffusion_models_for_shape_sdfs_tpu.config import DecoderConfig
from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import SdfDecoder
from latent_diffusion_models_for_shape_sdfs_tpu.ops.fused_decoder import (
    make_fast_apply, make_reference_apply)
from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
    decode_grid, decode_grid_hierarchical)


def _setup(cfg, seed=0):
    dec = SdfDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    z = jnp.asarray((rng.normal(size=cfg.latent_size)
                     / np.sqrt(cfg.latent_size)).astype(np.float32))
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(512, 3)).astype(np.float32))
    return dec, params, z, xyz


def test_fp32_parity_small():
    cfg = DecoderConfig(latent_size=16, hidden_dim=32, num_layers=4,
                        latent_in=(2,), use_dropout=False)
    dec, params, z, xyz = _setup(cfg)
    ref = np.asarray(make_reference_apply(dec, params)(z, xyz))
    fast = np.asarray(make_fast_apply(dec, params, dtype=jnp.float32)(z, xyz))
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-5)


def test_fp32_parity_canonical():
    cfg = DecoderConfig(use_dropout=False)
    dec, params, z, xyz = _setup(cfg, seed=1)
    ref = np.asarray(make_reference_apply(dec, params)(z, xyz))
    fast = np.asarray(make_fast_apply(dec, params, dtype=jnp.float32)(z, xyz))
    np.testing.assert_allclose(fast, ref, rtol=1e-3, atol=1e-4)


def test_bf16_parity_tolerance():
    cfg = DecoderConfig(use_dropout=False)
    dec, params, z, xyz = _setup(cfg, seed=2)
    ref = np.asarray(make_reference_apply(dec, params)(z, xyz))
    fast = np.asarray(make_fast_apply(dec, params, dtype=jnp.bfloat16)(z, xyz))
    # bf16 hidden math: expect ~1e-2 absolute agreement on O(0.1) outputs
    assert np.max(np.abs(fast - ref)) < 3e-2
    assert np.mean(np.abs(fast - ref)) < 5e-3


def test_tanh_head_respected():
    cfg = DecoderConfig(latent_size=8, hidden_dim=16, num_layers=2,
                        latent_in=(), use_tanh=True, use_dropout=False)
    dec, params, z, xyz = _setup(cfg, seed=3)
    ref = np.asarray(make_reference_apply(dec, params)(z, xyz))
    fast = np.asarray(make_fast_apply(dec, params, dtype=jnp.float32)(z, xyz))
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-5)
    assert np.all(np.abs(fast) <= 1.0)


def test_fast_apply_through_grid_decode():
    cfg = DecoderConfig(latent_size=16, hidden_dim=32, num_layers=4,
                        latent_in=(2,), use_dropout=False)
    dec, params, z, _ = _setup(cfg, seed=4)
    ref_fn = make_reference_apply(dec, params)
    fast_fn = make_fast_apply(dec, params, dtype=jnp.float32)
    a = np.asarray(decode_grid(ref_fn, z, 17, chunk=1024))
    b = np.asarray(decode_grid(fast_fn, z, 17, chunk=1024))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)
    _, stats = decode_grid_hierarchical(fast_fn, z, 16, block=8)
    assert stats["coarse_evals"] == 8
