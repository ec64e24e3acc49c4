"""Decoder architecture + torch forward parity (SEMANTICS.md section 4).

The torch reference here is built from the canonical DeepSDF layer plan
(8 hidden x 512, skip re-concat at layer 4, weight_norm dim=0) — weights are
copied from the JAX params, so any mismatch in plan, weight-norm math, or
activation placement fails the allclose.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from latent_diffusion_models_for_shape_sdfs_tpu.config import DecoderConfig
from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import SdfDecoder


def build_torch_decoder(cfg: DecoderConfig, params: dict):
    d_in = cfg.latent_size + 3
    dims = [d_in] + [cfg.hidden_dim] * cfg.num_layers + [1]
    n_lin = len(dims) - 1
    layers = []
    for layer in range(len(dims) - 1):
        out = dims[layer + 1]
        if (layer + 1) in cfg.latent_in:
            out -= dims[0]
        elif cfg.xyz_in_all and layer != n_lin - 1:
            out -= 3
        # canonical plan: a latent_in layer's input is (shrunk prev output
        # + re-concat of d_in) == dims[layer]; the declared width is always
        # dims[layer].
        lin = torch.nn.Linear(dims[layer], out)
        if cfg.weight_norm:
            lin = torch.nn.utils.weight_norm(lin, dim=0)
        p = params[f"lin{layer}"]
        with torch.no_grad():
            if cfg.weight_norm:
                lin.weight_v.copy_(torch.as_tensor(np.asarray(p["v"]).T))
                lin.weight_g.copy_(
                    torch.as_tensor(np.asarray(p["g"])[:, None]))
            else:
                lin.weight.copy_(torch.as_tensor(np.asarray(p["v"]).T))
            lin.bias.copy_(torch.as_tensor(np.asarray(p["b"])))
        layers.append(lin)

    def forward(z, xyz):
        inp = torch.cat([z, xyz], dim=-1)
        x = inp
        for layer, lin in enumerate(layers):
            if layer in cfg.latent_in:
                x = torch.cat([x, inp], dim=-1)
            elif cfg.xyz_in_all and layer != 0:
                x = torch.cat([x, xyz], dim=-1)
            x = lin(x)
            if layer < len(layers) - 1:
                x = torch.relu(x)
        if cfg.use_tanh:
            x = torch.tanh(x)
        return x[..., 0]

    return forward


def test_layer_plan_canonical_shapes():
    cfg = DecoderConfig()  # 256 latent, 8x512, skip at 4
    dec = SdfDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(0))
    assert sorted(params.keys()) == [f"lin{i}" for i in range(9)]
    assert params["lin0"]["v"].shape == (259, 512)
    assert params["lin3"]["v"].shape == (512, 253)   # 512 - 259 skip shrink
    assert params["lin4"]["v"].shape == (512, 512)   # 253 + 259 concat in
    assert params["lin8"]["v"].shape == (512, 1)


def test_forward_matches_torch_small():
    cfg = DecoderConfig(latent_size=12, hidden_dim=32, num_layers=4,
                        latent_in=(2,), use_dropout=False)
    dec = SdfDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    z = rng.normal(size=(64, 12)).astype(np.float32)
    xyz = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    ours = np.asarray(dec.apply({"params": params}, jnp.asarray(z),
                                jnp.asarray(xyz), train=False))
    ref = build_torch_decoder(cfg, params)(
        torch.as_tensor(z), torch.as_tensor(xyz)).detach().numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_forward_matches_torch_canonical():
    cfg = DecoderConfig(use_dropout=False)
    dec = SdfDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(2))
    rng = np.random.default_rng(1)
    z = (rng.normal(size=(16, 256)) / 16).astype(np.float32)
    xyz = rng.uniform(-1, 1, size=(16, 3)).astype(np.float32)
    ours = np.asarray(dec.apply({"params": params}, jnp.asarray(z),
                                jnp.asarray(xyz), train=False))
    ref = build_torch_decoder(cfg, params)(
        torch.as_tensor(z), torch.as_tensor(xyz)).detach().numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_xyz_in_all_matches_torch():
    cfg = DecoderConfig(latent_size=12, hidden_dim=32, num_layers=4,
                        latent_in=(2,), xyz_in_all=True, use_dropout=False)
    dec = SdfDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(5))
    rng = np.random.default_rng(4)
    z = rng.normal(size=(32, 12)).astype(np.float32)
    xyz = rng.uniform(-1, 1, size=(32, 3)).astype(np.float32)
    ours = np.asarray(dec.apply({"params": params}, jnp.asarray(z),
                                jnp.asarray(xyz), train=False))
    ref = build_torch_decoder(cfg, params)(
        torch.as_tensor(z), torch.as_tensor(xyz)).detach().numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_latent_dropout_option():
    cfg = DecoderConfig(latent_size=8, hidden_dim=16, num_layers=2,
                        latent_in=(), latent_dropout=True,
                        use_dropout=False)
    dec = SdfDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(6))
    z = jnp.ones((64, 8)) * 0.5
    xyz = jnp.ones((64, 3)) * 0.1
    a = dec.apply({"params": params}, z, xyz, train=True,
                  rngs={"dropout": jax.random.PRNGKey(0)})
    b = dec.apply({"params": params}, z, xyz, train=True,
                  rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(a), np.asarray(b))
    c1 = dec.apply({"params": params}, z, xyz, train=False)
    c2 = dec.apply({"params": params}, z, xyz, train=False)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_initial_effective_weight_equals_raw_init():
    """torch weight_norm contract: g init = ||v||cols so W_eff == v."""
    from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import (
        effective_weight)
    cfg = DecoderConfig(latent_size=8, hidden_dim=16, num_layers=2,
                        latent_in=())
    params = SdfDecoder(cfg).init_params(jax.random.PRNGKey(3))
    for name, p in params.items():
        w = np.asarray(effective_weight(p["v"], p["g"]))
        np.testing.assert_allclose(w, np.asarray(p["v"]), rtol=1e-6,
                                   atol=1e-7, err_msg=name)


def test_dropout_active_only_in_train_mode():
    cfg = DecoderConfig(latent_size=8, hidden_dim=16, num_layers=2,
                        latent_in=(), dropout_prob=0.5, use_dropout=True)
    dec = SdfDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(4))
    z = jnp.ones((128, 8))
    xyz = jnp.ones((128, 3)) * 0.1
    a = dec.apply({"params": params}, z, xyz, train=False)
    b = dec.apply({"params": params}, z, xyz, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = dec.apply({"params": params}, z, xyz, train=True,
                  rngs={"dropout": jax.random.PRNGKey(0)})
    d = dec.apply({"params": params}, z, xyz, train=True,
                  rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(c), np.asarray(d))
