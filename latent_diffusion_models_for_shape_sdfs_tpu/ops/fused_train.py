"""Fused Pallas training kernel: gather-free scene-tiled fwd + clamped-L1
+ full backward in ONE kernel pass (SURVEY.md s2.2 `kernels/fused_mlp`,
the build plan's hardest milestone).

Per grid step (scene s, point-chunk c) the kernel:
  1. runs the 9-layer weight-norm-folded MLP forward for a [T]-point tile,
     keeping every activation in VMEM (zero HBM activation traffic —
     the XLA autodiff path writes/reads ~18 GB of activations per
     canonical step);
  2. applies the clamped-L1 loss in-kernel and accumulates the loss sum;
  3. back-propagates through all layers, accumulating dW/db into
     VMEM-resident f32 accumulators (constant-index outputs) and the
     per-scene latent gradient row dz[s].

Optional dropout uses the TPU hardware PRNG; the relu(+dropout) backward
mask is recovered from the stored post-activation (h > 0 iff pre > 0 and
kept), so no mask storage or regeneration is needed.

Integration: `make_pallas_ad_loss_grads` returns a drop-in replacement for
`jax.value_and_grad(loss_fn, argnums=(0, 1))` in train/auto_decoder; the
weight-norm fold and the latent-table scatter stay in XLA (tiny, and XLA's
VJP of the fold is exact). Parity-tested against the XLA path in
tests/test_fused_train.py. Enable with AdConfig.use_pallas.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from latent_diffusion_models_for_shape_sdfs_tpu.config import AdConfig
from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import (
    SdfDecoder, effective_weight)


def _on_cpu() -> bool:
    return jax.devices()[0].platform == "cpu"


def _plan(decoder: SdfDecoder):
    """[(takes_skip, out_dim)] per linear layer + static dims."""
    cfg = decoder.cfg
    return decoder.layer_dims(), cfg.latent_size, cfg.hidden_dim


def _build_train_kernel(decoder: SdfDecoder, T: int, S: int, nchunks: int,
                        clamp_dist: float, inv_n: float, rate: float):
    """Kernel refs, in order:
       seed (SMEM), z [S,L], xyzT tile [1,8,T], sdf tile [1,1,T],
       per layer: [w_h?], [w_z?], [w_x?], b row [1,H]
       outputs: loss [1,1] (SMEM), dz [S,L],
                per layer: [dw_h?], [dw_z?], [dw_x?], db [1,H]
    """
    plan, L, H = _plan(decoder)
    n_layers = len(plan)
    use_dropout = rate > 0.0

    def kernel(*refs):
        seed_ref = refs[0]
        z_ref = refs[1]
        xyz_ref = refs[2]
        sdf_ref = refs[3]
        r = 4
        w_refs = []
        for (_, _, takes_skip), layer in zip(plan, range(n_layers)):
            entry = {}
            if layer > 0:
                entry["w_h"] = refs[r]
                r += 1
            if layer == 0 or takes_skip:
                entry["w_z"] = refs[r]
                entry["w_x"] = refs[r + 1]
                r += 2
            entry["b"] = refs[r]
            r += 1
            w_refs.append(entry)
        loss_ref = refs[r]
        dz_ref = refs[r + 1]
        r += 2
        g_refs = []
        for layer, entry in enumerate(w_refs):
            gentry = {}
            for kname in ("w_h", "w_z", "w_x"):
                if kname in entry:
                    gentry[kname] = refs[r]
                    r += 1
            gentry["b"] = refs[r]
            r += 1
            g_refs.append(gentry)

        s = pl.program_id(0)
        c = pl.program_id(1)
        is_first = jnp.logical_and(s == 0, c == 0)

        @pl.when(is_first)
        def _init():
            loss_ref[0, 0] = 0.0
            for gentry in g_refs:
                for ref in gentry.values():
                    ref[...] = jnp.zeros_like(ref)

        # dz block is revisited for all chunks of scene s: zero at c == 0
        @pl.when(c == 0)
        def _init_dz():
            dz_ref[...] = jnp.zeros_like(dz_ref)

        if use_dropout:
            pltpu.prng_seed(seed_ref[0], s * nchunks + c)

        zrow = z_ref[0]                                # [1, L] f32
        zb = zrow.astype(jnp.bfloat16)
        xyzT = xyz_ref[0].astype(jnp.bfloat16)         # [8, T]
        gt = sdf_ref[0]                                # [T, 1] f32

        # ---------- forward, activations kept in VMEM
        acts = []            # post-activation h per hidden layer (bf16)
        h = None
        for layer, entry in enumerate(w_refs):
            acc = entry["b"][...]                      # [1, H] f32
            if "w_z" in entry:
                acc = acc + jnp.dot(zb, entry["w_z"][...],
                                    preferred_element_type=jnp.float32)
                acc = acc + jax.lax.dot_general(
                    xyzT, entry["w_x"][...], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if "w_h" in entry:
                acc = acc + jnp.dot(h, entry["w_h"][...],
                                    preferred_element_type=jnp.float32)
            if layer < n_layers - 1:
                hpre = jnp.maximum(acc, 0.0)
                if use_dropout:
                    bits = pltpu.bitcast(
                        pltpu.prng_random_bits(hpre.shape), jnp.uint32)
                    thresh = jnp.uint32(
                        min(int(rate * (1 << 32)), (1 << 32) - 1))
                    keep = bits >= thresh
                    hpre = jnp.where(keep, hpre / (1.0 - rate), 0.0)
                h = hpre.astype(jnp.bfloat16)
                acts.append(h)
            else:
                pred = acc                             # [T, 1] f32

        # ---------- clamped-L1 loss + dpred (SEMANTICS.md s1)
        pc = jnp.clip(pred, -clamp_dist, clamp_dist)
        gc = jnp.clip(gt, -clamp_dist, clamp_dist)
        diff = pc - gc
        loss_ref[0, 0] += jnp.sum(jnp.abs(diff)) * inv_n
        inside = jnp.abs(pred) < clamp_dist
        dpred = jnp.where(inside, jnp.sign(diff) * inv_n, 0.0)  # [T, 1]

        # ---------- backward
        g = dpred.astype(jnp.bfloat16)                 # [T, 1]
        for layer in range(n_layers - 1, -1, -1):
            entry = w_refs[layer]
            gentry = g_refs[layer]
            inp = acts[layer - 1] if layer > 0 else None  # [T, H_in] bf16
            # parameter grads
            if "w_h" in entry:
                gentry["w_h"][...] += jax.lax.dot_general(
                    inp, g, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if "w_z" in entry:
                # z is one broadcast row: dW_z = z^T (sum_t g_t),
                # dz[s] += (sum_t g_t) W_z^T — both via the row-sum of g.
                gsum = jnp.sum(g.astype(jnp.float32), axis=0,
                               keepdims=True)            # [1, H]
                gentry["w_z"][...] += jax.lax.dot_general(
                    zrow, gsum, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [L, H]
                gentry["w_x"][...] += jax.lax.dot_general(
                    xyzT, g, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dz_row = jax.lax.dot_general(
                    gsum.astype(jnp.bfloat16), entry["w_z"][...],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [1, L]
                dz_ref[...] += dz_row[None]
            gentry["b"][...] += jnp.sum(g.astype(jnp.float32), axis=0,
                                        keepdims=True)
            if layer == 0:
                break
            # input grad (every layer > 0 has a hidden input)
            gh = jax.lax.dot_general(
                g, entry["w_h"][...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [T, H_in]
            # relu(+dropout) mask recovered from the post-activation
            hprev = acts[layer - 1]
            mask = hprev.astype(jnp.float32) > 0
            scale = 1.0 / (1.0 - rate) if use_dropout else 1.0
            g = jnp.where(mask, gh * scale, 0.0).astype(jnp.bfloat16)

    return kernel


def _fold_weights(decoder: SdfDecoder, params: dict):
    """Folded (effective) weights as the kernel's flat input list + specs
    metadata. Returns (inputs, layout) where layout mirrors the plan."""
    plan, L, H = _plan(decoder)
    cfg = decoder.cfg
    inputs = []
    layout = []
    for layer, (_, out, takes_skip) in enumerate(plan):
        p = params[f"lin{layer}"]
        w = (effective_weight(p["v"], p["g"]) if cfg.weight_norm
             else p["v"]).astype(jnp.bfloat16)
        entry = {}
        if layer == 0:
            entry["w_z"] = w[:L]
            entry["w_x"] = jnp.pad(w[L:L + 3], ((0, 5), (0, 0)))
        elif takes_skip:
            hprev = w.shape[0] - (L + 3)
            entry["w_h"] = w[:hprev]
            entry["w_z"] = w[hprev:hprev + L]
            entry["w_x"] = jnp.pad(w[hprev + L:], ((0, 5), (0, 0)))
        else:
            entry["w_h"] = w
        entry["b"] = p["b"][None, :].astype(jnp.float32)
        for k in ("w_h", "w_z", "w_x", "b"):
            if k in entry:
                inputs.append(entry[k])
        layout.append(tuple(k for k in ("w_h", "w_z", "w_x", "b")
                            if k in entry))
    return inputs, layout


def fused_train_loss_grads(decoder: SdfDecoder, params: dict,
                           z_scenes: jnp.ndarray, xyz: jnp.ndarray,
                           sdf: jnp.ndarray, num_sdf_samples: int,
                           clamp_dist: float, dropout_rate: float,
                           seed: jnp.ndarray, tile: int = 256):
    """One fused fwd+loss+bwd pass over [S, P] points.

    Returns (loss_l1, dz [S,L], grads_folded: {lin{i}: {w: [in,out], b}}).
    Gradients are w.r.t. the FOLDED weights; the caller chains through the
    weight-norm fold with jax.vjp (exact, tiny).
    """
    S, P, _ = xyz.shape
    assert P % tile == 0, f"samples_per_scene {P} % tile {tile} != 0"
    nchunks = P // tile
    plan, L, H = _plan(decoder)

    # transposed, padded point feed (see pallas_kernels docstring)
    xyzT = jnp.zeros((S, 8, P), jnp.float32)
    xyzT = xyzT.at[:, :3, :].set(jnp.swapaxes(xyz, 1, 2))
    sdf3 = sdf[:, :, None].astype(jnp.float32)  # [S, P, 1] column feed

    w_inputs, layout = _fold_weights(decoder, params)
    kernel = _build_train_kernel(decoder, tile, S, nchunks, clamp_dist,
                                 1.0 / num_sdf_samples, dropout_rate)

    full = lambda shape: pl.BlockSpec(shape, lambda s, c: (0, 0),
                                      memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # seed
        pl.BlockSpec((1, 1, L), lambda s, c: (s, 0, 0),
                     memory_space=pltpu.VMEM),                 # z row
        pl.BlockSpec((1, 8, tile), lambda s, c: (s, 0, c),
                     memory_space=pltpu.VMEM),                 # xyzT tile
        pl.BlockSpec((1, tile, 1), lambda s, c: (s, c, 0),
                     memory_space=pltpu.VMEM),                 # sdf tile
    ] + [full(w.shape) for w in w_inputs]

    out_shapes = [jax.ShapeDtypeStruct((1, 1), jnp.float32),   # loss
                  jax.ShapeDtypeStruct((S, 1, L), jnp.float32)]  # dz rows
    out_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                 pl.BlockSpec((1, 1, L), lambda s, c: (s, 0, 0),
                              memory_space=pltpu.VMEM)]
    grad_slots = []
    wi = 0
    for lay in layout:
        for k in lay:
            shape = w_inputs[wi].shape
            out_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))
            out_specs.append(full(shape))
            grad_slots.append(k)
            wi += 1

    outs = pl.pallas_call(
        kernel,
        grid=(S, nchunks),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=_on_cpu(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(seed.reshape(1), z_scenes[:, None, :], xyzT, sdf3, *w_inputs)

    loss = outs[0][0, 0]
    dz = outs[1][:, 0, :]
    grads_folded = {}
    gi = 2
    for layer, lay in enumerate(layout):
        entry = {}
        for k in lay:
            entry[k] = outs[gi]
            gi += 1
        grads_folded[f"lin{layer}"] = entry
    return loss, dz, grads_folded


def make_pallas_ad_loss_grads(decoder: SdfDecoder, cfg: AdConfig,
                              reg_scene_count: int | None = None
                              ) -> Callable:
    """Drop-in for jax.value_and_grad(loss_fn, argnums=(0,1), has_aux=True)
    in train/auto_decoder.make_ad_train_step (the cfg.use_pallas path).

    `reg_scene_count`: scene count used to normalize the code-reg term.
    Defaults to the LOCAL batch (z.shape[0]) — correct single-device.
    Under shard_map data parallelism (parallel/dp.py) each shard sees
    scenes_per_batch/n scenes but partial sums are psum'd across shards,
    so the caller passes the GLOBAL cfg.scenes_per_batch here."""
    from latent_diffusion_models_for_shape_sdfs_tpu import losses
    from latent_diffusion_models_for_shape_sdfs_tpu.models.latent_table \
        import LatentTable, gather_codes

    assert cfg.code_bound in (0, 0.0), (
        "use_pallas path does not chain grads through max-norm projection")
    L = cfg.decoder.latent_size
    N = cfg.scenes_per_batch * cfg.samples_per_scene
    rate = (cfg.decoder.dropout_prob if cfg.decoder.use_dropout else 0.0)

    def value_and_grads(params, codes, scene_ids, xyz, sdf, epoch, key):
        z = gather_codes(LatentTable(codes), scene_ids, cfg.code_bound)
        seed = jax.random.key_data(key)[-1].astype(jnp.int32)

        # fold weights under vjp so dW chains to (v, g) exactly
        def fold(p):
            w_inputs, _ = _fold_weights(decoder, p)
            return tuple(w_inputs)

        # run the kernel on the folded weights of `params`
        l1, dz_rows, grads_folded = fused_train_loss_grads(
            decoder, params, z, xyz, sdf, N, cfg.clamp_dist, rate, seed)

        # chain folded-weight grads back through the weight-norm fold
        def refold_loss(p):
            w_inputs, layout = _fold_weights(decoder, p)
            acc = 0.0
            wi = 0
            for layer, lay in enumerate(layout):
                for k in lay:
                    g = grads_folded[f"lin{layer}"][k]
                    acc = acc + jnp.sum(
                        w_inputs[wi].astype(jnp.float32) * g)
                    wi += 1
            return acc

        g_params = jax.grad(refold_loss)(params)

        # latent grads: kernel rows scattered back + code_reg term
        def reg_fn(codes_):
            zr = gather_codes(LatentTable(codes_), scene_ids,
                              cfg.code_bound)
            return losses.code_reg(zr, epoch, cfg.code_reg_lambda,
                                   cfg.code_reg_warmup_epochs,
                                   num_sdf_samples=(reg_scene_count
                                                    or zr.shape[0]),
                                   squared=cfg.code_reg_squared)

        reg, g_codes_reg = jax.value_and_grad(reg_fn)(codes)
        g_codes = g_codes_reg + jnp.zeros_like(codes).at[scene_ids].add(
            dz_rows)
        loss = l1 + reg
        aux = {"loss_l1": l1, "loss_reg": reg}
        return (loss, aux), (g_params, g_codes)

    return value_and_grads
