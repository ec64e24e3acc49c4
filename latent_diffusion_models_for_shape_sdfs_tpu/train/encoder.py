"""Amortized-encoder training: regress the frozen stage-1 latent table.

Distillation setup (capability extension over the lineage's
optimization-only `reconstruct.py`; see models/encoder.py): the stage-1
run already produced, for every training scene, (a) a latent code and
(b) an SDF sample store. Train a PointNet-style set encoder so that a
random observation SUBSET of scene i predicts code i. Because the target
table is tiny (~6k x 256) and the observation bank is device-resident,
the whole hot loop - draw scenes, draw observation subsets, encode, MSE,
Adam - is one `lax.scan` with zero per-step host traffic, exactly like
stage-2 diffusion training (train/diffusion.py).

Targets are per-dim standardized codes (same normalize_codes as stage 2)
so the MSE weighs every latent dimension equally; the checkpoint stores
mu/sigma and `models.encoder.encode_latent` maps predictions back to
table space. Fresh observation subsets per step (bank > n_obs) are the
augmentation that makes the encoder generalize to new scans - the same
trick the partial-SDF conditioning bank uses (pipeline._cond_banks).
"""

from __future__ import annotations

import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from latent_diffusion_models_for_shape_sdfs_tpu.config import EncConfig
from latent_diffusion_models_for_shape_sdfs_tpu.models.encoder import (
    LatentEncoder)
from latent_diffusion_models_for_shape_sdfs_tpu.train.diffusion import (
    normalize_codes)
from latent_diffusion_models_for_shape_sdfs_tpu.utils.logging import (
    MetricLogger)


class EncTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray  # int32 scalar


def make_enc_tx(cfg: EncConfig) -> optax.GradientTransformation:
    if cfg.lr_schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if cfg.warmup_steps else cfg.lr,
            peak_value=cfg.lr, warmup_steps=max(cfg.warmup_steps, 1),
            decay_steps=cfg.num_steps, end_value=0.05 * cfg.lr)
        return optax.adam(sched)
    assert cfg.lr_schedule == "constant", cfg.lr_schedule
    return optax.adam(cfg.lr)


def init_enc_state(cfg: EncConfig, model: LatentEncoder,
                   key: jax.Array) -> EncTrainState:
    params = model.init_params(key, n_points=cfg.n_obs)
    return EncTrainState(params=params,
                         opt_state=make_enc_tx(cfg).init(params),
                         step=jnp.zeros((), jnp.int32))


def train_encoder(cfg: EncConfig, codes: jnp.ndarray,
                  obs_xyz: np.ndarray, obs_sdf: np.ndarray,
                  logger: Optional[MetricLogger] = None,
                  state: Optional[EncTrainState] = None,
                  checkpoint_fn: Optional[Callable] = None) -> tuple:
    """Train the encoder against a frozen latent table.

    codes [S, L]: stage-1 latent table (frozen targets).
    obs_xyz [S, P, 3] / obs_sdf [S, P]: per-scene observation bank; each
    step subsamples cfg.n_obs of the P rows per drawn scene (P should be
    several x n_obs so subsets vary - cfg.obs_bank_points sizes it when
    the bank is built by the pipeline).

    Returns (model, state, (mu, sigma), final_loss).
    """
    model = LatentEncoder(cfg.encoder)
    key = jax.random.PRNGKey(cfg.seed)
    if state is None:
        key, k0 = jax.random.split(key)
        state = init_enc_state(cfg, model, k0)
    tx = make_enc_tx(cfg)

    codes = jnp.asarray(codes, jnp.float32)
    codes_n, mu, sigma = normalize_codes(codes)
    bank = jnp.concatenate(
        [jnp.asarray(obs_xyz, jnp.float32),
         jnp.asarray(obs_sdf, jnp.float32)[..., None]], axis=-1)  # [S,P,4]
    S, P = bank.shape[0], bank.shape[1]
    B, n = cfg.batch_scenes, cfg.n_obs

    # bank and codes_n enter the jitted scan as ARGUMENTS, never as
    # closure constants: captured constants are embedded in the compiled
    # program, and at config-3 scale the bank is ~400 MB — it overflowed
    # the relay's remote-compile request (HTTP 413) when closed over.
    @jax.jit
    def scan_steps(st: EncTrainState, keys: jnp.ndarray,
                   bank: jnp.ndarray, codes_n: jnp.ndarray) -> tuple:
        def loss_fn(params, ids, pts):
            z_hat = model.apply({"params": params},
                                pts[..., :3], pts[..., 3])
            tgt = jnp.take(codes_n, ids, axis=0)
            return jnp.mean(jnp.square(z_hat - tgt))

        def one_step(st: EncTrainState, key: jax.Array) -> tuple:
            k1, k2 = jax.random.split(key)
            ids = jax.random.randint(k1, (B,), 0, S)
            pidx = jax.random.randint(k2, (B, n), 0, P)
            pts = jnp.take_along_axis(jnp.take(bank, ids, axis=0),
                                      pidx[..., None], axis=1)  # [B,n,4]
            loss, grads = jax.value_and_grad(loss_fn)(st.params, ids, pts)
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return EncTrainState(params, opt_state, st.step + 1), loss

        return jax.lax.scan(one_step, st, keys)

    steps_done = int(state.step)
    t0 = time.time()
    loss = float("nan")
    while steps_done < cfg.num_steps:
        chunk = min(cfg.scan_chunk, cfg.num_steps - steps_done)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(steps_done, steps_done + chunk))
        state, losses = scan_steps(state, keys, bank, codes_n)
        steps_done += chunk
        loss = float(losses[-1])
        if logger is not None:
            logger.log("enc_train", step=steps_done, loss=loss,
                       steps_per_sec=steps_done / max(time.time() - t0,
                                                      1e-9))
        if checkpoint_fn is not None and (
                # threshold-crossing, not divisibility: scan_chunk need
                # not divide snapshot_every for snapshots to fire
                steps_done // cfg.snapshot_every
                > (steps_done - chunk) // cfg.snapshot_every
                or steps_done >= cfg.num_steps):
            checkpoint_fn(steps_done, state, mu, sigma)
    return model, state, (mu, sigma), loss
