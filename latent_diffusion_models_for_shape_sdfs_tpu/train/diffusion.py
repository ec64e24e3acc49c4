"""Stage-2 latent diffusion training: fully on-device `lax.scan` loop.

The training set is the frozen stage-1 latent table (~6k x 256 = 6 MB,
BASELINE.json:9) — it lives on device for the whole run, so the hot loop
(draw code rows -> q_sample -> denoiser -> Adam + EMA) is a single compiled
scan over `scan_chunk` steps with NO host round-trips (BASELINE.json:5
"fully on-device jax.lax.scan DDPM/DDIM loop"). The host only logs between
scan chunks. SEMANTICS.md section 6 pins the math.

Conditioning banks (class ids, partial-SDF observation sets) are uploaded
once alongside the codes and indexed inside the scan.
"""

from __future__ import annotations

import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from latent_diffusion_models_for_shape_sdfs_tpu.config import DiffConfig
from latent_diffusion_models_for_shape_sdfs_tpu import losses
from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.schedule import (
    DiffusionSchedule,
)
from latent_diffusion_models_for_shape_sdfs_tpu.models.denoiser import (
    CondDenoiser,
)
from latent_diffusion_models_for_shape_sdfs_tpu.utils.logging import MetricLogger


class DiffTrainState(NamedTuple):
    params: dict
    ema_params: dict
    opt_state: optax.OptState
    step: jnp.ndarray  # int32 scalar


def normalize_codes(codes: jnp.ndarray, eps: float = 1e-6) -> tuple:
    """Per-dim standardization of the frozen latent table. Returns
    (normed [N,L], mu [L], sigma [L]); sigma floored at eps."""
    mu = jnp.mean(codes, axis=0)
    sigma = jnp.maximum(jnp.std(codes, axis=0), eps)
    return (codes - mu) / sigma, mu, sigma


def unnormalize_codes(z: jnp.ndarray, mu: jnp.ndarray,
                      sigma: jnp.ndarray) -> jnp.ndarray:
    return z * sigma + mu


def make_diff_tx(cfg: DiffConfig) -> optax.GradientTransformation:
    """Stage-2 optimizer; one definition so init_diff_state and
    make_diff_scan agree on the optimizer-state structure."""
    if cfg.lr_schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if cfg.warmup_steps else cfg.lr,
            peak_value=cfg.lr, warmup_steps=max(cfg.warmup_steps, 1),
            decay_steps=cfg.num_steps, end_value=0.05 * cfg.lr)
        return optax.adam(sched)
    assert cfg.lr_schedule == "constant", cfg.lr_schedule
    return optax.adam(cfg.lr)


def init_diff_state(cfg: DiffConfig, model: CondDenoiser,
                    key: jax.Array) -> DiffTrainState:
    c = cfg.denoiser
    z = jnp.zeros((1, c.latent_size), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    kwargs = {}
    if c.num_classes > 0:
        kwargs["class_id"] = jnp.zeros((1,), jnp.int32)
    if c.partial_sdf_cond:
        kwargs["obs_xyz"] = jnp.zeros((1, c.partial_points, 3), jnp.float32)
        kwargs["obs_sdf"] = jnp.zeros((1, c.partial_points), jnp.float32)
    params = model.init({"params": key}, z, t, **kwargs)["params"]
    tx = optax.adam(cfg.lr)
    # ema starts as a distinct copy: state buffers are donated per scan
    # chunk, and aliased params/ema would be donated twice.
    return DiffTrainState(params=params,
                          ema_params=jax.tree.map(jnp.copy, params),
                          opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))


def make_diff_scan(cfg: DiffConfig, model: CondDenoiser,
                   schedule: DiffusionSchedule,
                   num_codes: int,
                   jit: bool = True) -> Callable:
    """Returns run(state, codes_n, class_ids, obs_xyz, obs_sdf, key)
    -> (state, mean_loss) executing cfg.scan_chunk steps on device."""
    tx = optax.adam(cfg.lr)
    c = cfg.denoiser
    B = cfg.batch_size

    def run(state, codes_n, class_ids, obs_xyz, obs_sdf, key):
        def one_step(carry, step_key):
            k_idx, k_t, k_eps, k_drop, k_obs = jax.random.split(step_key, 5)
            idx = jax.random.randint(k_idx, (B,), 0, num_codes)
            z0 = codes_n[idx]
            t = jax.random.randint(k_t, (B,), 0, schedule.timesteps)
            eps = jax.random.normal(k_eps, z0.shape, jnp.float32)
            z_t = schedule.q_sample(z0, t, eps)
            kwargs = {}
            if c.num_classes > 0 or c.partial_sdf_cond:
                drop = jax.random.bernoulli(k_drop, c.cond_drop_prob, (B,))
                kwargs["cond_drop"] = drop
            if c.num_classes > 0:
                kwargs["class_id"] = class_ids[idx]
            if c.partial_sdf_cond:
                ox, od = obs_xyz[idx], obs_sdf[idx]
                bank_n = ox.shape[1]
                if bank_n > c.partial_points:
                    # fresh observation subset per step (on-device): the
                    # encoder must learn set-level geometry, not memorize
                    # one fixed point set per scene — this is what makes
                    # conditioning generalize to unseen scans.
                    cols = jax.random.randint(
                        k_obs, (B, c.partial_points), 0, bank_n)
                    ox = jnp.take_along_axis(ox, cols[..., None], axis=1)
                    od = jnp.take_along_axis(od, cols, axis=1)
                kwargs["obs_xyz"] = ox
                kwargs["obs_sdf"] = od

            def loss_fn(params):
                eps_hat = model.apply({"params": params}, z_t, t, **kwargs)
                return losses.eps_mse(eps, eps_hat)

            loss, grads = jax.value_and_grad(loss_fn)(carry.params)
            updates, opt_state = tx.update(grads, carry.opt_state,
                                           carry.params)
            params = optax.apply_updates(carry.params, updates)
            d = cfg.ema_decay
            ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                               carry.ema_params, params)
            return DiffTrainState(params, ema, opt_state,
                                  carry.step + 1), loss

        keys = jax.random.split(key, cfg.scan_chunk)
        state, losses_ = jax.lax.scan(one_step, state, keys)
        return state, jnp.mean(losses_)

    if jit:
        run = jax.jit(run, donate_argnums=(0,))
    return run


def train_diffusion(cfg: DiffConfig, codes: jnp.ndarray,
                    class_ids: Optional[np.ndarray] = None,
                    obs_xyz: Optional[np.ndarray] = None,
                    obs_sdf: Optional[np.ndarray] = None,
                    logger: Optional[MetricLogger] = None,
                    state: Optional[DiffTrainState] = None,
                    checkpoint_fn: Optional[Callable] = None) -> tuple:
    """Full stage-2 loop over the frozen latent table.

    Returns (model, final DiffTrainState, (mu, sigma), last_loss).
    `codes` is the RAW stage-1 table; normalization stats are computed here
    and must be carried to sampling (they are part of the checkpoint).
    """
    model = CondDenoiser(cfg.denoiser)
    codes = jnp.asarray(codes, jnp.float32)
    codes_n, mu, sigma = normalize_codes(codes)
    num_codes = int(codes.shape[0])
    schedule = DiffusionSchedule.create(cfg.timesteps, cfg.beta_start,
                                        cfg.beta_end)
    key = jax.random.PRNGKey(cfg.seed)
    if state is None:
        key, k_init = jax.random.split(key)
        state = init_diff_state(cfg, model, k_init)
    run = make_diff_scan(cfg, model, schedule, num_codes)

    cids = (jnp.asarray(class_ids, jnp.int32) if class_ids is not None
            else jnp.zeros((num_codes,), jnp.int32))
    oxyz = (jnp.asarray(obs_xyz, jnp.float32) if obs_xyz is not None
            else jnp.zeros((1, 1, 3), jnp.float32))
    osdf = (jnp.asarray(obs_sdf, jnp.float32) if obs_sdf is not None
            else jnp.zeros((1, 1), jnp.float32))

    logger = logger or MetricLogger()
    last_loss = float("nan")
    done = int(state.step)
    t0 = time.perf_counter()
    while done < cfg.num_steps:
        key, k_run = jax.random.split(key)
        state, mean_loss = run(state, codes_n, cids, oxyz, osdf, k_run)
        done = int(state.step)
        last_loss = float(mean_loss)
        dt = time.perf_counter() - t0
        logger.log("diff_chunk", step=done, loss=last_loss,
                   steps_per_sec=done / max(dt, 1e-9))
        if checkpoint_fn and cfg.snapshot_every and (
                done % cfg.snapshot_every < cfg.scan_chunk):
            checkpoint_fn(done, state, mu, sigma)
    return model, state, (mu, sigma), last_loss
