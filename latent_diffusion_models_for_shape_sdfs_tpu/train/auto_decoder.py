"""Stage-1 auto-decoder training: joint decoder + latent-table optimization.

Semantics pinned in SEMANTICS.md sections 1-5 (lineage `train_deep_sdf.py`
control flow): per step, gather each batch scene's code, run the 8x512
decoder over scenes_per_batch x samples_per_scene (xyz, sdf) pairs, minimize
clamped-L1 + warm-up code regularization, and apply **two** Adam groups
(decoder lr 5e-4, latents lr 1e-3) with per-epoch step-decay schedules.

TPU shape: the whole step (gather -> MLP -> loss -> both Adam updates ->
dense scatter of latent grads) is ONE jitted program with donated state
buffers; the host only feeds (scene_ids, xyz, sdf) batches. Data
parallelism wraps this same step via shard_map (parallel/dp.py): batch axis
sharded, latent table replicated, grads psum'd.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from latent_diffusion_models_for_shape_sdfs_tpu.config import AdConfig
from latent_diffusion_models_for_shape_sdfs_tpu import losses
from latent_diffusion_models_for_shape_sdfs_tpu.data.sdf_dataset import SdfDataset
from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import SdfDecoder
from latent_diffusion_models_for_shape_sdfs_tpu.models.latent_table import (
    LatentTable, gather_codes, init_latent_table)
from latent_diffusion_models_for_shape_sdfs_tpu.utils.logging import MetricLogger


class AdTrainState(NamedTuple):
    params: dict           # decoder params
    codes: jnp.ndarray     # latent table [num_scenes, L]
    opt_dec: optax.OptState
    opt_lat: optax.OptState


def step_lr(lr0: float, epoch: jnp.ndarray, factor: float,
            interval: int) -> jnp.ndarray:
    """lr0 * factor^(epoch // interval) — lineage StepLearningRateSchedule."""
    e = jnp.asarray(epoch, jnp.float32)
    return lr0 * jnp.power(factor, jnp.floor(e / interval))


def init_ad_state(cfg: AdConfig, decoder: SdfDecoder,
                  key: jax.Array) -> AdTrainState:
    k_dec, k_lat = jax.random.split(key)
    params = decoder.init_params(k_dec)
    table = init_latent_table(k_lat, cfg.num_scenes, cfg.decoder.latent_size,
                              cfg.code_init_std)
    # Adam kernels without the lr scale — lr is applied per-step from the
    # epoch schedule (SEMANTICS.md s5), keeping optimizer state lr-free.
    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    return AdTrainState(
        params=params,
        codes=table.codes,
        opt_dec=adam.init(params),
        opt_lat=adam.init(table.codes),
    )


def pallas_train_ok(cfg: AdConfig) -> bool:
    """Whether the fused Pallas train kernel (ops/fused_train.py) can run
    here: its in-kernel dropout needs the TPU hardware PRNG, so on CPU
    (interpret mode) the kernel is only usable with dropout off."""
    return bool(cfg.use_pallas) and (
        jax.devices()[0].platform != "cpu"
        or not (cfg.decoder.use_dropout and cfg.decoder.dropout_prob > 0))


def make_ad_train_step(decoder: SdfDecoder, cfg: AdConfig,
                       jit: bool = True,
                       value_and_grads: Optional[Callable] = None
                       ) -> Callable:
    """Returns step(state, scene_ids[S], xyz[S,P,3], sdf[S,P], epoch, key)
    -> (state, metrics). Pure function; shard_map-wrappable.

    `value_and_grads`: override for the loss+grad computation with the
    same contract as jax.value_and_grad(loss_fn, argnums=(0,1),
    has_aux=True) — parallel/dp.py injects a shard_map-wrapped fused
    Pallas kernel here so the optimizer update logic stays shared."""
    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    S, P = cfg.scenes_per_batch, cfg.samples_per_scene
    num_sdf_samples = S * P

    def loss_fn(params, codes, scene_ids, xyz, sdf, epoch, drop_key):
        z = gather_codes(LatentTable(codes), scene_ids, cfg.code_bound)
        zz = jnp.broadcast_to(z[:, None, :], (z.shape[0], xyz.shape[1],
                                              z.shape[-1]))
        flat_z = zz.reshape(-1, z.shape[-1])
        flat_xyz = xyz.reshape(-1, 3)
        pred = decoder.apply({"params": params}, flat_z, flat_xyz,
                             train=True, rngs={"dropout": drop_key})
        l1 = losses.clamped_l1(pred, sdf.reshape(-1), cfg.clamp_dist,
                               num_sdf_samples)
        # Lineage sums ||z|| over PER-SAMPLE gathered rows then divides by
        # num_sdf_samples; with equal samples per scene that reduces to
        # sum over scenes / S (the P factor cancels). SEMANTICS.md s2.
        reg = losses.code_reg(z, epoch, cfg.code_reg_lambda,
                              cfg.code_reg_warmup_epochs,
                              num_sdf_samples=z.shape[0],
                              squared=cfg.code_reg_squared)
        return l1 + reg, {"loss_l1": l1, "loss_reg": reg}

    if value_and_grads is not None:
        pass  # injected (shard_map-wrapped) loss+grad path
    elif pallas_train_ok(cfg):
        # fused Pallas fwd+loss+bwd kernel (ops/fused_train.py): zero HBM
        # activation traffic; same (loss, aux), (g_dec, g_lat) contract.
        from latent_diffusion_models_for_shape_sdfs_tpu.ops.fused_train \
            import make_pallas_ad_loss_grads
        value_and_grads = make_pallas_ad_loss_grads(decoder, cfg)
    else:
        def value_and_grads(params, codes, scene_ids, xyz, sdf, epoch,
                            key):
            return jax.value_and_grad(loss_fn, argnums=(0, 1),
                                      has_aux=True)(
                params, codes, scene_ids, xyz, sdf, epoch, key)

    def step(state: AdTrainState, scene_ids, xyz, sdf, epoch, key):
        (loss, aux), grads = value_and_grads(
            state.params, state.codes, scene_ids, xyz, sdf, epoch, key)
        g_dec, g_lat = grads
        lr_dec = step_lr(cfg.lr_decoder, epoch, cfg.lr_decay_factor,
                         cfg.lr_decay_interval)
        lr_lat = step_lr(cfg.lr_latent, epoch, cfg.lr_decay_factor,
                         cfg.lr_decay_interval)
        upd_dec, opt_dec = adam.update(g_dec, state.opt_dec)
        upd_lat, opt_lat = adam.update(g_lat, state.opt_lat)
        params = jax.tree.map(lambda p, u: p - lr_dec * u, state.params,
                              upd_dec)
        codes = state.codes - lr_lat * upd_lat
        metrics = {"loss": loss, **aux, "lr_dec": lr_dec, "lr_lat": lr_lat,
                   "grad_norm_dec": optax.global_norm(g_dec),
                   "grad_norm_lat": jnp.linalg.norm(g_lat)}
        return AdTrainState(params, codes, opt_dec, opt_lat), metrics

    if jit:
        step = jax.jit(step, donate_argnums=(0,))
    return step


def train_auto_decoder(cfg: AdConfig, dataset: Optional[SdfDataset],
                       logger: Optional[MetricLogger] = None,
                       decoder: Optional[SdfDecoder] = None,
                       state: Optional[AdTrainState] = None,
                       start_epoch: int = 0,
                       checkpoint_fn: Optional[Callable] = None,
                       bank=None,
                       ) -> tuple:
    """Full stage-1 loop. Returns (decoder, final AdTrainState, metrics).

    `checkpoint_fn(epoch, state)` is invoked every `cfg.snapshot_every`
    epochs (utils/checkpoint.py provides the orbax-backed one).

    `bank`: an already-built DeviceSampleBank (e.g. generated on device
    by data/analytic_jax.py); requires cfg.device_data and makes
    `dataset` optional — the host then never materializes sample arrays.
    """
    if dataset is not None:
        assert len(dataset) == cfg.num_scenes, (
            f"dataset has {len(dataset)} scenes, config says "
            f"{cfg.num_scenes}")
    else:
        assert bank is not None and cfg.device_data, (
            "dataset=None requires a prebuilt bank and cfg.device_data")
        assert int(bank.pos.shape[0]) == cfg.num_scenes
    decoder = decoder or SdfDecoder(cfg.decoder)
    key = jax.random.PRNGKey(cfg.seed)
    if state is None:
        key, k_init = jax.random.split(key)
        state = init_ad_state(cfg, decoder, k_init)
    if cfg.data_parallel and len(jax.devices()) > 1:
        from latent_diffusion_models_for_shape_sdfs_tpu.parallel import (
            make_mesh, make_dp_ad_train_step)
        step_fn = make_dp_ad_train_step(decoder, cfg, make_mesh())
    else:
        step_fn = make_ad_train_step(decoder, cfg)

    if not cfg.device_data:
        bank = None
    if cfg.device_data:
        # One-time upload of the whole sample store; the balanced draw
        # happens on device inside the jitted step and the host sends only
        # 64 scene ids per step (data/device_bank.py).
        if bank is None:
            from latent_diffusion_models_for_shape_sdfs_tpu.data.\
                device_bank import DeviceSampleBank
            bank = DeviceSampleBank.from_dataset(dataset)
        if cfg.data_parallel and len(jax.devices()) > 1:
            # device-data composed with the mesh (bank replicated,
            # batch sharded, fused Pallas kernel under shard_map when
            # cfg.use_pallas) — parallel/dp.py
            from latent_diffusion_models_for_shape_sdfs_tpu.parallel \
                import make_mesh
            from latent_diffusion_models_for_shape_sdfs_tpu.parallel.dp \
                import make_dp_bank_step
            bank_step = make_dp_bank_step(decoder, cfg, make_mesh())
        else:
            raw_step = make_ad_train_step(decoder, cfg, jit=False)
            P = cfg.samples_per_scene

            # NB: the bank rides as a jit ARGUMENT, not a closure
            # constant — a config-3-scale store (3+ GiB) captured as a
            # constant gets embedded in the lowered program (XLA may
            # hold a second copy; lowering warns at 3.22 GiB measured).
            @functools.partial(jax.jit, donate_argnums=(0,))
            def bank_step(state, bank_, scene_ids, epoch, key):
                k_data, k_step = jax.random.split(key)
                xyz, sdf = bank_.sample_batch(k_data, scene_ids, P)
                return raw_step(state, scene_ids, xyz, sdf, epoch,
                                k_step)

    logger = logger or MetricLogger()
    rng = np.random.default_rng(cfg.seed + 1)

    # Host-side prefetch: the numpy balanced-subsample work for the next
    # batch overlaps the (async-dispatched) device step. Depth 2 keeps one
    # batch in flight without unbounded memory.
    import queue as _queue
    import threading as _threading

    def _producer(q, epochs):
        try:
            for epoch in epochs:
                if bank is not None:
                    # device-data mode: the host only schedules scene ids
                    n = cfg.num_scenes
                    order = rng.permutation(n)
                    spb = cfg.scenes_per_batch
                    for start in range(0, n, spb):
                        ids = order[start:start + spb]
                        if len(ids) < spb:
                            pad = rng.permutation(n)[:spb - len(ids)]
                            ids = np.concatenate([ids, pad])
                        q.put((epoch, ids.astype(np.int32)))
                    continue
                for batch in dataset.epoch_batches(rng,
                                                   cfg.scenes_per_batch,
                                                   cfg.samples_per_scene):
                    q.put((epoch, batch))
        finally:
            q.put(None)

    q: "_queue.Queue" = _queue.Queue(maxsize=2)
    epochs_iter = range(start_epoch, cfg.num_epochs)
    producer = _threading.Thread(target=_producer, args=(q, epochs_iter),
                                 daemon=True)
    producer.start()

    last_metrics: dict = {}
    steps_done = 0
    cur_epoch = start_epoch
    t_start = time.perf_counter()

    def on_epoch_end(epoch):
        if logger and (epoch % 10 == 0 or epoch == cfg.num_epochs - 1):
            m = {k: float(v) for k, v in last_metrics.items()}
            dt = time.perf_counter() - t_start
            logger.log("ad_epoch", epoch=epoch, steps=steps_done,
                       steps_per_sec=steps_done / max(dt, 1e-9), **m)
        if checkpoint_fn and cfg.snapshot_every and (
                (epoch + 1) % cfg.snapshot_every == 0
                or epoch == cfg.num_epochs - 1):
            checkpoint_fn(epoch, state)

    # Wire dtype: the perf paths (fused Pallas kernel / bf16 compute) cast
    # xyz to bf16 on device anyway, so ship it over PCIe at 2 bytes/elem —
    # halves the dominant h2d cost of the 12.6 MB/step coordinate feed.
    # The fp32 parity path keeps full-precision inputs.
    xyz_wire = (jnp.bfloat16 if (cfg.use_pallas or
                                 cfg.decoder.compute_dtype == "bfloat16")
                else jnp.float32)

    saw_batch = False
    while True:
        item = q.get()
        if item is None:
            break
        epoch, batch = item
        if saw_batch and epoch != cur_epoch:
            on_epoch_end(cur_epoch)
        key, k_drop = jax.random.split(key)
        if bank is not None:
            state, metrics = bank_step(state, bank, jnp.asarray(batch),
                                       jnp.asarray(epoch, jnp.float32),
                                       k_drop)
        else:
            state, metrics = step_fn(state, jnp.asarray(batch.scene_ids),
                                     jnp.asarray(batch.xyz,
                                                 dtype=xyz_wire),
                                     jnp.asarray(batch.sdf),
                                     jnp.asarray(epoch, jnp.float32),
                                     k_drop)
        steps_done += 1
        last_metrics = metrics
        cur_epoch = epoch
        saw_batch = True
    if saw_batch:
        on_epoch_end(cur_epoch)
    producer.join()
    jax.block_until_ready(state.codes)
    return decoder, state, last_metrics
