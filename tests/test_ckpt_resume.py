"""Golden checkpoint/resume: train k -> save -> restore -> train k more
must equal 2k straight steps exactly (array equality), for both stages
(SURVEY.md s4.6). Also covers the fault-injection resume path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from latent_diffusion_models_for_shape_sdfs_tpu.config import (
    AdConfig, DecoderConfig, DiffConfig, DenoiserConfig)
from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import SdfDecoder
from latent_diffusion_models_for_shape_sdfs_tpu.models.denoiser import CondDenoiser
from latent_diffusion_models_for_shape_sdfs_tpu.train.auto_decoder import (
    AdTrainState, init_ad_state, make_ad_train_step)
from latent_diffusion_models_for_shape_sdfs_tpu.train.diffusion import (
    DiffTrainState, init_diff_state, make_diff_scan)
from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.schedule import (
    DiffusionSchedule)
from latent_diffusion_models_for_shape_sdfs_tpu.utils.checkpoint import (
    StageCheckpointer)


def _tiny_cfg():
    return AdConfig(
        decoder=DecoderConfig(latent_size=8, hidden_dim=16, num_layers=2,
                              latent_in=(), use_dropout=False),
        num_scenes=2, scenes_per_batch=2, samples_per_scene=64)


def _fixed_batch(cfg):
    k = jax.random.PRNGKey(42)
    ids = jnp.arange(cfg.scenes_per_batch, dtype=jnp.int32)
    xyz = jax.random.uniform(k, (cfg.scenes_per_batch,
                                 cfg.samples_per_scene, 3), jnp.float32,
                             -1, 1)
    sdf = 0.05 * jax.random.normal(k, (cfg.scenes_per_batch,
                                       cfg.samples_per_scene))
    return ids, xyz, sdf


def _run_steps(step, state, cfg, n, start=0):
    ids, xyz, sdf = _fixed_batch(cfg)
    for i in range(start, start + n):
        state, _ = step(state, ids, xyz, sdf, jnp.asarray(float(i)),
                        jax.random.PRNGKey(i))
    return state


def test_ad_ckpt_resume_exact(tmp_path):
    cfg = _tiny_cfg()
    decoder = SdfDecoder(cfg.decoder)
    step = make_ad_train_step(decoder, cfg, jit=True)

    s_straight = init_ad_state(cfg, decoder, jax.random.PRNGKey(0))
    s_straight = _run_steps(step, s_straight, cfg, 10)

    s_a = init_ad_state(cfg, decoder, jax.random.PRNGKey(0))
    s_a = _run_steps(step, s_a, cfg, 5)
    ckpt = StageCheckpointer(tmp_path, "auto_decoder")
    ckpt.save(5, s_a._asdict())

    template = init_ad_state(cfg, decoder, jax.random.PRNGKey(0))
    restored = AdTrainState(**ckpt.restore(template._asdict()))
    ckpt.close()
    s_b = _run_steps(step, restored, cfg, 5, start=5)

    flat_a = jax.tree.leaves(s_straight)
    flat_b = jax.tree.leaves(s_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_diff_ckpt_resume_exact(tmp_path):
    cfg = DiffConfig(denoiser=DenoiserConfig(latent_size=8, hidden_dim=32,
                                             num_blocks=1,
                                             time_embed_dim=16),
                     timesteps=10, batch_size=8, num_steps=20, scan_chunk=5)
    model = CondDenoiser(cfg.denoiser)
    schedule = DiffusionSchedule.create(cfg.timesteps)
    codes = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    run = make_diff_scan(cfg, model, schedule, num_codes=16)
    cids = jnp.zeros((16,), jnp.int32)
    oxyz = jnp.zeros((1, 1, 3))
    osdf = jnp.zeros((1, 1))

    def chunks(state, keys):
        for k in keys:
            state, _ = run(state, codes, cids, oxyz, osdf, k)
        return state

    keys = [jax.random.PRNGKey(100 + i) for i in range(4)]
    s_straight = chunks(init_diff_state(cfg, model, jax.random.PRNGKey(0)),
                        keys)

    s_a = chunks(init_diff_state(cfg, model, jax.random.PRNGKey(0)),
                 keys[:2])
    ckpt = StageCheckpointer(tmp_path, "diffusion")
    ckpt.save(int(s_a.step), s_a._asdict())
    template = init_diff_state(cfg, model, jax.random.PRNGKey(0))
    restored = DiffTrainState(**ckpt.restore(template._asdict()))
    ckpt.close()
    s_b = chunks(restored, keys[2:])

    for a, b in zip(jax.tree.leaves(s_straight), jax.tree.leaves(s_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fault_injection_resume(tmp_path):
    """Kill-at-step-N simulation: state saved every step, 'crash' midway,
    resume from latest — end state equals the uninterrupted run."""
    cfg = _tiny_cfg()
    decoder = SdfDecoder(cfg.decoder)
    step = make_ad_train_step(decoder, cfg, jit=True)
    ids, xyz, sdf = _fixed_batch(cfg)

    ckpt = StageCheckpointer(tmp_path, "auto_decoder", max_to_keep=2)
    state = init_ad_state(cfg, decoder, jax.random.PRNGKey(7))
    crash_at = 4
    try:
        for i in range(8):
            state, _ = step(state, ids, xyz, sdf, jnp.asarray(float(i)),
                            jax.random.PRNGKey(i))
            ckpt.save(i, state._asdict())
            if i == crash_at:
                raise RuntimeError("injected fault")
    except RuntimeError:
        pass
    template = init_ad_state(cfg, decoder, jax.random.PRNGKey(7))
    assert ckpt.latest_step() == crash_at
    state = AdTrainState(**ckpt.restore(template._asdict()))
    for i in range(crash_at + 1, 8):
        state, _ = step(state, ids, xyz, sdf, jnp.asarray(float(i)),
                        jax.random.PRNGKey(i))
    ckpt.close()

    ref = init_ad_state(cfg, decoder, jax.random.PRNGKey(7))
    ref = _run_steps(step, ref, cfg, 8)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
