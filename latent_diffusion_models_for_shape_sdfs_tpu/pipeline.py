"""Experiment pipeline: wires config + data + training + checkpoints +
sampling + reconstruction around the experiment-dir convention
(SURVEY.md s5.6). The CLI (cli.py) is a thin argparse front over this.

Stage handoff: stage 2 reads stage 1's checkpoint read-only (frozen codes);
sampling reads both. Every stage is resumable from its latest checkpoint.
"""

from __future__ import annotations

import pathlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from latent_diffusion_models_for_shape_sdfs_tpu.config import (
    ExperimentConfig, experiment_layout)
from latent_diffusion_models_for_shape_sdfs_tpu.data import analytic
from latent_diffusion_models_for_shape_sdfs_tpu.data.sdf_dataset import SdfDataset
from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import SdfDecoder
from latent_diffusion_models_for_shape_sdfs_tpu.models.denoiser import CondDenoiser
from latent_diffusion_models_for_shape_sdfs_tpu.train.auto_decoder import (
    AdTrainState, init_ad_state, train_auto_decoder)
from latent_diffusion_models_for_shape_sdfs_tpu.train.diffusion import (
    DiffTrainState, init_diff_state, train_diffusion, unnormalize_codes)
from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.schedule import (
    DiffusionSchedule)
from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.sampler import (
    ddim_sample, ddpm_sample, guided_denoise_fn)
from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
    decode_grid, decode_grid_adaptive, flax_apply_fn)
from latent_diffusion_models_for_shape_sdfs_tpu.ops.fused_decoder import (
    make_fast_apply)
from latent_diffusion_models_for_shape_sdfs_tpu.ops.isosurface import (
    extract_mesh)
from latent_diffusion_models_for_shape_sdfs_tpu.utils.checkpoint import (
    StageCheckpointer)
from latent_diffusion_models_for_shape_sdfs_tpu.utils.logging import MetricLogger
from latent_diffusion_models_for_shape_sdfs_tpu.utils import meshio


def build_dataset(cfg: ExperimentConfig) -> SdfDataset:
    src = cfg.data_source
    if src.startswith("analytic:"):
        family = src.split(":", 1)[1]
        shapes = analytic.make_synthetic_split(family, cfg.ad.num_scenes,
                                               seed=cfg.ad.seed)
        return SdfDataset.from_analytic(shapes)
    if src.startswith("sdf:"):
        return SdfDataset.from_dir(src.split(":", 1)[1])
    raise ValueError(f"unknown data source {src!r}")


# --------------------------------------------------------------- stage 1


def run_train_ad(exp_dir: str, resume: bool = False,
                 dataset: Optional[SdfDataset] = None,
                 fault_inject_epoch: Optional[int] = None,
                 debug_nans: bool = False,
                 tensorboard: bool = False) -> AdTrainState:
    """`fault_inject_epoch`: kill the process right after that epoch's
    checkpoint (SURVEY.md s5.3 failure-recovery drill; resume with
    --resume). `debug_nans`: run under jax's NaN checker (s5.2).
    `tensorboard`: mirror numeric metrics as TB scalars under
    <exp>/logs/tb (s5.5; JSONL stays the source of truth)."""
    cfg = ExperimentConfig.load(exp_dir)
    lay = experiment_layout(exp_dir)
    dataset = dataset or build_dataset(cfg)
    decoder = SdfDecoder(cfg.ad.decoder)
    ckpt = StageCheckpointer(exp_dir, "auto_decoder")
    logger = MetricLogger(lay["logs"] / "train_ad.jsonl", echo=True,
                          tensorboard=(lay["logs"] / "tb" / "ad")
                          if tensorboard else None)

    state = init_ad_state(cfg.ad, decoder, jax.random.PRNGKey(cfg.ad.seed))
    start_epoch = 0
    if resume and ckpt.latest_step() is not None:
        state = AdTrainState(**ckpt.restore(state._asdict()))
        start_epoch = ckpt.latest_step() + 1
        logger.log("resume", stage="auto_decoder", epoch=start_epoch)

    def save(epoch, st):
        ckpt.save(epoch, st._asdict())
        if fault_inject_epoch is not None and epoch >= fault_inject_epoch:
            logger.log("fault_injected", epoch=epoch)
            raise SystemExit(42)

    import contextlib
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.profiling import (
        debug_nans as debug_nans_ctx)
    ctx = debug_nans_ctx(True) if debug_nans else contextlib.nullcontext()
    with ctx:
        _, state, metrics = train_auto_decoder(
            cfg.ad, dataset, logger=logger, decoder=decoder, state=state,
            start_epoch=start_epoch, checkpoint_fn=save)
    save(cfg.ad.num_epochs - 1, state)
    ckpt.close()
    logger.close()
    return state


def load_ad_state(exp_dir: str) -> tuple:
    """(decoder, AdTrainState) from the latest stage-1 checkpoint."""
    cfg = ExperimentConfig.load(exp_dir)
    decoder = SdfDecoder(cfg.ad.decoder)
    ckpt = StageCheckpointer(exp_dir, "auto_decoder")
    template = init_ad_state(cfg.ad, decoder,
                             jax.random.PRNGKey(cfg.ad.seed))
    state = AdTrainState(**ckpt.restore(template._asdict()))
    ckpt.close()
    return decoder, state


# --------------------------------------------------------------- stage 2


def _cond_banks(cfg: ExperimentConfig, dataset: Optional[SdfDataset]):
    """(class_ids, obs_xyz, obs_sdf) conditioning banks for training."""
    dn = cfg.diff.denoiser
    class_ids = obs_xyz = obs_sdf = None
    if dataset is not None and dn.num_classes > 0:
        class_ids = dataset.class_ids
    if dataset is not None and dn.partial_sdf_cond:
        rng = np.random.default_rng(cfg.diff.seed)
        # bank > partial_points: the on-device scan re-subsamples a fresh
        # observation set per step so the encoder generalizes to new scans
        bank = dn.obs_bank_points or 4 * dn.partial_points
        xs, ds_ = [], []
        for i in range(len(dataset)):
            rows = dataset.sample_scene(i, bank, rng)
            xs.append(rows[:, :3])
            ds_.append(rows[:, 3])
        obs_xyz = np.stack(xs)
        obs_sdf = np.stack(ds_)
    return class_ids, obs_xyz, obs_sdf


def run_train_diff(exp_dir: str, resume: bool = False,
                   dataset: Optional[SdfDataset] = None,
                   tensorboard: bool = False) -> tuple:
    cfg = ExperimentConfig.load(exp_dir)
    lay = experiment_layout(exp_dir)
    _, ad_state = load_ad_state(exp_dir)
    if dataset is None and (cfg.diff.denoiser.num_classes > 0
                            or cfg.diff.denoiser.partial_sdf_cond):
        dataset = build_dataset(cfg)
    class_ids, obs_xyz, obs_sdf = _cond_banks(cfg, dataset)

    model = CondDenoiser(cfg.diff.denoiser)
    ckpt = StageCheckpointer(exp_dir, "diffusion")
    logger = MetricLogger(lay["logs"] / "train_diff.jsonl", echo=True,
                          tensorboard=(lay["logs"] / "tb" / "diff")
                          if tensorboard else None)
    state = init_diff_state(cfg.diff, model,
                            jax.random.PRNGKey(cfg.diff.seed))
    if resume and ckpt.latest_step() is not None:
        tmpl = {"state": state._asdict(),
                "mu": jnp.zeros((cfg.diff.denoiser.latent_size,)),
                "sigma": jnp.zeros((cfg.diff.denoiser.latent_size,))}
        restored = ckpt.restore(tmpl)
        state = DiffTrainState(**restored["state"])
        logger.log("resume", stage="diffusion", step=int(state.step))

    def save(step, st, mu, sigma):
        ckpt.save(step, {"state": st._asdict(), "mu": mu, "sigma": sigma})

    model, state, (mu, sigma), loss = train_diffusion(
        cfg.diff, ad_state.codes, class_ids=class_ids, obs_xyz=obs_xyz,
        obs_sdf=obs_sdf, logger=logger, state=state, checkpoint_fn=save)
    save(int(state.step), state, mu, sigma)
    ckpt.close()
    logger.close()
    return model, state, (mu, sigma)


def load_diff_state(exp_dir: str) -> tuple:
    cfg = ExperimentConfig.load(exp_dir)
    model = CondDenoiser(cfg.diff.denoiser)
    ckpt = StageCheckpointer(exp_dir, "diffusion")
    tmpl_state = init_diff_state(cfg.diff, model,
                                 jax.random.PRNGKey(cfg.diff.seed))
    L = cfg.diff.denoiser.latent_size
    tmpl = {"state": tmpl_state._asdict(), "mu": jnp.zeros((L,)),
            "sigma": jnp.zeros((L,))}
    restored = ckpt.restore(tmpl)
    ckpt.close()
    return (model, DiffTrainState(**restored["state"]),
            (restored["mu"], restored["sigma"]))


# ------------------------------------------------- amortized encoder


def _enc_bank(cfg: ExperimentConfig, dataset: SdfDataset) -> tuple:
    """Per-scene observation bank [S,P,3]/[S,P] for encoder training
    (same construction as the partial-SDF conditioning bank).

    For the `analytic:chair` source the bank is generated ON DEVICE
    (data/analytic_jax — the same path tools/encoder_run.py uses at the
    6k scale): a host-built bank at config-3 size is ~400 MB of f32
    pushed over the throttled h2d link (CLAUDE.md: bulk host feeds are
    a trap). The device bank carries the preprocessor's sample
    distribution rather than the store's balanced pos/neg draw — both
    are valid observation models for the encoder (it consumes
    observations, not loss-balanced batches). Other sources (npz dirs,
    non-chair families) keep the host path.
    """
    ec = cfg.encoder
    bank = ec.obs_bank_points or 4 * ec.n_obs
    if cfg.data_source == "analytic:chair":
        from latent_diffusion_models_for_shape_sdfs_tpu.data import (
            analytic, analytic_jax)
        shapes = analytic.make_synthetic_split(
            "chair", cfg.ad.num_scenes, seed=cfg.ad.seed)
        # Distinct stream tag: train_encoder derives per-step keys as
        # fold_in(PRNGKey(cfg.seed), step), so a bare fold_in(key, start)
        # here would collide with it at steps 0, 512, ... — tag the bank
        # stream so the two can never overlap.
        key = jax.random.fold_in(jax.random.PRNGKey(ec.seed), 0xBA17)
        gen = jax.jit(jax.vmap(
            lambda p, k: analytic_jax.sample_sdf_points_device(p, k, bank)))
        xs, ds_ = [], []
        for start in range(0, len(shapes), 512):
            sub = analytic_jax.pack_chairs(shapes[start:start + 512])
            keys = jax.random.split(jax.random.fold_in(key, start),
                                    sub.num_shapes)
            xyz, d = gen(sub, keys)
            xs.append(xyz)
            ds_.append(d)
        return (jnp.concatenate(xs, axis=0), jnp.concatenate(ds_, axis=0))
    rng = np.random.default_rng(ec.seed)
    xs, ds_ = [], []
    for i in range(len(dataset)):
        rows = dataset.sample_scene(i, bank, rng)
        xs.append(rows[:, :3])
        ds_.append(rows[:, 3])
    return np.stack(xs), np.stack(ds_)


def run_train_encoder(exp_dir: str, resume: bool = False,
                      dataset: Optional[SdfDataset] = None,
                      tensorboard: bool = False) -> tuple:
    """Train the amortized latent encoder against the frozen stage-1
    table (train/encoder.py). Requires a completed train-ad stage."""
    from latent_diffusion_models_for_shape_sdfs_tpu.train.encoder import (
        EncTrainState, init_enc_state, train_encoder)
    from latent_diffusion_models_for_shape_sdfs_tpu.models.encoder import (
        LatentEncoder)
    cfg = ExperimentConfig.load(exp_dir)
    lay = experiment_layout(exp_dir)
    _, ad_state = load_ad_state(exp_dir)
    if dataset is None:
        dataset = build_dataset(cfg)
    obs_xyz, obs_sdf = _enc_bank(cfg, dataset)

    model = LatentEncoder(cfg.encoder.encoder)
    ckpt = StageCheckpointer(exp_dir, "encoder")
    logger = MetricLogger(lay["logs"] / "train_enc.jsonl", echo=True,
                          tensorboard=(lay["logs"] / "tb" / "enc")
                          if tensorboard else None)
    state = init_enc_state(cfg.encoder, model,
                           jax.random.PRNGKey(cfg.encoder.seed))
    L = cfg.encoder.encoder.latent_size
    if resume and ckpt.latest_step() is not None:
        tmpl = {"state": state._asdict(), "mu": jnp.zeros((L,)),
                "sigma": jnp.zeros((L,))}
        restored = ckpt.restore(tmpl)
        state = EncTrainState(**restored["state"])
        logger.log("resume", stage="encoder", step=int(state.step))

    def save(step, st, mu, sigma):
        ckpt.save(step, {"state": st._asdict(), "mu": mu, "sigma": sigma})

    model, state, (mu, sigma), loss = train_encoder(
        cfg.encoder, ad_state.codes, obs_xyz, obs_sdf, logger=logger,
        state=state, checkpoint_fn=save)
    save(int(state.step), state, mu, sigma)
    ckpt.close()
    logger.close()
    return model, state, (mu, sigma)


def load_encoder_state(exp_dir: str) -> tuple:
    from latent_diffusion_models_for_shape_sdfs_tpu.train.encoder import (
        EncTrainState, init_enc_state)
    from latent_diffusion_models_for_shape_sdfs_tpu.models.encoder import (
        LatentEncoder)
    cfg = ExperimentConfig.load(exp_dir)
    model = LatentEncoder(cfg.encoder.encoder)
    ckpt = StageCheckpointer(exp_dir, "encoder")
    tmpl_state = init_enc_state(cfg.encoder, model,
                                jax.random.PRNGKey(cfg.encoder.seed))
    L = cfg.encoder.encoder.latent_size
    tmpl = {"state": tmpl_state._asdict(), "mu": jnp.zeros((L,)),
            "sigma": jnp.zeros((L,))}
    restored = ckpt.restore(tmpl)
    ckpt.close()
    return (model, EncTrainState(**restored["state"]),
            (restored["mu"], restored["sigma"]))


# --------------------------------------------------------------- sampling


def _obs_cond_batch(obs_xyz: np.ndarray, obs_sdf: np.ndarray,
                    npts: int, num: int, seed: int) -> tuple:
    """One observation set [N,3]/[N] -> fixed-size conditioning batch
    (num, npts, 3)/(num, npts) for the PointNet partial-SDF encoder
    (subsample without replacement when N >= npts, else with)."""
    obs_xyz = np.asarray(obs_xyz, np.float32)
    obs_sdf = np.asarray(obs_sdf, np.float32)
    n = len(obs_xyz)
    rng = np.random.default_rng(seed)
    idx = (rng.permutation(n)[:npts] if n >= npts
           else rng.integers(0, n, npts))
    ox = jnp.broadcast_to(jnp.asarray(obs_xyz[idx]), (num, npts, 3))
    od = jnp.broadcast_to(jnp.asarray(obs_sdf[idx]), (num, npts))
    return ox, od


def run_sample(exp_dir: str, num: Optional[int] = None,
               res: Optional[int] = None, class_id: Optional[int] = None,
               seed: Optional[int] = None, use_ema: bool = True,
               write_meshes: bool = True,
               obs_xyz: Optional[np.ndarray] = None,
               obs_sdf: Optional[np.ndarray] = None,
               mesh_format: str = "obj",
               simplify_faces: Optional[int] = None,
               simplify_ratio: Optional[float] = None) -> list:
    """Sample latents with DDPM/DDIM, decode to meshes under <exp>/samples.
    Returns list of (verts, faces). `mesh_format`: "obj" or "ply"
    (binary little-endian, the lineage's output format).

    `obs_xyz [N,3]` / `obs_sdf [N]`: observed SDF samples of a target shape
    for partial-SDF-conditioned generation (BASELINE config 4) — requires a
    denoiser trained with `partial_sdf_cond=True`; the one observation set
    conditions all `num` samples."""
    cfg = ExperimentConfig.load(exp_dir)
    if obs_xyz is not None and not cfg.diff.denoiser.partial_sdf_cond:
        raise ValueError(
            "observations given but the denoiser was trained without "
            "partial_sdf_cond (set diff.denoiser.partial_sdf_cond=true)")
    lay = experiment_layout(exp_dir)
    sc = cfg.sample
    num = num or sc.num_samples
    res = res or sc.grid_res
    seed = sc.seed if seed is None else seed

    decoder, ad_state = load_ad_state(exp_dir)
    model, dstate, (mu, sigma) = load_diff_state(exp_dir)
    params = dstate.ema_params if use_ema else dstate.params
    schedule = DiffusionSchedule.create(cfg.diff.timesteps,
                                        cfg.diff.beta_start,
                                        cfg.diff.beta_end)
    cid = (jnp.full((num,), class_id, jnp.int32)
           if class_id is not None else None)
    cond_kwargs = {}
    if obs_xyz is not None:
        ox, od = _obs_cond_batch(obs_xyz, obs_sdf,
                                 cfg.diff.denoiser.partial_points, num, seed)
        cond_kwargs = {"obs_xyz": ox, "obs_sdf": od}
    fn = guided_denoise_fn(model.apply, params, sc.guidance_scale,
                           class_id=cid, **cond_kwargs)
    key = jax.random.PRNGKey(seed)
    L = cfg.diff.denoiser.latent_size
    if sc.sampler == "ddim":
        zn = ddim_sample(fn, schedule, key, num, L, steps=sc.ddim_steps)
    elif sc.sampler == "dpm":
        from latent_diffusion_models_for_shape_sdfs_tpu.diffusion. \
            sampler import dpm_solver_sample
        zn = dpm_solver_sample(fn, schedule, key, num, L,
                               steps=sc.dpm_steps)
    else:
        zn = ddpm_sample(fn, schedule, key, num, L)
    zs = unnormalize_codes(zn, mu, sigma)

    apply_fn = make_fast_apply(decoder, ad_state.params)
    out_dir = lay["samples"] if write_meshes else None
    return _decode_latents_to_meshes(apply_fn, zs, res, cfg,
                                     out_dir=out_dir, prefix="sample",
                                     mesh_format=mesh_format,
                                     simplify_faces=simplify_faces,
                                     simplify_ratio=simplify_ratio)


def _decode_latents_to_meshes(apply_fn, zs, res: int, cfg,
                              out_dir=None, prefix: str = "sample",
                              mesh_format: str = "obj",
                              simplify_faces=None,
                              simplify_ratio=None) -> list:
    """Decode a batch of latents to meshes; write <out_dir>/<prefix>_###
    files when out_dir is given. Returns list of (verts, faces).

    Hierarchical-eligible resolutions (>= 64, 16-divisible) use the
    production serving path: all decodes enqueued up front, only
    near-surface blocks cross to the host (serve.serve_meshes). The
    sparse payload reconstructs the same hierarchy as
    decode_grid_adaptive (same safety/caps/escalation); the int8
    payload preserves the program's crossing set exactly
    (sign-preserving quantization, ops.grid_eval
    decode_grid_hierarchical3_sparse2) and is ~6x less d2h than the
    dense-cap bf16 payload. In the fp32 lineage-parity mode
    (compute_dtype float32) the payload stays f32 so the output matches
    the dense decode bitwise.

    `simplify_faces` / `simplify_ratio`: optional LOD budget (native
    QEM decimation, ops.isosurface.simplify_mesh) applied per mesh."""
    sc = cfg.sample
    meshes = []

    def _emit(i, v, f):
        meshes.append((v, f))
        if out_dir is not None:
            meshio.write_mesh(
                out_dir / f"{prefix}_{i:03d}.{mesh_format}", v, f)

    # the serving path is an iso=0 design (active-block selection and
    # the int8 payload's clamp range are both centred on the zero
    # level); a non-zero iso_level keeps the dense/adaptive route below
    if sc.hierarchical and res >= 64 and res % 16 == 0 \
            and sc.iso_level == 0.0:
        from latent_diffusion_models_for_shape_sdfs_tpu.serve import (
            serve_meshes)
        payload_dtype = ("float32"
                         if cfg.ad.decoder.compute_dtype == "float32"
                         else "int8")
        for i, (v, f, _st) in enumerate(serve_meshes(
                apply_fn, list(zs), res=res, iso=sc.iso_level,
                out_dtype=payload_dtype, simplify_faces=simplify_faces,
                simplify_ratio=simplify_ratio)):
            _emit(i, v, f)
        return meshes
    for i in range(len(zs)):
        if sc.hierarchical:
            grid = decode_grid_adaptive(apply_fn, zs[i], res,
                                        chunk=sc.grid_chunk)
        else:
            grid = np.asarray(decode_grid(apply_fn, zs[i], res,
                                          chunk=sc.grid_chunk))
        v, f = extract_mesh(grid, iso=sc.iso_level)
        if simplify_faces is not None or simplify_ratio is not None:
            from latent_diffusion_models_for_shape_sdfs_tpu.ops. \
                isosurface import simplify_mesh
            v, f = simplify_mesh(v, f, target_faces=simplify_faces,
                                 ratio=simplify_ratio)
        _emit(i, v, f)
    return meshes


def run_interpolate(exp_dir: str, scene_a: int, scene_b: int,
                    steps: int = 8, res: Optional[int] = None,
                    mode: str = "lerp", name: str = "interp",
                    mesh_format: str = "obj",
                    simplify_faces: Optional[int] = None,
                    simplify_ratio: Optional[float] = None) -> list:
    """Latent-space shape morphing (the DeepSDF-lineage interpolation
    demo): decode meshes at `steps` evenly spaced latents on the path
    between two trained stage-1 codes.

    `mode`: "lerp" (straight line, the lineage convention) or "slerp"
    (great-circle path at interpolated norm — stays on the code shell
    when the two codes have similar norms, avoiding the low-norm
    midpoint washout lerp can produce between dissimilar shapes).
    Writes <exp>/interpolations/<name>_###.<mesh_format>; returns the
    list of (verts, faces)."""
    cfg = ExperimentConfig.load(exp_dir)
    lay = experiment_layout(exp_dir)
    res = res or cfg.sample.grid_res
    decoder, ad_state = load_ad_state(exp_dir)
    n_codes = int(ad_state.codes.shape[0])
    for s in (scene_a, scene_b):
        if not 0 <= s < n_codes:
            raise ValueError(f"scene id {s} out of range [0, {n_codes})")
    za = np.asarray(ad_state.codes[scene_a], np.float64)
    zb = np.asarray(ad_state.codes[scene_b], np.float64)
    t = np.linspace(0.0, 1.0, steps)[:, None]
    if mode == "slerp":
        na, nb = np.linalg.norm(za), np.linalg.norm(zb)
        ua, ub = za / na, zb / nb
        cos = float(np.clip(np.dot(ua, ub), -1.0, 1.0))
        omega = np.arccos(cos)
        if np.sin(omega) < 1e-6:
            # parallel (omega~0) or antiparallel (omega~pi): the
            # great-circle is degenerate/undefined — fall back to lerp
            zs = (1 - t) * za + t * zb
        else:
            arc = (np.sin((1 - t) * omega) * ua
                   + np.sin(t * omega) * ub) / np.sin(omega)
            zs = arc * ((1 - t) * na + t * nb)
    elif mode == "lerp":
        zs = (1 - t) * za + t * zb
    else:
        raise ValueError(f"unknown interpolation mode {mode!r}")
    apply_fn = make_fast_apply(decoder, ad_state.params)
    lay["interpolations"].mkdir(parents=True, exist_ok=True)
    return _decode_latents_to_meshes(
        apply_fn, jnp.asarray(zs, jnp.float32), res, cfg,
        out_dir=lay["interpolations"], prefix=name,
        mesh_format=mesh_format, simplify_faces=simplify_faces,
        simplify_ratio=simplify_ratio)


# ----------------------------------------------------------- render


def run_render(exp_dir: str, scene: int = 0,
               latent_file: Optional[str] = None,
               name: str = "render", size: int = 512,
               frames: int = 1, steps: int = 96) -> list:
    """Sphere-trace a trained latent straight off the decoder
    (ops.render) — no grid decode, no meshing — and write PNG previews
    under <exp>/renders/. `latent_file` (.npy, [L] or [k,L]: row 0)
    overrides `scene`. `frames` > 1 writes a turntable. Returns the
    list of written paths."""
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.render import (
        render_sdf, render_turntable)
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.image import (
        write_png)
    lay = experiment_layout(exp_dir)
    decoder, ad_state = load_ad_state(exp_dir)
    if latent_file is not None:
        z = np.asarray(np.load(latent_file), np.float32)
        z = z[0] if z.ndim == 2 else z
    else:
        n_codes = int(ad_state.codes.shape[0])
        if not 0 <= scene < n_codes:
            raise ValueError(f"scene id {scene} out of range [0, {n_codes})")
        z = ad_state.codes[scene]
    apply_fn = make_fast_apply(decoder, ad_state.params)
    lay["renders"].mkdir(parents=True, exist_ok=True)
    paths = []
    if frames <= 1:
        rgb, _ = render_sdf(apply_fn, z, width=size, height=size,
                            steps=steps)
        paths.append(lay["renders"] / f"{name}.png")
        write_png(paths[-1], rgb)
    else:
        for i, (rgb, _) in enumerate(render_turntable(
                apply_fn, z, frames=frames, width=size, height=size,
                steps=steps)):
            paths.append(lay["renders"] / f"{name}_{i:03d}.png")
            write_png(paths[-1], rgb)
    return paths


# ----------------------------------------------------------- reconstruct


def run_reconstruct(exp_dir: str, obs_xyz: np.ndarray, obs_sdf: np.ndarray,
                    name: str = "recon", res: Optional[int] = None,
                    mesh_format: str = "obj",
                    simplify_faces: Optional[int] = None,
                    simplify_ratio: Optional[float] = None,
                    diffusion_prior: bool = False,
                    sds_weight: float = 1e-3,
                    encoder: bool = False,
                    refine_steps: Optional[int] = None) -> tuple:
    """Latent-optimize against observations, decode, write mesh
    (`mesh_format`: "obj" or binary "ply"; optional QEM LOD budget).

    `diffusion_prior=True` regularizes the optimization with the trained
    stage-2 denoiser via score distillation instead of the isotropic
    Gaussian alone (reconstruct.reconstruct_latent_diffusion_prior) —
    requires a completed `train-diff` stage in the experiment.

    `encoder=True` replaces the cold start with the amortized encoder
    (requires a completed `train-encoder` stage): one forward pass
    predicts the latent, then `refine_steps` latent-opt steps polish it
    (0 = pure one-shot; None = the full cfg.reconstruct.num_steps budget,
    warm-started). Mutually exclusive with diffusion_prior.
    Returns (z, verts, faces)."""
    from latent_diffusion_models_for_shape_sdfs_tpu.reconstruct import (
        reconstruct_latent, reconstruct_latent_diffusion_prior)
    import dataclasses as _dc
    cfg = ExperimentConfig.load(exp_dir)
    lay = experiment_layout(exp_dir)
    res = res or cfg.sample.grid_res
    decoder, ad_state = load_ad_state(exp_dir)
    if encoder and diffusion_prior:
        raise ValueError("--encoder and --diffusion-prior are mutually "
                         "exclusive reconstruction modes")
    if encoder:
        from latent_diffusion_models_for_shape_sdfs_tpu.models.encoder \
            import encode_latent
        enc_model, enc_state, (emu, esig) = load_encoder_state(exp_dir)
        z = encode_latent(enc_model, enc_state.params,
                          jnp.asarray(obs_xyz, jnp.float32),
                          jnp.asarray(obs_sdf, jnp.float32), emu, esig)
        if refine_steps is None or refine_steps > 0:
            rcfg = cfg.reconstruct
            if refine_steps is not None:
                rcfg = _dc.replace(
                    rcfg, num_steps=refine_steps,
                    lr_decay_at=max(refine_steps // 2, 1))
            z, info = reconstruct_latent(decoder, ad_state.params,
                                         jnp.asarray(obs_xyz),
                                         jnp.asarray(obs_sdf),
                                         rcfg, z_init=z)
    elif diffusion_prior:
        model, dstate, (mu, sigma) = load_diff_state(exp_dir)
        schedule = DiffusionSchedule.create(cfg.diff.timesteps,
                                            cfg.diff.beta_start,
                                            cfg.diff.beta_end)
        fn = guided_denoise_fn(model.apply, dstate.ema_params, 0.0)
        z, info = reconstruct_latent_diffusion_prior(
            decoder, ad_state.params,
            jnp.asarray(obs_xyz), jnp.asarray(obs_sdf),
            fn, schedule, mu, sigma, cfg.reconstruct,
            sds_weight=sds_weight)
    else:
        z, info = reconstruct_latent(decoder, ad_state.params,
                                     jnp.asarray(obs_xyz),
                                     jnp.asarray(obs_sdf),
                                     cfg.reconstruct)
    apply_fn = make_fast_apply(decoder, ad_state.params)
    grid = np.asarray(decode_grid(apply_fn, z, res,
                                  chunk=cfg.sample.grid_chunk))
    v, f = extract_mesh(grid)
    if simplify_faces is not None or simplify_ratio is not None:
        from latent_diffusion_models_for_shape_sdfs_tpu.ops.isosurface \
            import simplify_mesh
        v, f = simplify_mesh(v, f, target_faces=simplify_faces,
                             ratio=simplify_ratio)
    meshio.write_mesh(lay["reconstructions"] / f"{name}.{mesh_format}", v, f)
    return z, v, f


# ------------------------------------------------------------------ eval


def run_eval(exp_dir: str, num_points: int = 30_000,
             fscore_tau: float = 0.01) -> dict:
    """Chamfer-L2 (+ F-score@tau, + normal consistency where GT normals
    exist) of each training scene's reconstruction-from-latent against
    its ground truth.

    GT surfaces: `analytic:` sources sample the closed-form surface
    (GT normals = exact SDF gradient); `sdf:` sources use the `surface`
    point array the native preprocess tool stores per scene (the
    lineage's SampleVisibleMeshSurface output, in the same normalized
    frame the decoder trains in; no stored normals, so NC is skipped)."""
    import json
    import pathlib as _pl
    from latent_diffusion_models_for_shape_sdfs_tpu.evaluation import (
        chamfer_l2, fscore, normal_consistency,
        sample_mesh_surface_with_normals, sdf_normals)
    cfg = ExperimentConfig.load(exp_dir)
    lay = experiment_layout(exp_dir)
    gt_normals = None
    if cfg.data_source.startswith("analytic:"):
        shapes = analytic.make_synthetic_split(
            cfg.data_source.split(":", 1)[1], cfg.ad.num_scenes,
            seed=cfg.ad.seed)

        def gt_normals(i, pts):
            return sdf_normals(lambda p: analytic.sdf(shapes[i], p), pts)

        def gt_points(i):
            return analytic.sample_surface(shapes[i], num_points,
                                           np.random.default_rng(i))
        n_scenes = len(shapes)
    elif cfg.data_source.startswith("sdf:"):
        files = sorted(_pl.Path(
            cfg.data_source.split(":", 1)[1]).glob("*.npz"))

        def gt_points(i):
            with np.load(files[i]) as z:
                if "surface" not in z.files:
                    raise ValueError(
                        f"{files[i]} has no 'surface' array; re-run the "
                        "native preprocess tool to store GT surface "
                        "samples for eval")
                return np.asarray(z["surface"], np.float32)[:num_points]
        n_scenes = len(files)
    else:
        raise ValueError(f"run_eval: no GT surface source for "
                         f"{cfg.data_source!r}")
    decoder, ad_state = load_ad_state(exp_dir)
    # a data dir can hold MORE files than the run trained codes for
    # (files added later / superset dir); JAX's clamping gather would
    # silently reuse the last code for out-of-range scenes — evaluate
    # only the scenes that actually have a trained latent
    n_scenes = min(n_scenes, int(ad_state.codes.shape[0]))
    apply_fn = make_fast_apply(decoder, ad_state.params)
    results = {}
    f_results = {}
    nc_results = {}
    for i in range(n_scenes):
        grid = np.asarray(decode_grid(apply_fn, ad_state.codes[i],
                                      cfg.sample.grid_res,
                                      chunk=cfg.sample.grid_chunk))
        v, f = extract_mesh(grid)
        if len(f) == 0:
            results[str(i)] = float("inf")
            f_results[str(i)] = 0.0
            continue
        pred, pred_nrm = sample_mesh_surface_with_normals(
            v, f, num_points, seed=i)
        gt = gt_points(i)
        results[str(i)] = chamfer_l2(pred, gt)
        f_results[str(i)] = fscore(pred, gt, tau=fscore_tau)["fscore"]
        if gt_normals is not None:
            nc_results[str(i)] = normal_consistency(
                pred, pred_nrm, gt, gt_normals(i, gt))
    finite = [x for x in results.values() if np.isfinite(x)]
    out = {"chamfer_l2": results,
           "mean": float(np.mean(finite)) if finite else float("inf"),
           "num_failed": len(results) - len(finite),
           "fscore_tau": fscore_tau,
           "fscore": f_results,
           "fscore_mean": float(np.mean(list(f_results.values())))}
    if nc_results:
        out["normal_consistency"] = nc_results
        out["normal_consistency_mean"] = float(
            np.mean(list(nc_results.values())))
    lay["evals"].mkdir(parents=True, exist_ok=True)
    (lay["evals"] / "chamfer.json").write_text(json.dumps(out, indent=2))
    return out
