"""Mesh construction + AOT sharding-spec assertions (SURVEY.md s4.5b).

A single-device host can't execute 8-way programs, but it CAN lower them:
`jax.sharding.AbstractMesh` + `.trace(...).lower(lowering_platforms)`
produces StableHLO whose `sdy.sharding` annotations pin the production
shardings of the DP train step, sharded DDIM, and point-sharded decode on
abstract 8-device and 2x4 ('dcn','data') topologies — catching sharding
regressions with zero devices."""

import re
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import AbstractMesh

from latent_diffusion_models_for_shape_sdfs_tpu.config import (
    AdConfig, DecoderConfig)
from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import SdfDecoder
from latent_diffusion_models_for_shape_sdfs_tpu.parallel.mesh import (
    DATA_AXIS, batch_sharded, make_mesh, make_mesh_2level)
from latent_diffusion_models_for_shape_sdfs_tpu.parallel.dp import (
    make_decode_points_fn, make_dp_ad_train_step, make_dp_ddim_fn)


# ------------------------------------------------- mesh construction


def test_flat_mesh_axes():
    mesh = make_mesh()
    assert mesh.axis_names == (DATA_AXIS,)
    assert mesh.devices.size == len(jax.devices())


def test_flat_mesh_too_many_devices_raises():
    with pytest.raises(ValueError, match="need"):
        make_mesh(len(jax.devices()) + 1)


def test_two_level_mesh_axes():
    n = len(jax.devices())
    if n < 2:
        mesh = make_mesh_2level(1, 1)
        assert mesh.axis_names == ("dcn", "data")
        assert mesh.devices.shape == (1, 1)
    else:
        mesh = make_mesh_2level(2, n // 2)
        assert mesh.devices.shape == (2, n // 2)


# ------------------------------------------------- AOT sharding specs


def _tiny_cfg(scenes_per_batch=8):
    return AdConfig(
        decoder=DecoderConfig(latent_size=16, hidden_dim=32, num_layers=4,
                              latent_in=(2,), use_dropout=False),
        num_scenes=scenes_per_batch, scenes_per_batch=scenes_per_batch,
        samples_per_scene=64)


def _lower_tpu(jitted, *args) -> str:
    return jitted.trace(*args).lower(lowering_platforms=("tpu",)).as_text()


def _shardings_of(txt: str) -> list:
    """All #sdy.sharding specs annotating the main function's arguments and
    results, as strings like '[{"data"}, {}]'."""
    return re.findall(r'#sdy\.sharding<@mesh, (\[[^\]]*\])>', txt)


def _has_annot(txt: str, ttype: str, spec: str) -> bool:
    """True if a tensor of `ttype` is annotated with the sdy sharding
    `spec` (result annotations carry jax.result_info before sdy.sharding,
    so match any attributes in between, same line)."""
    pat = (re.escape(f"tensor<{ttype}>") + r" \{[^\n]*?sdy\.sharding = "
           + re.escape(f"#sdy.sharding<@mesh, {spec}>"))
    return re.search(pat, txt) is not None


ABSTRACT_TOPOLOGIES = [
    pytest.param(AbstractMesh((8,), (DATA_AXIS,)), '{"data"}', id="1x8"),
    pytest.param(AbstractMesh((2, 4), ("dcn", DATA_AXIS)), '{"dcn", "data"}',
                 id="2x4"),
]


@pytest.mark.parametrize("amesh,batch_axes", ABSTRACT_TOPOLOGIES)
def test_dp_train_step_shardings(amesh, batch_axes):
    cfg = _tiny_cfg()
    decoder = SdfDecoder(cfg.decoder)
    from latent_diffusion_models_for_shape_sdfs_tpu.train.auto_decoder import (
        init_ad_state)
    # eval_shape: the whole state as ShapeDtypeStructs, zero execution
    state = jax.eval_shape(partial(init_ad_state, cfg, decoder),
                           jax.random.PRNGKey(0))
    S, P = cfg.scenes_per_batch, cfg.samples_per_scene
    ids = jax.ShapeDtypeStruct((S,), jnp.int32)
    xyz = jax.ShapeDtypeStruct((S, P, 3), jnp.float32)
    sdf = jax.ShapeDtypeStruct((S, P), jnp.float32)
    epoch = jax.ShapeDtypeStruct((), jnp.float32)
    key = jax.eval_shape(lambda: jax.random.PRNGKey(0))

    step = make_dp_ad_train_step(decoder, cfg, amesh)
    txt = _lower_tpu(step, state, ids, xyz, sdf, epoch, key)

    # batch inputs sharded over every mesh axis; state stays replicated
    assert _has_annot(txt, f"{S}xi32", f"[{batch_axes}]"), \
        "scene_ids not batch-sharded"
    assert _has_annot(txt, f"{S}x{P}x3xf32", f"[{batch_axes}, {{}}, {{}}]"), \
        "xyz not batch-sharded"
    assert _has_annot(txt, f"{S}x{P}xf32", f"[{batch_axes}, {{}}]"), \
        "sdf not batch-sharded"
    # no param/table/opt tensor may be batch-sharded: every annotated spec
    # either is one of the 3 batch inputs or carries no mesh axes
    others = [s for s in _shardings_of(txt) if batch_axes not in s]
    assert all(('"' not in s) for s in others), others


@pytest.mark.parametrize("amesh,batch_axes", ABSTRACT_TOPOLOGIES)
def test_dp_train_step_shardings_pallas(amesh, batch_axes):
    """The use_pallas production mode lowers under the mesh: the fused
    train kernel sits inside an sdy.manual_computation (shard_map — a
    bare GSPMD jit has no partitioning rule for pallas_call), batch
    inputs are sharded, and no param/table/opt tensor is batch-sharded
    (VERDICT r3 #1c)."""
    from latent_diffusion_models_for_shape_sdfs_tpu.config import override
    from latent_diffusion_models_for_shape_sdfs_tpu.train.auto_decoder import (
        init_ad_state)
    cfg = override(_tiny_cfg(), use_pallas=True, samples_per_scene=256)
    decoder = SdfDecoder(cfg.decoder)
    state = jax.eval_shape(partial(init_ad_state, cfg, decoder),
                           jax.random.PRNGKey(0))
    S, P = cfg.scenes_per_batch, cfg.samples_per_scene
    ids = jax.ShapeDtypeStruct((S,), jnp.int32)
    xyz = jax.ShapeDtypeStruct((S, P, 3), jnp.float32)
    sdf = jax.ShapeDtypeStruct((S, P), jnp.float32)
    epoch = jax.ShapeDtypeStruct((), jnp.float32)
    key = jax.eval_shape(lambda: jax.random.PRNGKey(0))

    step = make_dp_ad_train_step(decoder, cfg, amesh)
    txt = _lower_tpu(step, state, ids, xyz, sdf, epoch, key)

    assert "sdy.manual_computation" in txt, \
        "pallas path did not lower through shard_map"
    assert _has_annot(txt, f"{S}xi32", f"[{batch_axes}]"), \
        "scene_ids not batch-sharded"
    assert _has_annot(txt, f"{S}x{P}x3xf32", f"[{batch_axes}, {{}}, {{}}]"), \
        "xyz not batch-sharded"
    assert _has_annot(txt, f"{S}x{P}xf32", f"[{batch_axes}, {{}}]"), \
        "sdf not batch-sharded"
    others = [s for s in _shardings_of(txt) if batch_axes not in s]
    assert all(('"' not in s) for s in others), others


@pytest.mark.parametrize("amesh,batch_axes", ABSTRACT_TOPOLOGIES)
def test_dp_sparse_decode_pallas_apply_lowers(amesh, batch_axes):
    """The sharded sparse serving decode lowers with the fused Pallas
    EVAL kernel as apply_fn (shape axis manual over the mesh)."""
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.pallas_kernels import (
        make_pallas_apply)
    from latent_diffusion_models_for_shape_sdfs_tpu.parallel.dp import (
        make_dp_sparse_decode_fn)
    cfg = _tiny_cfg()
    decoder = SdfDecoder(cfg.decoder)
    params = jax.tree.map(np.asarray, decoder.init_params(
        jax.random.PRNGKey(0)))
    pap = make_pallas_apply(decoder, params, tile=1024)
    S = 16
    fn = make_dp_sparse_decode_fn(pap, 32, S, amesh, (8, 512, 4096))
    zs = jax.ShapeDtypeStruct((S, cfg.decoder.latent_size), jnp.float32)
    txt = _lower_tpu(fn, zs)
    assert "sdy.manual_computation" in txt
    assert _has_annot(txt, f"{S}x{cfg.decoder.latent_size}xf32",
                      f"[{batch_axes}, {{}}]"), "latent batch not sharded"


@pytest.mark.parametrize("amesh,batch_axes", ABSTRACT_TOPOLOGIES)
def test_dp_ddim_out_sharding(amesh, batch_axes):
    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.schedule import (
        DiffusionSchedule)
    schedule = DiffusionSchedule.create(16)
    num, L = 16, 8
    fn = make_dp_ddim_fn(lambda z, t: 0.1 * z, schedule, num, L, amesh,
                         steps=4)
    key = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    txt = _lower_tpu(fn, key)
    assert _has_annot(txt, f"{num}x{L}xf32", f"[{batch_axes}, {{}}]"), \
        "z0 output not batch-sharded"
    # the DPM-Solver++(2M) scan body is elementwise per latent too:
    # identical batch sharding must lower
    fn2 = make_dp_ddim_fn(lambda z, t: 0.1 * z, schedule, num, L, amesh,
                          steps=4, sampler="dpm")
    txt2 = _lower_tpu(fn2, key)
    assert _has_annot(txt2, f"{num}x{L}xf32", f"[{batch_axes}, {{}}]"), \
        "dpm z0 output not batch-sharded"


@pytest.mark.parametrize("amesh,batch_axes", ABSTRACT_TOPOLOGIES)
def test_decode_points_shardings(amesh, batch_axes):
    cfg = _tiny_cfg()
    decoder = SdfDecoder(cfg.decoder)
    # host-numpy params -> plain constants in the lowered module
    params = jax.tree.map(np.asarray, decoder.init_params(
        jax.random.PRNGKey(0)))

    def apply_fn(z, xyz):
        zz = jnp.broadcast_to(z, xyz.shape[:-1] + z.shape)
        return decoder.apply({"params": params}, zz, xyz, train=False)

    run = make_decode_points_fn(apply_fn, amesh)
    N = 256
    z = jax.ShapeDtypeStruct((cfg.decoder.latent_size,), jnp.float32)
    pts = jax.ShapeDtypeStruct((N, 3), jnp.float32)
    txt = _lower_tpu(run, z, pts)
    assert _has_annot(txt, f"{N}x3xf32", f"[{batch_axes}, {{}}]"), \
        "points not sharded"
    assert _has_annot(txt, f"{N}xf32", f"[{batch_axes}]"), \
        "values not sharded"


@pytest.mark.parametrize("amesh,batch_axes", ABSTRACT_TOPOLOGIES)
def test_dp_sparse_serving_shardings(amesh, batch_axes):
    """The sharded mesh-serving decode keeps every payload tensor sharded
    on the SHAPE axis end to end (parallel.dp.make_dp_sparse_decode_fn)."""
    from latent_diffusion_models_for_shape_sdfs_tpu.parallel.dp import (
        make_dp_sparse_decode_fn)

    def apply_fn(z, xyz):
        return jnp.sqrt(jnp.sum(xyz * xyz, axis=-1)) - (0.3 + 0.1 * z[0])

    S, L, res = 16, 8, 64
    cap1, cap2, cap3 = 64, 512, 2048
    fn = make_dp_sparse_decode_fn(apply_fn, res, S, amesh,
                                  (cap1, cap2, cap3))
    zs = jax.ShapeDtypeStruct((S, L), jnp.float32)
    txt = _lower_tpu(fn, zs)
    nb1 = res // 16
    assert _has_annot(txt, f"{S}x{L}xf32", f"[{batch_axes}, {{}}]"), \
        "latent batch not sharded"
    assert _has_annot(txt, f"{S}x{nb1 ** 3}xi8",
                      f"[{batch_axes}, {{}}]"), "coarse cascade not sharded"
    assert _has_annot(txt, f"{S}x{cap1}x64xi8",
                      f"[{batch_axes}, {{}}, {{}}]"), \
        "c2 cascade rows not sharded"
    assert _has_annot(txt, f"{S}x{cap2}x64xi8",
                      f"[{batch_axes}, {{}}, {{}}]"), \
        "payload rows not sharded"
    assert _has_annot(txt, f"{S}x{cap2}xi32", f"[{batch_axes}, {{}}]"), \
        "payload ids not sharded"
