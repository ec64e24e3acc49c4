"""1-device-mesh execution tests for the sharded EVAL-side paths
(VERDICT r4 weak #6).

The composed Pallas-kernel-under-shard_map paths are proven bitwise on
the 8-CPU sim (interpret mode, tests/test_dp_cpu.py) and AOT-lowered on
abstract meshes (tests/test_mesh.py) — but interpret mode never runs
Mosaic, and AOT never executes. The fused TRAIN kernel already has a
1-device-mesh execution test (tests/test_fused_train.py::
test_dp_pallas_on_one_device_mesh_matches_fused); these are its
eval-side siblings: on the TPU suite run each test executes the REAL
Mosaic kernel inside an sdy manual computation — the only mesh size the
single CI chip can execute — for the point-sharded eval kernel, the
point-sharded pairs evaluator driving the flat batched decode, and the
shape-sharded sparse serving payload. On CPU they run the same
composition in interpret mode (subset of test_dp_cpu coverage; kept so
the file is suite-portable).
"""

import numpy as np
import jax
import jax.numpy as jnp

from latent_diffusion_models_for_shape_sdfs_tpu.config import DecoderConfig
from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import (
    SdfDecoder)
from latent_diffusion_models_for_shape_sdfs_tpu.ops.pallas_kernels import (
    make_pallas_apply, make_pallas_apply_pairs)
from latent_diffusion_models_for_shape_sdfs_tpu.parallel.mesh import (
    make_mesh)

_CFG = DecoderConfig(latent_size=16, hidden_dim=128, num_layers=3,
                     latent_in=(2,), use_dropout=False)


def _decoder(seed=0):
    dec = SdfDecoder(_CFG)
    params = dec.init_params(jax.random.PRNGKey(seed))
    return dec, params


def test_decode_points_sharded_one_device_matches_kernel():
    """shard_map(point axis) around the fused eval kernel on a 1-device
    mesh == the bare kernel (no communication, identical program)."""
    from latent_diffusion_models_for_shape_sdfs_tpu.parallel.dp import (
        decode_points_sharded)
    dec, params = _decoder()
    apply_fn = make_pallas_apply(dec, params, tile=1024)
    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.normal(size=_CFG.latent_size).astype(np.float32)
                    / np.sqrt(_CFG.latent_size))
    xyz = jnp.asarray(rng.uniform(-1, 1, (4096, 3)).astype(np.float32))
    mesh = make_mesh(1)
    got = np.asarray(decode_points_sharded(apply_fn, z, xyz, mesh))
    # jitted oracle: the eager kernel differs by 1 ULP on CPU (fusion
    # rounding); the sharded program is bitwise-equal to the jitted one
    want = np.asarray(jax.jit(apply_fn)(z, xyz))
    np.testing.assert_array_equal(got, want)


def test_flat_decode_dp_pairs_one_device_matches_unsharded():
    """decode_grid_hierarchical3_batch_flat driven by the point-sharded
    pairs kernel on a 1-device mesh == the unsharded flat decode
    (per-point evals are independent; sharding the compacted work list
    changes nothing). On TPU this Mosaic-executes the pairs kernel
    under shard_map — the composition test_dp_cpu only covers in
    interpret mode."""
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_hierarchical3_batch_flat)
    from latent_diffusion_models_for_shape_sdfs_tpu.parallel.dp import (
        make_dp_pairs_fn)
    dec, params = _decoder(seed=3)
    pairs_k = make_pallas_apply_pairs(dec, params, tile=1024)
    zrows = 0.05 * jax.random.normal(jax.random.PRNGKey(33),
                                     (4, _CFG.latent_size))
    # untrained decoder => near-flat SDF: FULL caps (res=32: 4x8 l1 /
    # x64 l2 / x8 l3) so nothing overflows whatever the surface is
    caps = (32, 2048, 16384)
    g1, st1 = decode_grid_hierarchical3_batch_flat(
        pairs_k, zrows, 32, 16, 4, 2, *caps)
    mesh = make_mesh(1)
    gdp, stdp = decode_grid_hierarchical3_batch_flat(
        make_dp_pairs_fn(pairs_k, mesh), zrows, 32, 16, 4, 2, *caps)
    assert not st1["capacity_exceeded"] and not stdp["capacity_exceeded"]
    assert st1["active_l3"] == stdp["active_l3"]
    np.testing.assert_array_equal(np.asarray(gdp), np.asarray(g1))


def test_sparse_serving_one_device_matches_unsharded_payload():
    """make_dp_sparse_decode_fn on a 1-device mesh == the unsharded
    sparse2 decode vmapped over the batch, payload-bitwise (int8
    quantized values, index tables, and per-level counts)."""
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        _MAX_POINTS_PER_GROUP, _decode_grid_hier3_impl)
    from latent_diffusion_models_for_shape_sdfs_tpu.parallel.dp import (
        make_dp_sparse_decode_fn)
    dec, params = _decoder(seed=7)
    apply_fn = make_pallas_apply(dec, params, tile=1024)
    batch, res = 2, 32
    caps = (16, 1024, 8192)
    zs = 0.05 * jax.random.normal(jax.random.PRNGKey(11),
                                  (batch, _CFG.latent_size))
    mesh = make_mesh(1)
    fn = make_dp_sparse_decode_fn(apply_fn, res, batch, mesh, caps)
    (c1, c2, i1, v2, i2), (n1, n2, n3) = fn(zs)

    ppg = max(8, _MAX_POINTS_PER_GROUP // batch)  # mirrors the factory

    def one(zz):
        (a, b, c, d, e), m1, m2, m3 = _decode_grid_hier3_impl(
            apply_fn, zz, res, 16, 4, 2, *caps, safety=1.2, safety3=2.0,
            layout="sparse2", points_per_group=ppg, out_dtype="int8")
        return (a, b, c, d, e), (m1, m2, m3)

    (c1r, c2r, i1r, v2r, i2r), (n1r, n2r, n3r) = jax.jit(jax.vmap(one))(zs)
    for got, want in ((c1, c1r), (c2, c2r), (i1, i1r), (v2, v2r),
                      (i2, i2r), (n1, n1r), (n2, n2r), (n3, n3r)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
