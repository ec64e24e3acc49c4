"""Grid decode paths: on-device coordinate synthesis vs host lattice,
batch variant, and hierarchical-vs-dense agreement near the surface."""

import numpy as np
import jax.numpy as jnp

from latent_diffusion_models_for_shape_sdfs_tpu.data import analytic
from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
    make_grid_points, decode_grid, decode_grid_batch,
    decode_grid_hierarchical)


def _sphere_apply(z, xyz):
    # analytic 'decoder': radius comes from the latent's first entry
    # contract: z [L] single latent, xyz [N,3]
    return jnp.linalg.norm(xyz, axis=-1) - z[0]


def test_decode_grid_matches_host_lattice():
    res = 33
    z = jnp.asarray([0.5, 0.0])
    grid = np.asarray(decode_grid(_sphere_apply, z, res, chunk=4096))
    ref = analytic.sdf({"type": "sphere", "r": 0.5},
                       make_grid_points(res)).reshape(res, res, res)
    np.testing.assert_allclose(grid, ref, atol=1e-5)


def test_decode_grid_nondivisible_chunk():
    res = 17  # 4913 points, chunk 1000 -> ragged tail
    z = jnp.asarray([0.4])
    grid = np.asarray(decode_grid(_sphere_apply, z, res, chunk=1000))
    ref = analytic.sdf({"type": "sphere", "r": 0.4},
                       make_grid_points(res)).reshape(res, res, res)
    np.testing.assert_allclose(grid, ref, atol=1e-5)


def test_decode_grid_batch():
    res = 17
    zs = jnp.asarray([[0.3], [0.5], [0.7]])
    grids = np.asarray(decode_grid_batch(_sphere_apply, zs, res, chunk=2048))
    assert grids.shape == (3, res, res, res)
    for i, r in enumerate((0.3, 0.5, 0.7)):
        ref = analytic.sdf({"type": "sphere", "r": r},
                           make_grid_points(res)).reshape(res, res, res)
        np.testing.assert_allclose(grids[i], ref, atol=1e-5)


def test_hier2_device_matches_dense_at_crossings():
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_hierarchical2_device, unblock_grid)
    res = 64
    z = jnp.asarray([0.45])
    dense = np.asarray(decode_grid(_sphere_apply, z, res, chunk=8192))
    gx, st = decode_grid_hierarchical2_device(_sphere_apply, z, res, 16, 4,
                                              64, 1024, safety=1.2,
                                              layout="xmajor")
    assert not st["capacity_exceeded"], st
    gb, _ = decode_grid_hierarchical2_device(_sphere_apply, z, res, 16, 4,
                                             64, 1024, safety=1.2,
                                             layout="block")
    np.testing.assert_array_equal(unblock_grid(np.asarray(gb), res, 4),
                                  np.asarray(gx))
    # every voxel adjacent to a sign change must carry the exact fine value
    sign = dense < 0
    crossing = np.zeros_like(sign)
    for ax in range(3):
        d = np.diff(sign, axis=ax)
        sl = [slice(None)] * 3
        sl[ax] = slice(0, -1)
        crossing[tuple(sl)] |= d.astype(bool)
        sl[ax] = slice(1, None)
        crossing[tuple(sl)] |= d.astype(bool)
    np.testing.assert_allclose(np.asarray(gx)[crossing], dense[crossing],
                               atol=1e-5)
    # far cells keep correct signs (no spurious surfaces)
    far = np.abs(dense) > 0.1
    assert np.all(np.sign(np.asarray(gx)[far]) == np.sign(dense[far]))


def test_hier2_batch_matches_single():
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_hierarchical2_batch, decode_grid_hierarchical2_device)
    res = 32
    zs = jnp.asarray([[0.35], [0.5], [0.62]])
    gb, st = decode_grid_hierarchical2_batch(_sphere_apply, zs, res, 16, 4,
                                             8, 512, safety=1.2,
                                             layout="block")
    assert not st["capacity_exceeded"], st
    for i in range(3):
        g1, _ = decode_grid_hierarchical2_device(
            _sphere_apply, zs[i], res, 16, 4, 8, 512, safety=1.2,
            layout="block", check_overflow=False)
        np.testing.assert_allclose(np.asarray(gb[i]), np.asarray(g1),
                                   atol=1e-5)


def test_hier3_batch_matches_single():
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_hierarchical3_batch, decode_grid_hierarchical3_device)
    res = 32
    zs = jnp.asarray([[0.35], [0.5], [0.62]])
    gb, st = decode_grid_hierarchical3_batch(_sphere_apply, zs, res, 16, 4,
                                             2, 8, 512, 2048, safety=1.2,
                                             safety3=2.0, layout="block")
    assert not st["capacity_exceeded"], st
    for i in range(3):
        g1, _ = decode_grid_hierarchical3_device(
            _sphere_apply, zs[i], res, 16, 4, 2, 8, 512, 2048, safety=1.2,
            safety3=2.0, layout="block", check_overflow=False)
        np.testing.assert_allclose(np.asarray(gb[i]), np.asarray(g1),
                                   atol=1e-5)


def test_hier3_batch_crossing_exact_vs_dense():
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_hierarchical3_batch, unblock_grid)
    res = 32
    zs = jnp.asarray([[0.4], [0.55]])
    gb, st = decode_grid_hierarchical3_batch(_sphere_apply, zs, res, 16, 4,
                                             2, 8, 512, 2048, safety=1.2,
                                             safety3=2.0, layout="block")
    assert not st["capacity_exceeded"], st
    for i in range(2):
        dense = np.asarray(decode_grid(_sphere_apply, zs[i], res,
                                       chunk=8192))
        hier = unblock_grid(np.asarray(gb[i]), res, 4)
        sign = dense < 0
        crossing = np.zeros_like(sign)
        for ax in range(3):
            d = np.diff(sign, axis=ax)
            sl = [slice(None)] * 3
            sl[ax] = slice(0, -1)
            crossing[tuple(sl)] |= d.astype(bool)
            sl[ax] = slice(1, None)
            crossing[tuple(sl)] |= d.astype(bool)
        np.testing.assert_allclose(hier[crossing], dense[crossing],
                                   atol=1e-5)
        far = np.abs(dense) > 0.1
        assert np.all(np.sign(hier[far]) == np.sign(dense[far]))


def _sphere_pairs_apply(zrows, xyz):
    # pairs 'decoder': per-point latent rows [N, L]; heterogeneous
    # radius (row 0) and center (rows 1:4) so per-shape active counts
    # genuinely differ across the batch
    return jnp.linalg.norm(xyz - zrows[:, 1:4], axis=-1) - zrows[:, 0]


def _sphere_het_apply(z, xyz):
    return jnp.linalg.norm(xyz - z[1:4], axis=-1) - z[0]


def _het_zs(S=5, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.stack(
        [np.concatenate([[0.25 + 0.3 * i / S], rng.uniform(-0.2, 0.2, 3)])
         for i in range(S)]).astype(np.float32))


def test_hier3_flat_matches_vmapped_batch():
    """The flattened batched decode (global cross-shape compaction) must
    reproduce the vmapped path's grids on a heterogeneous batch while
    doing strictly fewer padded evaluations."""
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_hierarchical3_batch, decode_grid_hierarchical3_batch_flat,
        probe_flat_caps)
    res, zs = 64, _het_zs()
    gv, stv = decode_grid_hierarchical3_batch(
        _sphere_het_apply, zs, res, 16, 4, 2, 64, 512, 4096, safety=1.2,
        safety3=2.0, layout="block")
    assert not stv["capacity_exceeded"], stv
    c1, c2, c3 = probe_flat_caps(_sphere_pairs_apply, zs, res)
    gf, stf = decode_grid_hierarchical3_batch_flat(
        _sphere_pairs_apply, zs, res, 16, 4, 2, c1, c2, c3, safety=1.2,
        safety3=2.0)
    assert not stf["capacity_exceeded"], stf
    # fp32 analytic evaluator -> same taus, same selections, same values
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gv), atol=1e-6)
    # flat pads the SUM of actives (+25%), vmap pads S * max
    assert stf["fine_evals"] < zs.shape[0] * stv["cap3"] * 8
    # per-shape L1 actives reported for observability
    assert int(np.sum(stf["per_shape_l1"])) == stf["active_l1"]


def test_hier3_flat_int8_sign_pattern():
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_hierarchical3_batch_flat, probe_flat_caps)
    res, zs = 32, _het_zs(3, seed=1)
    c1, c2, c3 = probe_flat_caps(_sphere_pairs_apply, zs, res)
    gf, _ = decode_grid_hierarchical3_batch_flat(
        _sphere_pairs_apply, zs, res, 16, 4, 2, c1, c2, c3,
        safety=1.2, safety3=2.0)
    gq, _ = decode_grid_hierarchical3_batch_flat(
        _sphere_pairs_apply, zs, res, 16, 4, 2, c1, c2, c3,
        safety=1.2, safety3=2.0, out_dtype="int8")
    f, q = np.asarray(gf), np.asarray(gq)
    # sign-preserving quantization: identical crossing-relevant signs
    assert np.array_equal(np.signbit(f), q < 0)


def test_hier3_flat_overflow_detected():
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_hierarchical3_batch_flat)
    res, zs = 32, _het_zs(3, seed=2)
    _, st = decode_grid_hierarchical3_batch_flat(
        _sphere_pairs_apply, zs, res, 16, 4, 2, 4, 16, 32,
        safety=1.2, safety3=2.0)
    assert st["capacity_exceeded"]


def test_hier2_capacity_overflow_detected():
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_hierarchical2_device)
    _, st = decode_grid_hierarchical2_device(_sphere_apply,
                                             jnp.asarray([0.5]), 32, 16, 4,
                                             8, 16, safety=1.5)
    assert st["capacity_exceeded"]  # 16 sub-blocks can't cover the sphere


def test_hierarchical_agrees_near_surface_and_skips_far():
    res = 64
    z = jnp.asarray([0.45])
    dense = np.asarray(decode_grid(_sphere_apply, z, res, chunk=8192))
    hier, stats = decode_grid_hierarchical(_sphere_apply, z, res, block=8)
    # exact agreement wherever the dense field is near the surface
    near = np.abs(dense) < 0.04
    np.testing.assert_allclose(hier[near], dense[near], atol=1e-5)
    # far cells keep the correct sign (so isosurfacing is unaffected)
    assert np.all(np.sign(hier[~near]) == np.sign(dense[~near]))
    # and real work was skipped
    assert stats["active_blocks"] < stats["total_blocks"]
    assert stats["fine_evals"] < res ** 3


def test_decode_grid_adaptive_end_to_end():
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_adaptive)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.isosurface import (
        marching_tetrahedra)
    z = jnp.asarray([0.5])
    grid = decode_grid_adaptive(_sphere_apply, z, 64)
    assert grid.shape == (64, 64, 64)
    v, f = marching_tetrahedra(grid)
    r = np.linalg.norm(v, axis=1)
    assert np.abs(r - 0.5).max() < 2.0 / 63
    # non-divisible / small res falls back to dense
    g2 = decode_grid_adaptive(_sphere_apply, z, 33)
    ref = analytic.sdf({"type": "sphere", "r": 0.5},
                       make_grid_points(33)).reshape(33, 33, 33)
    np.testing.assert_allclose(g2, ref, atol=1e-5)


def test_hier3_device_matches_dense_at_crossings():
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_hierarchical3_device, unblock_grid)
    res = 64
    z = jnp.asarray([0.45])
    dense = np.asarray(decode_grid(_sphere_apply, z, res, chunk=8192))
    gx, st = decode_grid_hierarchical3_device(
        _sphere_apply, z, res, 16, 4, 2, 64, 1024, 4096, safety=1.2,
        layout="xmajor")
    assert not st["capacity_exceeded"], st
    # block layout agrees with x-major
    gb, _ = decode_grid_hierarchical3_device(
        _sphere_apply, z, res, 16, 4, 2, 64, 1024, 4096, safety=1.2,
        layout="block")
    np.testing.assert_array_equal(unblock_grid(np.asarray(gb), res, 4),
                                  np.asarray(gx))
    # every voxel adjacent to a sign change carries the exact fine value
    sign = dense < 0
    crossing = np.zeros_like(sign)
    for ax in range(3):
        d = np.diff(sign, axis=ax)
        sl = [slice(None)] * 3
        sl[ax] = slice(0, -1)
        crossing[tuple(sl)] |= d.astype(bool)
        sl[ax] = slice(1, None)
        crossing[tuple(sl)] |= d.astype(bool)
    np.testing.assert_allclose(np.asarray(gx)[crossing], dense[crossing],
                               atol=1e-5)
    # far cells keep correct signs; real work was skipped at every level
    far = np.abs(dense) > 0.1
    assert np.all(np.sign(np.asarray(gx)[far]) == np.sign(dense[far]))
    # fine evals actually spent are far below densely evaluating every
    # selected b2 block (the 2-level path's cost)
    assert st["active_l3"] * 8 < st["cap2"] * 64


def test_hier3_bf16_preserves_crossings():
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_hierarchical3_device, unblock_grid)
    res = 64
    z = jnp.asarray([0.45])
    dense = np.asarray(decode_grid(_sphere_apply, z, res, chunk=8192))
    gb, st = decode_grid_hierarchical3_device(
        _sphere_apply, z, res, 16, 4, 2, 64, 1024, 4096, safety=1.2,
        layout="block", out_dtype="bfloat16")
    assert not st["capacity_exceeded"], st
    hier = unblock_grid(np.asarray(gb, np.float32), res, 4)
    sd, sh = dense <= 0, hier <= 0
    for ax in range(3):
        d = np.diff(sd, axis=ax)
        h = np.diff(sh, axis=ax)
        assert not (d & ~h).any(), f"axis {ax}: bf16 grid lost crossings"


def test_eval_blocks_empty_active_set():
    # K=0 (e.g. a zero cap) must yield an empty [0, b^3] result, not a
    # ZeroDivisionError in the group balancing.
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        _eval_blocks)

    def apply_fn(z, xyz):
        return jnp.sqrt(jnp.sum(xyz * xyz, axis=-1)) - 0.4

    out = _eval_blocks(apply_fn, jnp.zeros((2,)),
                       jnp.zeros((0,), jnp.int32), 64, 4)
    assert out.shape == (0, 64)


def test_int4_requires_even_fine_row():
    # odd b2 -> odd row length -> nibble pairing impossible; must be an
    # explicit error, not a shape crash deep inside jit
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_hierarchical3_sparse2)

    def apply_fn(z, xyz):
        return jnp.sqrt(jnp.sum(xyz * xyz, axis=-1)) - 0.4

    with np.testing.assert_raises(ValueError):
        decode_grid_hierarchical3_sparse2(
            apply_fn, jnp.zeros((2,)), 48, 12, 3, 1, 64, 512, 2048,
            out_dtype="int4")
