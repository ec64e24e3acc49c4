"""Attribute the 256^3 three-level decode's non-eval overhead, and time
the v2 serving payload (int8 + bucketed rows) end to end.

Context (bench r3): hier3 256^3 runs 17.2 ms while its ~0.38M true evals
cost ~7.4 ms at the dense-program rate — ~10 ms is selection/compaction/
assembly/launch overhead. This probe times variants that differ in one
stage to locate it. Single TPU process; run alone (CLAUDE.md relay rule).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from latent_diffusion_models_for_shape_sdfs_tpu.config import (
    AdConfig, DecoderConfig)
from latent_diffusion_models_for_shape_sdfs_tpu.data import SdfDataset
from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import (
    SdfDecoder)
from latent_diffusion_models_for_shape_sdfs_tpu.train.auto_decoder import (
    init_ad_state, make_ad_train_step)
from latent_diffusion_models_for_shape_sdfs_tpu.ops.pallas_kernels import (
    make_pallas_apply)
from latent_diffusion_models_for_shape_sdfs_tpu.ops.fused_decoder import (
    make_fast_apply)
from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
    decode_grid_hierarchical3_device, decode_grid_hierarchical3_sparse,
    decode_grid_hierarchical3_sparse2, probe_bench_caps)
from latent_diffusion_models_for_shape_sdfs_tpu import serve


def main():
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.tpu_lock import (
        acquire_or_die)
    _tpu_lock = acquire_or_die("tools/probe_decode_cost")  # one chip, one process
    print("devices:", jax.devices())
    np.asarray(jnp.ones(8))  # warm d2h channel

    dcfg = DecoderConfig(latent_size=256, hidden_dim=512, num_layers=8,
                         latent_in=(4,), use_dropout=False,
                         compute_dtype="bfloat16")
    cfg1 = AdConfig(decoder=dcfg, num_scenes=1, scenes_per_batch=1,
                    samples_per_scene=16384, num_epochs=200,
                    clamp_dist=0.5, seed=0, snapshot_every=0)
    decoder = SdfDecoder(dcfg)
    ds = SdfDataset.from_analytic(
        [{"type": "sphere", "r": 0.5, "class_id": 0}],
        samples_per_shape=60_000, seed=0)
    state = init_ad_state(cfg1, decoder, jax.random.PRNGKey(1))
    step1 = make_ad_train_step(decoder, cfg1)
    rng = np.random.default_rng(0)
    b = ds.sample_scene_batch(rng, np.zeros(1, np.int64), 16384)
    ids1, xyz1, sdf1 = (jnp.asarray(b.scene_ids), jnp.asarray(b.xyz),
                        jnp.asarray(b.sdf))
    for e in range(200):
        state, m = step1(state, ids1, xyz1, sdf1,
                         jnp.asarray(float(e)), jax.random.PRNGKey(e))
    jax.block_until_ready(m["loss"])
    print(f"overfit l1={float(m['loss_l1']):.4f}")

    apply_fast = make_pallas_apply(decoder, state.params)
    apply_xla = make_fast_apply(decoder, state.params)
    z0 = state.codes[0]
    zp = [jax.block_until_ready(z0 + 1e-6 * (i + 1)) for i in range(8)]

    c1, c2, c3 = probe_bench_caps(apply_fast, zp[0], 256)
    print("caps:", c1, c2, c3)

    def tloop(fn, name, iters=8):
        out = fn(zp[0])
        jax.block_until_ready(out)
        out = fn(zp[1])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(2, iters + 2):
            out = fn(zp[i % 8])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1e3:.2f} ms")
        return dt

    # 1. baseline: assembled block bf16 grid (the bench program)
    tloop(lambda z: decode_grid_hierarchical3_device(
        apply_fast, z, 256, 16, 4, 2, c1, c2, c3, safety=1.1,
        layout="block", out_dtype="bfloat16", check_overflow=False)[0],
        "hier3 block bf16")
    # 2. no assembly: v1 sparse payload (device-resident)
    tloop(lambda z: decode_grid_hierarchical3_sparse(
        apply_fast, z, 256, 16, 4, 2, c1, c2, c3, safety=1.1,
        out_dtype="bfloat16", check_overflow=False)[0],
        "hier3 sparse (no assembly)")
    # 3. serving program: v2 int8 payload (device-resident)
    tloop(lambda z: decode_grid_hierarchical3_sparse2(
        apply_fast, z, 256, 16, 4, 2, c1, c2, c3, safety=1.1,
        out_dtype="int8", check_overflow=False)[0],
        "hier3 sparse2 int8")
    # 4. XLA apply instead of Pallas (per-launch overhead probe)
    tloop(lambda z: decode_grid_hierarchical3_device(
        apply_xla, z, 256, 16, 4, 2, c1, c2, c3, safety=1.1,
        layout="block", out_dtype="bfloat16", check_overflow=False)[0],
        "hier3 block bf16 (XLA apply)")

    # 5. isolated apply calls at each stage's point count
    for npts in (4096, 40960, 65536, 262144):
        pts = jax.block_until_ready(
            jax.random.uniform(jax.random.PRNGKey(npts), (npts, 3),
                               jnp.float32, -1, 1))
        perts = [jax.block_until_ready(pts + 1e-6 * i) for i in range(4)]
        f = jax.jit(lambda p: apply_fast(z0, p))
        jax.block_until_ready(f(perts[0]))
        jax.block_until_ready(f(perts[1]))
        t0 = time.perf_counter()
        for i in range(2, 6):
            out = f(perts[i % 4])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 4
        print(f"pallas apply {npts} pts: {dt * 1e3:.2f} ms "
              f"({npts / dt / 1e6:.1f}M evals/s)")

    # 5b. compact() in isolation at each level's (n, cap): is the
    # monotone-position scatter a real cost? (vs a searchsorted gather)
    for n, cap in ((4096, 640), (40960, 8448), (67584, 33664)):
        key = jax.random.PRNGKey(n)
        mask0 = jax.random.uniform(key, (n,)) < min(0.8 * cap / n, 0.9)
        masks = [jax.block_until_ready(
            jnp.roll(mask0, i)) for i in range(4)]

        @jax.jit
        def comp_scatter(mask):
            npos = jnp.cumsum(mask.astype(jnp.int32)) - 1
            pos = jnp.where(mask, npos, cap)
            ids = jnp.zeros((cap,), jnp.int32).at[pos].set(
                jnp.arange(n, dtype=jnp.int32), mode="drop")
            return ids, npos[-1] + 1

        @jax.jit
        def comp_search(mask):
            csum = jnp.cumsum(mask.astype(jnp.int32))
            ids = jnp.searchsorted(
                csum, jnp.arange(1, cap + 1, dtype=jnp.int32)
            ).astype(jnp.int32)
            return ids, csum[-1]

        for name, f in (("scatter", comp_scatter),
                        ("searchsorted", comp_search)):
            out = f(masks[0])
            jax.block_until_ready(out)
            out = f(masks[1])
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for i in range(2, 10):
                out = f(masks[i % 4])
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 8
            print(f"compact[{name}] n={n} cap={cap}: {dt * 1e3:.2f} ms")

    # 6. serving e2e: v2 bucketed payload, int8 vs bf16 vs f32
    for dt_name in ("int8", "bfloat16", "float32"):
        srv = [jax.block_until_ready(z0 + 1e-6 * (i + 1))
               for i in range(9)]
        list(serve.serve_meshes(apply_fast, srv[:1], res=256,
                                out_dtype=dt_name))  # compile+warm
        t0 = time.perf_counter()
        pay = nv = 0
        for v, f, st in serve.serve_meshes(apply_fast, srv[1:], res=256,
                                           out_dtype=dt_name):
            pay += st["payload_bytes"]
            nv += len(v)
        dt = (time.perf_counter() - t0) / 8
        print(f"serve 256^3 {dt_name}: {dt * 1e3:.0f} ms/mesh "
              f"({pay / 8 / 2 ** 20:.2f} MiB/shape, {nv // 8} verts)")


if __name__ == "__main__":
    main()
