"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json:2,5): SDF query evals/sec/chip on a 256^3 grid,
target >= 1e9 *effective* voxels/sec via hierarchical near-surface decode
(the dense MXU roofline for the 8x512 decoder is ~4.5e7 true evals/s/chip
on a v5e — see SURVEY.md s6; both numbers are reported so the claim is
unambiguous: `value` is the effective rate, `dense_evals_per_sec` in the
details file is the true-eval rate).

Driver-proofing (round 4's official capture was rc:124/parsed:null —
a stray TPU process + a silently-rebuilt-away native mesher + end-only
output forfeited everything):
  - the headline JSON line is printed the MOMENT the 256^3 measurement
    exists (phase 5 of ~16); a timeout after that point loses detail
    phases, never the headline;
  - bench_details.json is rewritten atomically after EVERY phase;
  - startup refuses to run over a concurrent TPU-relay process: an
    exclusive flock (utils/tpu_lock) + a /proc scan for lock-unaware
    strays, each failing fast with a named diagnosis;
  - the native marching-cubes lib is built if a sandbox reset wiped it
    (or serve timing is loudly SKIPPED — never silently timed against
    the ~140x slower NumPy mesher), and every serve stat carries a
    `mesher` provenance field;
  - phases after the headline are error-isolated: one failing phase
    records `<phase>_error` and the run continues.

Measured and written to bench_details.json + stderr:
  - dense true evals/sec (256^3, chunked decode, canonical 8x512 decoder)
  - hierarchical effective voxels/sec at 256^3/512^3, single + batched
    (incl. the 64 heterogeneous-chair flat-vs-vmap comparison)
  - end-to-end mesh serving (int8 + int4 payloads, 256^3 + 512^3)
  - auto-decoder train steps/sec (fp32 / bf16 / fused-Pallas) + MFU
  - DDIM-50 and DPM-10 samples/sec, amortized encoder latency

All timings use block_until_ready fences; each phase is compiled + warmed
before timing. Runs on whatever single chip jax.devices()[0] provides.
"""

from __future__ import annotations

import contextlib
import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fence_time(fn, *args, iters=3, **kw):
    import jax
    out = fn(*args, **kw)          # warm/compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


# bf16 MXU peak per chip, by device_kind prefix (the MFU denominator;
# all hot GEMMs in this repo run bf16 inputs with f32 accumulation)
_PEAK_BF16 = {
    "TPU v5 lite": 197e12,   # v5e public spec: 197 bf16 TFLOP/s/chip
    "TPU v4": 275e12,
    "TPU v5": 459e12,        # v5p
}


def _peak_flops(device_kind: str) -> float:
    for k, v in _PEAK_BF16.items():
        if device_kind.startswith(k):
            return v
    return 197e12  # conservative default (v5e)


def _decoder_fwd_flops_per_point(decoder) -> float:
    """Analytic MACs*2 of one SDF query through the folded MLP: the
    compiler cost model cannot see inside pallas custom calls, so the
    fused kernels' MFU uses this closed-form count (the XLA-path
    cost_analysis cross-check is recorded alongside)."""
    return float(sum(2 * i * o for i, o, _ in decoder.layer_dims()))


def _ensure_native_mesher(details) -> bool:
    """native-lib present, building it if a sandbox reset wiped
    native/build. Returns False (and records why) when serve timing
    must be skipped — the NumPy fallback is ~140x slower and timing it
    produces garbage serve numbers (round 4's 25 s/mesh artifact)."""
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.isosurface import (
        mesher_impl, reset_native_cache)
    if mesher_impl() == "native-lib":
        details["mesher"] = "native-lib"
        return True
    log("native mesher missing — building native/build (cmake)...")
    t0 = time.perf_counter()
    try:
        subprocess.run(
            ["cmake", "-S", str(ROOT / "native"), "-B",
             str(ROOT / "native" / "build")],
            check=True, capture_output=True, timeout=300)
        subprocess.run(
            ["cmake", "--build", str(ROOT / "native" / "build"), "-j2"],
            check=True, capture_output=True, timeout=600)
    except Exception as e:
        details["mesher_build_error"] = f"{type(e).__name__}: " \
                                        f"{str(e)[:200]}"
    reset_native_cache()
    impl = mesher_impl()
    details["mesher"] = impl
    log(f"native build: {impl} after {time.perf_counter() - t0:.0f}s")
    return impl == "native-lib"


def main():
    # ---- single-writer guard BEFORE any device contact: a concurrent
    # relay process silently hangs both sides and poisons compiles
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.tpu_lock import (
        acquire_or_die, scan_stray_tpu_processes)
    strays = scan_stray_tpu_processes()
    if strays:
        for pid, cmd in strays:
            log(f"FATAL: live TPU-relay-shaped process pid {pid}: {cmd}")
        log("bench.py refuses to time against a shared chip "
            "(CLAUDE.md single-writer rule; round-4 capture was lost "
            "to exactly this). Stop the process(es) and retry.")
        raise SystemExit(3)
    _lock = acquire_or_die("bench.py")  # held for process lifetime

    from latent_diffusion_models_for_shape_sdfs_tpu.utils.compilation_cache \
        import enable_compilation_cache
    enable_compilation_cache()  # affects only compile time, not timings
    import jax
    import jax.numpy as jnp
    from latent_diffusion_models_for_shape_sdfs_tpu.config import (
        AdConfig, DecoderConfig, DenoiserConfig)
    from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import (
        SdfDecoder)
    from latent_diffusion_models_for_shape_sdfs_tpu.models.denoiser import (
        LatentDenoiserMLP)
    from latent_diffusion_models_for_shape_sdfs_tpu.train.auto_decoder import (
        init_ad_state, make_ad_train_step)
    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.schedule import (
        DiffusionSchedule)
    from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.sampler import (
        ddim_sample)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid, decode_grid_hierarchical3_batch,
        decode_grid_hierarchical3_device, probe_bench_caps)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.fused_decoder import (
        make_fast_apply)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.pallas_kernels import (
        make_pallas_apply)
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.profiling import (
        cost_analysis)

    dev = jax.devices()[0]
    peak = _peak_flops(dev.device_kind)
    log(f"device: {dev} ({dev.device_kind}), bf16 peak {peak:.3g} FLOP/s")
    details = {"device": str(dev.device_kind),
               "peak_bf16_flops_per_sec": peak,
               "backend": dev.platform,
               # kernel provenance: pallas kernels interpret on CPU,
               # Mosaic-compile on TPU (ops.pallas_kernels._on_cpu)
               "pallas_mode": ("interpret" if dev.platform == "cpu"
                               else "mosaic"),
               "phases_completed": []}

    def flush():
        tmp = ROOT / "bench_details.json.tmp"
        with open(tmp, "w") as f:
            json.dump(details, f, indent=2)
        os.replace(tmp, ROOT / "bench_details.json")

    headline = {"printed": False}

    def emit_headline(eff_256, note=""):
        if headline["printed"]:
            return
        headline["printed"] = True
        print(json.dumps({
            "metric": "SDF decode effective voxels/sec/chip at 256^3 "
                      "(three-level hierarchical near-surface decode, "
                      "single shape — the BASELINE north-star config; "
                      "512^3 / 64-shape batched / serving / MFU phases "
                      "land incrementally in bench_details.json"
                      + note + ")",
            "value": eff_256,
            "unit": "voxels/sec/chip",
            "vs_baseline": eff_256 / 1e9,
        }), flush=True)

    @contextlib.contextmanager
    def soft(name):
        """Post-headline phases are error-isolated: one failure records
        `<name>_error` and the capture continues."""
        t0 = time.perf_counter()
        try:
            yield
            details["phases_completed"].append(name)
        except Exception as e:
            details[name + "_error"] = f"{type(e).__name__}: " \
                                       f"{str(e)[:300]}"
            log(f"PHASE {name} FAILED: {type(e).__name__}: "
                f"{str(e)[:200]}")
        finally:
            details.setdefault("phase_seconds", {})[name] = round(
                time.perf_counter() - t0, 3)
            flush()

    flush()

    # Warm the device<->host streams once: in this sandbox the FIRST d2h
    # transfer pays a multi-minute channel-init penalty that must not
    # pollute any timed phase.
    t0 = time.perf_counter()
    np.asarray(jnp.ones((1024,)))
    warm_s = time.perf_counter() - t0
    details["d2h_channel_warm_seconds"] = round(warm_s, 1)
    log(f"d2h channel warm: {warm_s:.1f}s")

    # ---------------- canonical decoder, bf16 fast path for decode
    dcfg = DecoderConfig(use_dropout=False)
    decoder = SdfDecoder(dcfg)

    # Make the decoder represent a real surface (sphere r=0.5) so the
    # hierarchical rate reflects honest near-surface sparsity: quick
    # overfit of one scene.
    cfg1 = AdConfig(decoder=dcfg, num_scenes=1, scenes_per_batch=1,
                    samples_per_scene=16384, clamp_dist=0.5,
                    lr_decoder=1e-3, lr_latent=2e-3)
    from latent_diffusion_models_for_shape_sdfs_tpu.data import SdfDataset
    ds = SdfDataset.from_analytic(
        [{"type": "sphere", "r": 0.5, "class_id": 0}],
        samples_per_shape=60_000, seed=0)
    state = init_ad_state(cfg1, decoder, jax.random.PRNGKey(1))
    step1 = make_ad_train_step(decoder, cfg1)
    rng = np.random.default_rng(0)
    b = ds.sample_scene_batch(rng, np.zeros(1, np.int64), 16384)
    ids1, xyz1, sdf1 = (jnp.asarray(b.scene_ids), jnp.asarray(b.xyz),
                        jnp.asarray(b.sdf))
    t0 = time.perf_counter()
    for e in range(200):
        state, m = step1(state, ids1, xyz1, sdf1,
                         jnp.asarray(float(e)), jax.random.PRNGKey(e))
    jax.block_until_ready(m["loss"])
    log(f"overfit: l1={float(m['loss_l1']):.4f} "
        f"({time.perf_counter() - t0:.1f}s)")

    # Fused Pallas eval kernel (all 9 GEMMs VMEM-resident per point tile):
    # ~1.3x the XLA bf16 path on v5e. XLA bf16 rate also recorded.
    apply_fast = make_pallas_apply(decoder, state.params)
    apply_xla = make_fast_apply(decoder, state.params)
    z0 = state.codes[0]
    # distinct pre-uploaded device keys per call (relay caches identical
    # (program, args) re-executions; fresh host keys time throttled h2d)
    ekeys = jax.block_until_ready(jax.random.split(jax.random.PRNGKey(7), 8))

    def flat_rate(ap):
        f = jax.jit(lambda k: ap(z0, jax.random.uniform(
            k, (1_048_576, 3), jnp.float32, -1, 1)))
        out = f(ekeys[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(1, 4):
            out = f(ekeys[i])
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / 3

    with soft("flat_eval"):
        dt_x = flat_rate(apply_xla)
        details["xla_bf16_evals_per_sec"] = 1_048_576 / dt_x
        dt_p = flat_rate(apply_fast)
        details["pallas_evals_per_sec"] = 1_048_576 / dt_p
        log(f"flat 1.05M evals: xla bf16 {1_048_576 / dt_x:.3e}/s, "
            f"pallas {1_048_576 / dt_p:.3e}/s")

    # ---------------- dense 256^3 decode (feeds the MFU accounting and
    # the degraded-headline fallback: NOT error-isolated)
    # vary the latent per call: the relay layer has been observed serving
    # an identical (program, args) re-execution in ~0 time
    res = 256
    zdense = jax.block_until_ready(
        z0[None, :] + 1e-6 * jnp.arange(3, dtype=jnp.float32)[:, None])
    decode_grid(apply_fast, zdense[0], res, chunk=1_048_576
                ).block_until_ready()
    t0 = time.perf_counter()
    outs = [decode_grid(apply_fast, zdense[i], res, chunk=1_048_576)
            for i in range(1, 3)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 2
    dense_rate = res ** 3 / dt
    details["dense_evals_per_sec"] = dense_rate
    details["dense_256_seconds"] = dt
    log(f"dense 256^3: {dt:.3f}s -> {dense_rate:.3e} true evals/s")

    # ---- MFU accounting for the fused eval kernel (BASELINE.md harness
    # spec): analytic forward FLOPs/point (the compiler cost model is
    # blind inside the pallas custom call — its near-zero count is
    # recorded as evidence of that) + an XLA-path cost_analysis
    # cross-check of the same math.
    fpp = _decoder_fwd_flops_per_point(decoder)
    with soft("eval_mfu"):
        details["decoder_fwd_flops_per_point"] = fpp
        details["dense_256_analytic_flops"] = fpp * res ** 3
        details["dense_256_flops_per_sec"] = fpp * dense_rate
        details["dense_256_mfu_bf16"] = fpp * dense_rate / peak
        pts_ca = jnp.zeros((1_048_576, 3), jnp.float32)
        ca_xla = cost_analysis(lambda zz, pp: apply_xla(zz, pp), z0,
                               pts_ca)
        ca_pal = cost_analysis(lambda zz, pp: apply_fast(zz, pp), z0,
                               pts_ca)
        details["eval_1m_cost_analysis_flops_xla"] = ca_xla.get(
            "flops", 0.0)
        details["eval_1m_cost_analysis_flops_pallas"] = ca_pal.get(
            "flops", 0.0)
        details["eval_1m_analytic_flops"] = fpp * 1_048_576
        log(f"eval MFU: dense fused kernel {fpp * dense_rate:.3e} FLOP/s"
            f" = {100 * fpp * dense_rate / peak:.1f}% of bf16 peak "
            f"(analytic {fpp:.0f} FLOPs/pt; cost_analysis xla "
            f"{ca_xla.get('flops', 0):.3g} vs pallas "
            f"{ca_pal.get('flops', 0):.3g} for 1M pts)")

    # ---------------- two-level hierarchical decode (effective rates)
    # Fully on-device single compiled programs; grids stay device-resident.
    # Per-call perturbation uses PRE-BUILT device-resident latents: in
    # production the latent comes from the on-device DDIM sampler, and a
    # per-call host-float upload would time the relay's throttled h2d
    # channel instead of the decode (measured +7 ms/call after the heavy
    # training h2d history earlier in this script).
    # pre-MATERIALIZED list (slicing zperts[i] inside the timed loop would
    # add one relay dispatch per call); dense grids freed first
    del outs
    zperts = [jax.block_until_ready(z0 + 1e-6 * (i + 1)) for i in range(8)]

    def time_hier(fn, iters=6):
        # two warm executions: through the relay the first couple of
        # post-compile executions carry extra latency
        grid, stats = fn(zperts[0], check_overflow=True)
        assert not stats["capacity_exceeded"], stats
        grid, _ = fn(zperts[1], check_overflow=False)
        jax.block_until_ready(grid)
        t0 = time.perf_counter()
        for i in range(2, iters + 2):
            grid, _ = fn(zperts[i % 8], check_overflow=False)
        jax.block_until_ready(grid)
        return (time.perf_counter() - t0) / iters, stats

    # 256^3 single shape — THE HEADLINE. Production decode mode: block
    # layout (x-major assembly would add a padded-transpose pass; host
    # unblock is one memcpy downstream of the d2h it precedes) + bf16
    # grid (near iso=0 |sdf| <= ~4h, so the bf16 step costs ~1e-4
    # absolute on MC vertex interpolation — far below the
    # grid-resolution error; crossing fidelity vs the dense f32 grid is
    # asserted by tools/quality_run.py FOR THIS EXACT CONFIG: caps come
    # from the shared measured-active +25%-headroom policy
    # (ops.grid_eval.probe_bench_caps), so the benched program and the
    # integrity-asserted program are the same). f32 variant recorded.
    try:
        bc1, bc2, bc3 = probe_bench_caps(apply_fast, zperts[0], 256)
        details["hier3_256_caps"] = [bc1, bc2, bc3]
        log(f"bench caps 256 (measured-active+25%): {bc1}/{bc2}/{bc3}")
        dt_f32, _ = time_hier(
            lambda zz, **kw: decode_grid_hierarchical3_device(
                apply_fast, zz, 256, 16, 4, 2, bc1, bc2, bc3, safety=1.1,
                layout="block", **kw))
        details["hier3_256_f32_seconds"] = dt_f32
        details["hier3_256_f32_effective_voxels_per_sec"] = \
            256 ** 3 / dt_f32
        dt_h, st = time_hier(
            lambda zz, **kw: decode_grid_hierarchical3_device(
                apply_fast, zz, 256, 16, 4, 2, bc1, bc2, bc3, safety=1.1,
                layout="block", out_dtype="bfloat16", **kw))
        eff_256 = 256 ** 3 / dt_h
        details["hier3_256_seconds"] = dt_h
        details["hier3_256_stats"] = {k: int(v) if hasattr(v, "item")
                                      else v for k, v in st.items()}
        details["hier3_256_effective_voxels_per_sec"] = eff_256
        details["phases_completed"].append("hier3_256")
        log(f"hier3 256^3: {dt_h * 1e3:.1f}ms -> {eff_256:.3e} eff "
            f"voxels/s (active {st['active_l1']}/{st['active_l2']}/"
            f"{st['active_l3']}; f32 {dt_f32 * 1e3:.1f}ms)")
    except Exception as e:
        details["hier3_256_error"] = f"{type(e).__name__}: " \
                                     f"{str(e)[:300]}"
        log(f"HEADLINE PHASE FAILED: {e!r} — degraded headline from the "
            f"dense rate follows")
        eff_256 = dense_rate
        emit_headline(eff_256, "; DEGRADED: hierarchical decode failed, "
                               "value is the DENSE true-eval rate")
    flush()
    # print the headline NOW: everything after this point is detail
    emit_headline(eff_256)
    details["effective_voxels_per_sec"] = eff_256

    # 512^3 single shape (block layout; BASELINE config 5 decode path)
    with soft("hier3_512"):
        b51, b52, b53 = probe_bench_caps(apply_fast, zperts[0], 512)
        details["hier3_512_caps"] = [b51, b52, b53]
        dt_5, st5 = time_hier(
            lambda zz, **kw: decode_grid_hierarchical3_device(
                apply_fast, zz, 512, 16, 4, 2, b51, b52, b53, safety=1.1,
                layout="block", out_dtype="bfloat16", **kw))
        eff_512 = 512 ** 3 / dt_5
        details["hier3_512_seconds"] = dt_5
        details["hier3_512_effective_voxels_per_sec"] = eff_512
        details["effective_voxels_per_sec"] = max(
            details["effective_voxels_per_sec"], eff_512)
        log(f"hier3 512^3: {dt_5 * 1e3:.1f}ms -> {eff_512:.3e} eff "
            f"voxels/s (active {st5['active_l1']}/{st5['active_l2']}/"
            f"{st5['active_l3']})")

    # ---------------- HETEROGENEOUS batched decode: 64 *different*
    # trained chairs (the literal BASELINE config-4 situation — the
    # broadcast-z batches below are the best case for the vmapped path
    # because every shape has identical active counts). Latents + decoder
    # come from the committed 6k-scale stage-1 pack. Two programs
    # measured on the same batch:
    #   vmapped path: every shape pays the batch-max caps (+25%);
    #   flat path (decode_grid_hierarchical3_batch_flat): active blocks
    #     compacted ACROSS shapes via the per-point-latent pairs kernel,
    #     so the padded work tracks the batch SUM (+25%).
    # Runs EARLY (right after the headline): round 4's flagship kernel
    # had never executed on real hardware because this section sat
    # behind five other phases when the capture timed out.
    with soft("hier3_het64"):
        from latent_diffusion_models_for_shape_sdfs_tpu.utils.checkpoint \
            import restore_tree_npz
        from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
            decode_grid_hierarchical3_batch_flat, probe_flat_caps)
        from latent_diffusion_models_for_shape_sdfs_tpu.ops.pallas_kernels \
            import make_pallas_apply_pairs
        pack = ROOT / "runs" / "scale_chairs6k" / "stage1_pack.npz"
        tmpl = {"params": decoder.init_params(jax.random.PRNGKey(0)),
                "codes": jnp.zeros((6144, 256), jnp.float32)}
        st6k = restore_tree_npz(pack, tmpl)
        p6k, codes6k = st6k["params"], jnp.asarray(st6k["codes"])
        apply_het = make_pallas_apply(decoder, p6k)
        pairs_het = make_pallas_apply_pairs(decoder, p6k)
        zhet = jax.block_until_ready(codes6k[::96][:64])  # 64 chairs
        zhet_b = [jax.block_until_ready(zhet + 1e-6 * (i + 1))
                  for i in range(4)]

        # vmapped reference on the same 64 chairs: caps = measured
        # batch-max +25% (the policy the vmap path forces on every
        # shape). Probed in B=16 chunks: per-shape actives don't depend
        # on batch-mates, and the generous-cap B=64 probe program is a
        # compile-time HBM OOM (18.3 GB vs 15.75 GB — the round-4/5
        # hier3_het64 HTTP-500, root-caused round 5).
        stp = {"active_l1": [], "active_l2": [], "active_l3": []}
        for s0 in range(0, 64, 16):
            _, stc = decode_grid_hierarchical3_batch(
                apply_het, zhet[s0:s0 + 16], 256, 16, 4, 2,
                (256 // 16) ** 3, 256 ** 2 // 2, 2 * 256 ** 2,
                safety=1.2, safety3=2.0, out_dtype="bfloat16",
                check_overflow=True)
            assert not stc["capacity_exceeded"], stc
            for k in stp:
                stp[k].append(np.asarray(stc[k]))
        stp = {k: np.concatenate(v) for k, v in stp.items()}
        vc = [-(-int(1.25 * int(np.max(stp[k]))) // 128) * 128
              for k in ("active_l1", "active_l2", "active_l3")]
        details["hier3_vmap64het_256_caps"] = vc
        g, _ = decode_grid_hierarchical3_batch(
            apply_het, zhet_b[0], 256, 16, 4, 2, *vc, safety=1.2,
            safety3=2.0, out_dtype="bfloat16", check_overflow=False)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for i in range(1, 4):
            g, _ = decode_grid_hierarchical3_batch(
                apply_het, zhet_b[i], 256, 16, 4, 2, *vc, safety=1.2,
                safety3=2.0, out_dtype="bfloat16", check_overflow=False)
        jax.block_until_ready(g)
        dt_v = (time.perf_counter() - t0) / 3
        del g
        details["hier3_vmap64het_256_seconds"] = dt_v
        details["hier3_vmap64het_256_effective_voxels_per_sec"] = \
            64 * 256 ** 3 / dt_v
        details["hier3_het64_active_l3_max"] = int(np.max(
            stp["active_l3"]))
        details["hier3_het64_active_l3_mean"] = float(np.mean(
            stp["active_l3"]))
        log(f"hier3 vmap 64-chair het 256^3: {dt_v * 1e3:.0f}ms -> "
            f"{64 * 256 ** 3 / dt_v:.3e} eff voxels/s "
            f"(caps {vc}, per-shape max l3 {int(np.max(stp['active_l3']))}"
            f" vs mean {float(np.mean(stp['active_l3'])):.0f})")
        flush()

        # flat path: global caps = measured batch-sum +25%
        zhet16 = zhet.astype(jnp.bfloat16)
        fc = probe_flat_caps(pairs_het, zhet16, 256, safety=1.2,
                             safety3=2.0)
        details["hier3_flat64het_256_caps"] = list(fc)
        zflat_b = [jax.block_until_ready(
            (zhet + 1e-6 * (i + 1)).astype(jnp.bfloat16))
            for i in range(4)]
        g, stf = decode_grid_hierarchical3_batch_flat(
            pairs_het, zflat_b[0], 256, 16, 4, 2, *fc, safety=1.2,
            safety3=2.0, out_dtype="bfloat16", check_overflow=True)
        assert not stf["capacity_exceeded"], stf
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for i in range(1, 4):
            g, _ = decode_grid_hierarchical3_batch_flat(
                pairs_het, zflat_b[i], 256, 16, 4, 2, *fc, safety=1.2,
                safety3=2.0, out_dtype="bfloat16", check_overflow=False)
        jax.block_until_ready(g)
        dt_f = (time.perf_counter() - t0) / 3
        del g
        details["hier3_flat64het_256_seconds"] = dt_f
        details["hier3_flat64het_256_effective_voxels_per_sec"] = \
            64 * 256 ** 3 / dt_f
        details["hier3_flat64het_256_stats"] = {
            k: int(v) for k, v in stf.items()
            if k in ("active_l1", "active_l2", "active_l3",
                     "cap1", "cap2", "cap3", "fine_evals")}
        log(f"hier3 FLAT 64-chair het 256^3: {dt_f * 1e3:.0f}ms -> "
            f"{64 * 256 ** 3 / dt_f:.3e} eff voxels/s "
            f"(global caps {list(fc)}; {dt_v / dt_f:.2f}x vs vmap)")
        del zhet_b, zflat_b, apply_het, pairs_het, codes6k

    # 256^3 batched (16-shape chunk of BASELINE config 4's 64/step) —
    # THREE-level batched decode with the production safety3=2.0 margin
    # (the config-4 carrier, integrity-asserted by tools/quality_run.py);
    # caps from the same measured-active+25% policy at these margins.
    hold = {}
    with soft("hier3_batch16"):
        hold["zb_perts"] = [jax.block_until_ready(
            jnp.broadcast_to(z0, (16,) + z0.shape) + 1e-6 * (i + 1))
            for i in range(4)]
        ac1, ac2, ac3 = probe_bench_caps(apply_fast, zperts[0], 256,
                                         safety=1.2, safety3=2.0)
        details["hier3_batch16_256_caps"] = [ac1, ac2, ac3]
        gb, stb = decode_grid_hierarchical3_batch(
            apply_fast, hold["zb_perts"][0], 256, 16, 4, 2, ac1, ac2,
            ac3, safety=1.2, safety3=2.0, out_dtype="bfloat16",
            check_overflow=True)
        assert not stb["capacity_exceeded"], stb
        t0 = time.perf_counter()
        for i in range(1, 4):
            gb, _ = decode_grid_hierarchical3_batch(
                apply_fast, hold["zb_perts"][i], 256, 16, 4, 2, ac1,
                ac2, ac3, safety=1.2, safety3=2.0, out_dtype="bfloat16",
                check_overflow=False)
        jax.block_until_ready(gb)
        hold["gb"] = gb
        dt_b = (time.perf_counter() - t0) / 3
        eff_b = 16 * 256 ** 3 / dt_b
        details["hier3_batch16_256_seconds"] = dt_b
        details["hier3_batch16_256_effective_voxels_per_sec"] = eff_b
        log(f"hier3 batch16 256^3 (safety3=2): {dt_b * 1e3:.1f}ms -> "
            f"{eff_b:.3e} eff voxels/s ({dt_b / 16 * 1e3:.1f} ms/shape)")

    # the literal BASELINE config-4 unit (64 shapes/step), both ways:
    # 4x16 streamed through the same compiled batch16 program, and one
    # 64-batch program if its ~2.1 GiB of bf16 block grids fit HBM
    with soft("hier3_stream4x16"):
        t0 = time.perf_counter()
        for i in range(4):
            gb, _ = decode_grid_hierarchical3_batch(
                apply_fast, hold["zb_perts"][i], 256, 16, 4, 2, ac1,
                ac2, ac3, safety=1.2, safety3=2.0, out_dtype="bfloat16",
                check_overflow=False)
        jax.block_until_ready(gb)
        hold["gb"] = gb
        dt_s64 = time.perf_counter() - t0
        details["hier3_stream4x16_256_seconds"] = dt_s64
        details["hier3_stream4x16_256_effective_voxels_per_sec"] = \
            64 * 256 ** 3 / dt_s64
        log(f"hier3 64-shape step as 4x16 stream: {dt_s64 * 1e3:.0f}ms "
            f"-> {64 * 256 ** 3 / dt_s64:.3e} eff voxels/s "
            f"({dt_s64 / 64 * 1e3:.1f} ms/shape)")

    with soft("hier3_batch64"):
        try:
            z64 = [jax.block_until_ready(
                jnp.broadcast_to(z0, (64,) + z0.shape) + 1e-6 * (i + 1))
                for i in range(3)]
            g64, st64 = decode_grid_hierarchical3_batch(
                apply_fast, z64[0], 256, 16, 4, 2, ac1, ac2, ac3,
                safety=1.2, safety3=2.0, out_dtype="bfloat16",
                check_overflow=True)
            assert not st64["capacity_exceeded"], st64
            t0 = time.perf_counter()
            for i in range(1, 3):
                g64, _ = decode_grid_hierarchical3_batch(
                    apply_fast, z64[i], 256, 16, 4, 2, ac1, ac2, ac3,
                    safety=1.2, safety3=2.0, out_dtype="bfloat16",
                    check_overflow=False)
            jax.block_until_ready(g64)
            dt_64 = (time.perf_counter() - t0) / 2
            details["hier3_batch64_256_seconds"] = dt_64
            details["hier3_batch64_256_effective_voxels_per_sec"] = \
                64 * 256 ** 3 / dt_64
            log(f"hier3 batch64 256^3: {dt_64 * 1e3:.0f}ms -> "
                f"{64 * 256 ** 3 / dt_64:.3e} eff voxels/s "
                f"({dt_64 / 64 * 1e3:.1f} ms/shape)")
            del g64, z64
        except Exception as e:  # HBM OOM: the streamed form above is
            # the production carrier; record why this program is absent
            details["hier3_batch64_256_error"] = \
                f"{type(e).__name__}: {str(e)[:200]}"
            log(f"hier3 batch64 256^3: not runnable ({type(e).__name__})"
                f" — streamed 4x16 is the 64/step carrier")

    # ---------------- end-to-end mesh serving: latents -> sparse payload
    # d2h -> host reconstruct -> native C++ marching cubes. The compact
    # v2 payload (near-surface rows only, int8 sign-preserving values,
    # bucketed row slicing) is what makes this viable over a throttled
    # host link: ~0.5 MB/shape at 256^3 instead of the 33 MB bf16 full
    # grid (or the 2.6 MB cap-sized v1 payload).
    # NEVER timed against the NumPy fallback: if native/build is absent
    # it is rebuilt here, and on failure the phase is loudly skipped.
    from latent_diffusion_models_for_shape_sdfs_tpu.serve import (
        serve_meshes)
    native_ok = _ensure_native_mesher(details)
    flush()
    zsrv = [jax.block_until_ready(z0 + 1e-6 * (i + 1)) for i in range(9)]
    if not native_ok:
        details["serve_skipped"] = (
            "native mesher unavailable (see mesher_build_error) — "
            "refusing to time the ~140x slower NumPy fallback")
        log("SERVE PHASES SKIPPED: " + details["serve_skipped"])
        flush()
    if native_ok:
        with soft("serve_256"):
            next(iter(serve_meshes(apply_fast, zsrv[:1], res=256)))
            t0 = time.perf_counter()
            nmesh = pay = nv = 0
            t_d2h = t_mesh = 0.0
            meshers = set()
            for v, fcs, stt in serve_meshes(apply_fast, zsrv[1:],
                                            res=256):
                nmesh += 1
                nv += len(v)
                pay += stt["payload_bytes"]
                t_d2h += stt["t_d2h_wait_s"]
                t_mesh += stt["t_mesh_s"]
                meshers.add(stt["mesher"])
            dt_e2e = (time.perf_counter() - t0) / nmesh
            details["serve_256_meshes_per_sec"] = 1.0 / dt_e2e
            details["serve_256_payload_bytes_per_shape"] = pay // nmesh
            details["serve_256_verts_per_mesh"] = nv // nmesh
            details["serve_256_mesher"] = sorted(meshers)
            # per-shape bottleneck split (worker-thread view: d2h wait
            # is time blocked on the async transfer, mesh is host time)
            details["serve_256_d2h_wait_s_per_shape"] = t_d2h / nmesh
            details["serve_256_host_mesh_s_per_shape"] = t_mesh / nmesh
            log(f"serve e2e 256^3: {dt_e2e * 1e3:.0f} ms/mesh -> "
                f"{1 / dt_e2e:.2f} meshes/s ({pay // nmesh / 2 ** 20:.1f}"
                f" MiB payload, {nv // nmesh} verts; per-shape d2h wait "
                f"{t_d2h / nmesh * 1e3:.0f} ms, host mesh "
                f"{t_mesh / nmesh * 1e3:.0f} ms; mesher "
                f"{sorted(meshers)})")
            assert meshers == {"native-payload"}, meshers

        # int4 bandwidth-mode serving (same shapes): pays ~40% fewer
        # payload bytes for ~0.3-voxel vertex quantization — worth it
        # iff the d2h wait above shows the link binding
        with soft("serve_256_int4"):
            next(iter(serve_meshes(apply_fast, zsrv[:1], res=256,
                                   out_dtype="int4")))
            t0 = time.perf_counter()
            n4 = pay4 = 0
            t_d2h4 = 0.0
            meshers4 = set()
            for v, fcs, stt in serve_meshes(apply_fast, zsrv[1:],
                                            res=256, out_dtype="int4"):
                n4 += 1
                pay4 += stt["payload_bytes"]
                t_d2h4 += stt["t_d2h_wait_s"]
                meshers4.add(stt["mesher"])
            dt4 = (time.perf_counter() - t0) / n4
            details["serve_256_int4_meshes_per_sec"] = 1.0 / dt4
            details["serve_256_int4_payload_bytes_per_shape"] = pay4 // n4
            details["serve_256_int4_d2h_wait_s_per_shape"] = t_d2h4 / n4
            details["serve_256_int4_mesher"] = sorted(meshers4)
            log(f"serve e2e 256^3 int4: {dt4 * 1e3:.0f} ms/mesh "
                f"({pay4 // n4 / 2 ** 20:.2f} MiB payload, d2h wait "
                f"{t_d2h4 / n4 * 1e3:.0f} ms)")

        # 512^3 serving: same protocol at 8x the resolution; note the
        # bench shape is the overfit sphere — SCALE.md's 741 ms was
        # trained chairs with ~4x the surface verts.
        with soft("serve_512"):
            next(iter(serve_meshes(apply_fast, zsrv[:1], res=512)))
            t0 = time.perf_counter()
            n5 = pay5 = nv5 = 0
            t_d2h5 = t_mesh5 = 0.0
            meshers5 = set()
            for v, fcs, stt in serve_meshes(apply_fast, zsrv[1:6],
                                            res=512):
                n5 += 1
                nv5 += len(v)
                pay5 += stt["payload_bytes"]
                t_d2h5 += stt["t_d2h_wait_s"]
                t_mesh5 += stt["t_mesh_s"]
                meshers5.add(stt["mesher"])
            dt_e5 = (time.perf_counter() - t0) / n5
            details["serve_512_meshes_per_sec"] = 1.0 / dt_e5
            details["serve_512_ms_per_mesh"] = dt_e5 * 1e3
            details["serve_512_payload_bytes_per_shape"] = pay5 // n5
            details["serve_512_verts_per_mesh"] = nv5 // n5
            details["serve_512_d2h_wait_s_per_shape"] = t_d2h5 / n5
            details["serve_512_host_mesh_s_per_shape"] = t_mesh5 / n5
            details["serve_512_mesher"] = sorted(meshers5)
            log(f"serve e2e 512^3: {dt_e5 * 1e3:.0f} ms/mesh -> "
                f"{1 / dt_e5:.2f} meshes/s ({pay5 // n5 / 2 ** 20:.1f} "
                f"MiB payload, {nv5 // n5} verts; d2h wait "
                f"{t_d2h5 / n5 * 1e3:.0f} ms, host mesh "
                f"{t_mesh5 / n5 * 1e3:.0f} ms)")
    del zsrv

    # free the device-resident grids/perturbation banks before the train
    # phase (the 16x 64MB batched grid alone would otherwise push the
    # fp32 autodiff step over HBM)
    hold.clear()
    del zperts, zdense

    # ---------------- train steps/sec, canonical 64 x 16384
    cfg = AdConfig(decoder=DecoderConfig(), num_scenes=64,
                   scenes_per_batch=64, samples_per_scene=16384)
    S, P = 64, 16384
    ids = jnp.arange(S, dtype=jnp.int32)
    xyz = jax.random.uniform(jax.random.PRNGKey(3), (S, P, 3),
                             jnp.float32, -1, 1)
    sdf = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (S, P))
    ep = jnp.asarray(0.0)
    with soft("train_fp32"):
        state64 = init_ad_state(cfg, decoder, jax.random.PRNGKey(2))
        step = make_ad_train_step(decoder, cfg)

        def one_step():
            nonlocal state64
            state64, mm = step(state64, ids, xyz, sdf, ep,
                               jax.random.PRNGKey(9))
            return mm["loss"]

        dt_s, _ = fence_time(one_step, iters=5)
        details["train_steps_per_sec"] = 1.0 / dt_s
        details["train_pairs_per_sec"] = S * P / dt_s
        log(f"train fp32: {dt_s * 1e3:.1f} ms/step -> {1 / dt_s:.2f} "
            f"steps/s ({S * P / dt_s:.3e} pairs/s)")

    # bf16 mixed-precision variant (fp32 params/optimizer, bf16 GEMMs) —
    # the perf-mode config; fp32 above is the lineage-parity default.
    with soft("train_bf16"):
        cfg_bf = AdConfig(decoder=DecoderConfig(
            compute_dtype="bfloat16", dropout_impl="pallas"),
            num_scenes=64, scenes_per_batch=64, samples_per_scene=16384)
        dec_bf = SdfDecoder(cfg_bf.decoder)
        state_bf = init_ad_state(cfg_bf, dec_bf, jax.random.PRNGKey(2))
        step_bf = make_ad_train_step(dec_bf, cfg_bf)

        def one_step_bf():
            nonlocal state_bf
            state_bf, mm = step_bf(state_bf, ids, xyz, sdf, ep,
                                   jax.random.PRNGKey(9))
            return mm["loss"]

        dt_bf, _ = fence_time(one_step_bf, iters=5)
        details["train_steps_per_sec_bf16"] = 1.0 / dt_bf
        details["train_pairs_per_sec_bf16"] = S * P / dt_bf
        log(f"train bf16+pallas-dropout: {dt_bf * 1e3:.1f} ms/step -> "
            f"{1 / dt_bf:.2f} steps/s ({S * P / dt_bf:.3e} pairs/s)")
        del state_bf

    # fully fused Pallas train kernel (fwd+loss+bwd in VMEM, hw-PRNG
    # dropout in-kernel): blocked per step — kernel outputs (the loss)
    # resolve before the optimizer tail, so end-only fencing
    # under-counts.
    with soft("train_fused_pallas"):
        cfg_pk = AdConfig(decoder=DecoderConfig(), num_scenes=64,
                          scenes_per_batch=64, samples_per_scene=16384,
                          use_pallas=True)
        dec_pk = SdfDecoder(cfg_pk.decoder)
        state_pk = init_ad_state(cfg_pk, dec_pk, jax.random.PRNGKey(2))
        step_pk = make_ad_train_step(dec_pk, cfg_pk)
        state_pk, mm = step_pk(state_pk, ids, xyz, sdf, ep,
                               jax.random.PRNGKey(9))
        jax.block_until_ready(state_pk.codes)
        t0 = time.perf_counter()
        for _ in range(5):
            state_pk, mm = step_pk(state_pk, ids, xyz, sdf, ep,
                                   jax.random.PRNGKey(9))
            jax.block_until_ready(state_pk.codes)
        dt_pk = (time.perf_counter() - t0) / 5
        details["train_steps_per_sec_fused_pallas"] = 1.0 / dt_pk
        details["train_pairs_per_sec_fused_pallas"] = S * P / dt_pk
        log(f"train fused-pallas kernel: {dt_pk * 1e3:.1f} ms/step -> "
            f"{1 / dt_pk:.2f} steps/s ({S * P / dt_pk:.3e} pairs/s)")

        # ---- train-step MFU: fwd+bwd GEMM work is 3x the forward MACs
        # (fwd, dL/dinput, dL/dW), dropout/loss/optimizer are O(width)
        # noise. Analytic count for the fused kernel (cost model is
        # blind inside the custom call); fp32 XLA step cost_analysis
        # recorded as the sanity cross-check of the same batch.
        train_flops = 3.0 * fpp * S * P
        details["train_step_analytic_flops"] = train_flops
        details["train_fused_pallas_flops_per_sec"] = train_flops / dt_pk
        details["train_fused_pallas_mfu_bf16"] = \
            train_flops / dt_pk / peak
        step_fp32_ca = make_ad_train_step(decoder, cfg, jit=False)
        ca_tr = cost_analysis(step_fp32_ca, state64, ids, xyz, sdf, ep,
                              jax.random.PRNGKey(9))
        details["train_step_cost_analysis_flops_fp32"] = ca_tr.get(
            "flops", 0.0)
        log(f"train MFU: fused kernel {train_flops / dt_pk:.3e} FLOP/s "
            f"= {100 * train_flops / dt_pk / peak:.1f}% of bf16 peak "
            f"(analytic {train_flops:.3g} FLOPs/step; fp32 XLA "
            f"cost_analysis {ca_tr.get('flops', 0):.3g})")
        del state_pk, state64

    # ---------------- DDIM-50 samples/sec
    with soft("ddim50"):
        ncfg = DenoiserConfig()
        den = LatentDenoiserMLP(ncfg)
        dparams = den.init({"params": jax.random.PRNGKey(5)},
                           jnp.zeros((1, 256)), jnp.zeros((1,), jnp.int32))
        dparams = dparams["params"]
        sch = DiffusionSchedule.create(1000)
        fn = lambda zz, tt: den.apply({"params": dparams}, zz, tt)
        B = 512
        sample = jax.jit(lambda k: ddim_sample(fn, sch, k, B, 256,
                                               steps=50))
        # distinct pre-uploaded device keys per call: a fresh host key
        # would time the throttled h2d channel; an identical key would
        # let the relay serve the re-execution from cache
        keys = jax.block_until_ready(
            jax.random.split(jax.random.PRNGKey(6), 10))
        out = sample(keys[0])
        jax.block_until_ready(out)
        # median of 3 pipelined 3-call loops: a single multi-second
        # relay stall (observed: one run recorded 52 ms/batch where
        # neighbors saw 12) corrupts at most one loop and the median
        # discards it. Every call gets a distinct pre-uploaded key.
        loop_avgs = []
        for rep in range(3):
            t0 = time.perf_counter()
            for i in range(3):
                out = sample(keys[1 + rep * 3 + i])
            jax.block_until_ready(out)
            loop_avgs.append((time.perf_counter() - t0) / 3)
        dt_d = sorted(loop_avgs)[1]
        details["ddim50_samples_per_sec"] = B / dt_d
        details["ddim50_batch"] = B
        details["ddim50_loop_avgs_ms"] = [a * 1e3 for a in loop_avgs]
        # DDIM is a pure-XLA scan: the compiler cost model sees the
        # whole program, so cost_analysis IS the FLOP count here.
        ca_dd = cost_analysis(lambda k: ddim_sample(fn, sch, k, B, 256,
                                                    steps=50), keys[0])
        details["ddim50_cost_analysis_flops"] = ca_dd.get("flops", 0.0)
        details["ddim50_flops_per_sec"] = ca_dd.get("flops", 0.0) / dt_d
        details["ddim50_mfu_bf16"] = ca_dd.get("flops", 0.0) / dt_d / peak
        log(f"ddim-50 MFU: {ca_dd.get('flops', 0.0) / dt_d:.3e} FLOP/s "
            f"= {100 * ca_dd.get('flops', 0.0) / dt_d / peak:.2f}% of "
            f"bf16 peak (cost_analysis {ca_dd.get('flops', 0):.3g} "
            f"FLOPs/batch; an elementwise-dominated 256-wide scan, not "
            f"a GEMM workload)")
        log(f"ddim-50: {dt_d * 1e3:.1f} ms/batch({B}) -> "
            f"{B / dt_d:.1f} samples/s (loop avgs "
            f"{[round(a * 1e3, 1) for a in loop_avgs]})")

    # ---------------- DPM-Solver++(2M)-10 samples/sec (same fidelity
    # class as DDIM-50 at 5x fewer denoiser calls; same timing harness)
    with soft("dpm10"):
        from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.sampler \
            import dpm_solver_sample
        sample10 = jax.jit(
            lambda k: dpm_solver_sample(fn, sch, k, B, 256, steps=10))
        out = sample10(keys[0])
        jax.block_until_ready(out)
        loop_avgs = []
        for rep in range(3):
            t0 = time.perf_counter()
            for i in range(3):
                out = sample10(keys[1 + rep * 3 + i])
            jax.block_until_ready(out)
            loop_avgs.append((time.perf_counter() - t0) / 3)
        dt_p10 = sorted(loop_avgs)[1]
        details["dpm10_samples_per_sec"] = B / dt_p10
        log(f"dpm-10: {dt_p10 * 1e3:.1f} ms/batch({B}) -> "
            f"{B / dt_p10:.1f} samples/s (loop avgs "
            f"{[round(a * 1e3, 1) for a in loop_avgs]})")

    # ---------------- amortized one-shot reconstruction (encoder fwd)
    # latency of models/encoder.LatentEncoder on a full observation set —
    # the one-shot alternative to the ~1600-step latent optimization
    # (weights random: the forward cost is weight-independent)
    with soft("encoder_oneshot"):
        from latent_diffusion_models_for_shape_sdfs_tpu.config import (
            EncoderConfig)
        from latent_diffusion_models_for_shape_sdfs_tpu.models.encoder \
            import LatentEncoder
        enc = LatentEncoder(EncoderConfig())
        eparams = enc.init_params(jax.random.PRNGKey(7))
        NOBS = 8192
        enc_fwd = jax.jit(lambda ox, od: enc.apply({"params": eparams},
                                                   ox, od))
        eobs = jax.block_until_ready(
            (jax.random.uniform(jax.random.PRNGKey(8), (10, 1, NOBS, 3)),
             jax.random.normal(jax.random.PRNGKey(9), (10, 1, NOBS))
             * 0.1))
        out = enc_fwd(eobs[0][0], eobs[1][0])
        jax.block_until_ready(out)
        loop_avgs = []
        for rep in range(3):
            t0 = time.perf_counter()
            for i in range(3):
                out = enc_fwd(eobs[0][1 + rep * 3 + i],
                              eobs[1][1 + rep * 3 + i])
            jax.block_until_ready(out)
            loop_avgs.append((time.perf_counter() - t0) / 3)
        dt_e = sorted(loop_avgs)[1]
        details["encoder_oneshot_ms"] = dt_e * 1e3
        details["encoder_oneshot_obs"] = NOBS
        log(f"amortized one-shot encode ({NOBS} obs): {dt_e * 1e3:.2f} "
            f"ms (vs ~1600-step latent opt)")

    details["complete"] = True
    flush()
    log(f"bench complete: {len(details['phases_completed'])} phases, "
        f"headline {eff_256:.3e} eff voxels/s at 256^3")


if __name__ == "__main__":
    main()
