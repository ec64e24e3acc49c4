"""Capture the 64-heterogeneous-chair flat-vs-vmap decode comparison on
the real v5e and merge the keys into bench_details.json.

This is the bench.py `hier3_het64` phase as a standalone tool so the
flagship flat batched decode's hardware numbers (VERDICT r4 missing #2)
can land without re-running the whole bench. Uses the chunked probes
(ops.grid_eval.probe_flat_caps chunk=16 / B=16 vmap probe chunks) that
fix the round-4/5 compile-time HBM OOM: the generous-cap B=64 probe
programs need 18.3-20.5 GB vs the v5e's 15.75 GB HBM.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from latent_diffusion_models_for_shape_sdfs_tpu.utils.tpu_lock import (
    acquire_or_die)
_H = acquire_or_die("het64_capture")

import numpy as np
import jax
import jax.numpy as jnp

from latent_diffusion_models_for_shape_sdfs_tpu.config import DecoderConfig
from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import (
    SdfDecoder)
from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
    decode_grid_hierarchical3_batch, decode_grid_hierarchical3_batch_flat,
    probe_flat_caps)
from latent_diffusion_models_for_shape_sdfs_tpu.ops.pallas_kernels import (
    make_pallas_apply, make_pallas_apply_pairs)
from latent_diffusion_models_for_shape_sdfs_tpu.utils.checkpoint import (
    restore_tree_npz)

ROOT = pathlib.Path(__file__).resolve().parents[1]


def main():
    details = {}
    print("device:", jax.devices()[0], flush=True)
    t0 = time.perf_counter()
    np.asarray(jnp.ones((8,)))
    print(f"channel warm: {time.perf_counter() - t0:.1f}s", flush=True)

    dcfg = DecoderConfig(use_dropout=False)
    decoder = SdfDecoder(dcfg)
    pack = ROOT / "runs" / "scale_chairs6k" / "stage1_pack.npz"
    tmpl = {"params": decoder.init_params(jax.random.PRNGKey(0)),
            "codes": jnp.zeros((6144, 256), jnp.float32)}
    st6k = restore_tree_npz(pack, tmpl)
    p6k, codes6k = st6k["params"], jnp.asarray(st6k["codes"])
    apply_het = make_pallas_apply(decoder, p6k)
    pairs_het = make_pallas_apply_pairs(decoder, p6k)
    zhet = jax.block_until_ready(codes6k[::96][:64])  # 64 distinct chairs
    zhet_b = [jax.block_until_ready(zhet + 1e-6 * (i + 1))
              for i in range(4)]

    # vmapped reference: caps = measured batch-max +25%, probed in B=16
    # chunks (generous-cap B=64 probe = compile-time HBM OOM)
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
    print(f"vmap probe done: caps {vc}", flush=True)
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
    details["hier3_het64_active_l3_max"] = int(np.max(stp["active_l3"]))
    details["hier3_het64_active_l3_mean"] = float(np.mean(
        stp["active_l3"]))
    print(f"hier3 vmap 64-chair het 256^3: {dt_v * 1e3:.0f}ms -> "
          f"{64 * 256 ** 3 / dt_v:.3e} eff voxels/s "
          f"(caps {vc}, per-shape max l3 {int(np.max(stp['active_l3']))}"
          f" vs mean {float(np.mean(stp['active_l3'])):.0f})", flush=True)

    # flat path: global caps = measured batch-sum +25% (chunked probe)
    zhet16 = zhet.astype(jnp.bfloat16)
    fc = probe_flat_caps(pairs_het, zhet16, 256, safety=1.2, safety3=2.0)
    details["hier3_flat64het_256_caps"] = list(fc)
    print(f"flat probe done: global caps {list(fc)}", flush=True)
    zflat_b = [jax.block_until_ready(
        (zhet + 1e-6 * (i + 1)).astype(jnp.bfloat16)) for i in range(4)]
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
    print(f"hier3 FLAT 64-chair het 256^3: {dt_f * 1e3:.0f}ms -> "
          f"{64 * 256 ** 3 / dt_f:.3e} eff voxels/s "
          f"(global caps {list(fc)}; {dt_v / dt_f:.2f}x vs vmap)",
          flush=True)

    # merge into the committed capture
    bd = ROOT / "bench_details.json"
    cur = json.loads(bd.read_text()) if bd.exists() else {}
    cur.pop("hier3_het64_error", None)
    cur.update(details)
    pc = cur.setdefault("phases_completed", [])
    if "hier3_het64" not in pc:
        pc.append("hier3_het64")
    bd.write_text(json.dumps(cur, indent=2) + "\n")
    print("merged into bench_details.json", flush=True)


if __name__ == "__main__":
    main()
