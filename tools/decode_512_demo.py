"""512^3 end-to-end decode demo (BASELINE config 5's decode path):
fused-kernel overfit -> two-level hierarchical 512^3 decode (block layout)
-> host unblock -> native C++ marching cubes -> Chamfer vs analytic GT.

Writes runs/decode512/{report.json, mesh_512.obj}.
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/decode_512_demo.py
"""

import json
import pathlib
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT = ROOT / "runs" / "decode512"


def main():
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.tpu_lock import (
        acquire_or_die)
    _tpu_lock = acquire_or_die("tools/decode_512_demo")  # one chip, one process
    import jax
    import jax.numpy as jnp
    from latent_diffusion_models_for_shape_sdfs_tpu.config import (
        AdConfig, DecoderConfig)
    from latent_diffusion_models_for_shape_sdfs_tpu.data import (
        analytic, SdfDataset)
    from latent_diffusion_models_for_shape_sdfs_tpu.train import (
        train_auto_decoder)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.pallas_kernels \
        import make_pallas_apply
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        decode_grid_hierarchical2_device, unblock_grid)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.isosurface import (
        extract_mesh, _native_mc_binary)
    from latent_diffusion_models_for_shape_sdfs_tpu.evaluation import (
        chamfer_l2, sample_mesh_surface)
    from latent_diffusion_models_for_shape_sdfs_tpu.utils import meshio

    OUT.mkdir(parents=True, exist_ok=True)
    np.asarray(jnp.ones(8))
    report = {"native_mc": _native_mc_binary()}

    shape = analytic.make_chair(np.random.default_rng(3))
    ds = SdfDataset.from_analytic([dict(shape, class_id=0)],
                                  samples_per_shape=80_000, seed=0)
    cfg = AdConfig(decoder=DecoderConfig(), num_scenes=1,
                   scenes_per_batch=1, samples_per_scene=16384,
                   clamp_dist=0.1, num_epochs=600, lr_decay_interval=300,
                   lr_decoder=1e-3, lr_latent=2e-3,
                   use_pallas=True, device_data=True, seed=0)
    t0 = time.time()
    decoder, state, metrics = train_auto_decoder(cfg, ds)
    report["train_l1"] = float(metrics["loss_l1"])
    report["train_seconds"] = time.time() - t0
    print(f"overfit: l1={report['train_l1']:.4f} "
          f"({report['train_seconds']:.0f}s)", flush=True)

    apply_fn = make_pallas_apply(decoder, state.params)
    # decode at 512^3 (block layout on device; capacity sized for chairs);
    # warm once so the timed number is the steady-state rate, not compile
    grid_b, stats = decode_grid_hierarchical2_device(
        apply_fn, state.codes[0], 512, 16, 4, 4096, 65536, safety=1.2)
    jax.block_until_ready(grid_b)
    t0 = time.time()
    grid_b, stats = decode_grid_hierarchical2_device(
        apply_fn, state.codes[0], 512, 16, 4, 4096, 65536, safety=1.2,
        check_overflow=False)
    jax.block_until_ready(grid_b)
    report["decode_seconds"] = time.time() - t0
    _, stats = decode_grid_hierarchical2_device(
        apply_fn, state.codes[0], 512, 16, 4, 4096, 65536, safety=1.2)
    report["decode_stats"] = {k: (int(v) if not isinstance(v, (str, bool))
                                  else v) for k, v in stats.items()}
    assert not stats["capacity_exceeded"], stats
    print(f"512^3 decode: {report['decode_seconds']:.2f}s "
          f"({512**3/report['decode_seconds']:.2e} eff voxels/s)",
          flush=True)

    t0 = time.time()
    grid = unblock_grid(np.asarray(grid_b), 512, 4)
    report["d2h_unblock_seconds"] = time.time() - t0

    t0 = time.time()
    v, f = extract_mesh(grid, prefer_native=True)
    report["mc_seconds"] = time.time() - t0
    report["verts"] = int(len(v))
    report["faces"] = int(len(f))
    print(f"native MC: {report['mc_seconds']:.2f}s -> {len(v)} verts, "
          f"{len(f)} faces", flush=True)
    meshio.write_obj(OUT / "mesh_512.obj", v, f)

    pred = sample_mesh_surface(v, f, 30_000, seed=0)
    gt = analytic.sample_surface(shape, 30_000, np.random.default_rng(1))
    report["chamfer_l2"] = chamfer_l2(pred, gt)
    print(f"chamfer vs analytic: {report['chamfer_l2']:.2e}", flush=True)

    (OUT / "report.json").write_text(json.dumps(report, indent=2))
    print("wrote", OUT / "report.json")


if __name__ == "__main__":
    main()
