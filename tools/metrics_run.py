"""Generative-set metric phase, isolated in its own process.

Reads <run_dir>/metric_clouds.npz (persisted by tools/quality_run.py or
tools/scale_run.py), computes MMD / COV / 1-NNA under BOTH Chamfer and
EMD, merges the result into <run_dir>/report.json, and regenerates the
run's markdown. Run it AFTER the pipeline process has exited — the axon
relay serializes TPU processes.

Why a separate process: in round 2 the [chunk, n, m] device metric
programs crashed the TPU worker mid-pipeline, shipping NaN EMD columns
into QUALITY.md. Here the expensive device programs run with a clean
HBM, a worker crash costs only this phase, and the fallback ladder is
explicit:

  1. device Chamfer + Sinkhorn-EMD (evaluation.device_metrics), with a
     host KD-tree oracle cross-check on the Chamfer variants;
  2. on any device fault: host exact-EMD (Hungarian assignment) on
     512-point subsampled clouds (evaluation.generative), labeled as
     such in the output — never NaN.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python tools/metrics_run.py runs/quality_chairs [--no-device]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]


def compute_metrics(gen_clouds, ref_clouds, use_device: bool = True,
                    chunk: int = 4) -> dict:
    """Full both-metric dict with the fallback ladder; never NaN."""
    from latent_diffusion_models_for_shape_sdfs_tpu.evaluation import (
        evaluate_generated, evaluate_generated_device,
        evaluate_generated_emd_host)

    host_cham = evaluate_generated(gen_clouds, ref_clouds)
    gm = dict(host_cham)
    gm["chamfer_source"] = "host KD-tree"
    if use_device:
        try:
            import jax  # noqa: F401
            dev = evaluate_generated_device(
                gen_clouds, ref_clouds, metrics=("chamfer", "emd"),
                chunk=chunk)
            assert abs(dev["mmd_chamfer"] - host_cham["mmd_chamfer"]) \
                < 5e-4, (dev, host_cham)
            gm.update(dev)
            gm["chamfer_source"] = "device MXU (host-oracle-checked)"
            gm["emd_source"] = "device Sinkhorn (eps=0.01, 200 iters)"
            return gm
        except Exception as e:  # device fault / backend missing
            print(f"device metric path failed ({type(e).__name__}: "
                  f"{str(e)[:160]}); exact host EMD fallback", flush=True)
            gm["device_metrics_error"] = str(e)[:200]
    gm.update(evaluate_generated_emd_host(gen_clouds, ref_clouds,
                                          points=512))
    gm["emd_source"] = (
        f"exact Hungarian assignment on "
        f"{gm['emd_cloud_points']}-pt subsampled clouds (host)")
    return gm


def main(argv=None):
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.tpu_lock import (
        acquire_or_die)
    _tpu_lock = acquire_or_die("tools/metrics_run")  # one chip, one process
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", type=pathlib.Path)
    ap.add_argument("--no-device", action="store_true",
                    help="skip the device path (host metrics only)")
    ap.add_argument("--chunk", type=int, default=4,
                    help="pairs per device lax.map step")
    args = ap.parse_args(argv)

    run_dir = args.run_dir if args.run_dir.is_absolute() \
        else ROOT / args.run_dir
    clouds = np.load(run_dir / "metric_clouds.npz")
    gen = [c for c in clouds["gen"]]
    ref = [c for c in clouds["ref"]]
    report = json.loads((run_dir / "report.json").read_text())

    if not args.no_device:
        from latent_diffusion_models_for_shape_sdfs_tpu.utils.compilation_cache import (  # noqa: E501
            enable_compilation_cache)
        enable_compilation_cache()

    t0 = time.time()
    gm = compute_metrics(gen, ref, use_device=not args.no_device,
                         chunk=args.chunk)
    gm["ref_protocol"] = ("decoded (same decode->MC->sample pipeline as "
                          "gen)" if "ref_analytic" in clouds.files
                          else "analytic surfaces")
    if "ref_analytic" in clouds.files:
        # secondary: the round-2 analytic-reference protocol (carries a
        # ~0.66 1-NNA decode-artifact floor; see tools/diff_sweep.py
        # oracle control) — chamfer variants only
        from latent_diffusion_models_for_shape_sdfs_tpu.evaluation import (
            evaluate_generated)
        ga = evaluate_generated(gen, [c for c in clouds["ref_analytic"]])
        gm.update({f"{k}_analytic": v for k, v in ga.items()})
    gm["empty_samples"] = report.get("empty_samples", 0)
    gm["seconds"] = time.time() - t0
    report["generative_metrics"] = gm
    (run_dir / "report.json").write_text(json.dumps(report, indent=2))
    print(f"{run_dir.name}: mmd={gm['mmd_chamfer']:.2e} "
          f"cov={gm['coverage']:.2f} 1nna={gm['one_nna']:.2f} "
          f"mmd-emd={gm['mmd_emd']:.4f} cov-emd={gm['coverage_emd']:.2f} "
          f"1nna-emd={gm['one_nna_emd']:.2f} "
          f"[{gm['emd_source']}] in {gm['seconds']:.0f}s", flush=True)

    # regenerate the owning markdown
    sys.path.insert(0, str(ROOT / "tools"))
    if run_dir.name.startswith("quality"):
        from quality_run import write_quality_md
        write_quality_md(report)
        print("rewrote QUALITY.md")
    elif run_dir.name.startswith("scale"):
        from scale_run import write_scale_md
        write_scale_md(report)
        print("rewrote SCALE.md")


if __name__ == "__main__":
    main()
