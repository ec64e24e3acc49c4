"""Real-mesh ShapeNet-day chain (SURVEY.md s3.1-3.2, VERDICT r1 #9):
OBJ file -> native preprocess (BVH + winding-number SDF sampling) ->
SdfDataset.from_dir -> CLI training from a `sdf:` data source -> decode ->
mesh -> Chamfer against the source geometry. Proves the whole ingest chain
as one pipeline, not just its pieces."""

import pathlib

import numpy as np
import pytest

from latent_diffusion_models_for_shape_sdfs_tpu.cli import main
from latent_diffusion_models_for_shape_sdfs_tpu.utils import meshio
from tests.test_native import _icosphere, needs_native


@needs_native
def test_obj_to_trained_mesh_chain(tmp_path):
    # 1. a real mesh file on disk (icosphere, radius 0.5)
    v, f = _icosphere(subdiv=3)
    mesh_dir = tmp_path / "meshes"
    mesh_dir.mkdir()
    meshio.write_obj(mesh_dir / "shape0.obj", v, f)

    # 2. native preprocess: mesh -> balanced SDF sample npz
    sdf_dir = tmp_path / "sdf"
    main(["preprocess", str(mesh_dir), str(sdf_dir), "--samples", "60000"])
    files = list(sdf_dir.glob("*.npz"))
    assert len(files) == 1
    with np.load(files[0]) as z:
        assert {"pos", "neg", "center", "scale", "surface"} <= set(z.files)
        assert len(z["pos"]) + len(z["neg"]) >= 50_000
        center = np.asarray(z["center"], np.float32)
        scale = float(z["scale"][0])
        gt_surf = np.asarray(z["surface"], np.float32)
    # GT surface samples (the lineage's SampleVisibleMeshSurface output,
    # folded into preprocess): on the normalized icosphere's surface
    assert gt_surf.shape == (30_000, 3)
    r = np.linalg.norm(gt_surf, axis=1)
    assert abs(np.median(r) - 0.5 * scale) < 2e-2
    # icosphere r=0.5 at origin -> center ~0, scale = 1/(0.5*1.03)
    assert np.abs(center).max() < 1e-3
    assert abs(scale - 1.0 / (0.5 * 1.03)) < 1e-3

    # 3. train stage 1 from the sdf: source via the CLI
    exp = tmp_path / "exp"
    main(["init-experiment", str(exp), "--data", f"sdf:{sdf_dir}",
          "--scenes", "1",
          "--set", "ad.decoder.latent_size=16",
          "--set", "ad.decoder.hidden_dim=64",
          "--set", "ad.decoder.num_layers=4",
          "--set", "ad.decoder.latent_in=[2]",
          "--set", "ad.decoder.use_dropout=false",
          "--set", "ad.scenes_per_batch=1",
          "--set", "ad.samples_per_scene=4096",
          "--set", "ad.num_epochs=250",
          "--set", "ad.clamp_dist=0.5",
          "--set", "ad.lr_decoder=0.001",
          "--set", "ad.lr_latent=0.002",
          "--set", "ad.lr_decay_interval=125",
          "--set", "ad.snapshot_every=0",
          "--set", "sample.grid_res=48"])
    main(["train-ad", str(exp)])

    # 4. decode the learned shape, compare against the source surface
    import jax.numpy as jnp
    from latent_diffusion_models_for_shape_sdfs_tpu.pipeline import (
        load_ad_state)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops import (
        decode_grid, extract_mesh)
    from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (
        flax_apply_fn)
    from latent_diffusion_models_for_shape_sdfs_tpu.evaluation import (
        chamfer_l2, sample_mesh_surface)

    decoder, state = load_ad_state(str(exp))
    apply_fn = flax_apply_fn(decoder, state.params)
    grid = np.asarray(decode_grid(apply_fn, state.codes[0], 48, chunk=16384))
    pv, pf = extract_mesh(grid)
    assert len(pf) > 100, "trained shape decodes to (almost) nothing"
    # decoded geometry lives in the preprocessor's normalized frame;
    # map back to source coordinates via the stored transform
    pv_src = pv / scale + center
    pred = sample_mesh_surface(pv_src, pf, 10_000, seed=0)
    gt = sample_mesh_surface(v, f, 10_000, seed=1)
    ch = chamfer_l2(pred, gt)
    # squared-distance chamfer; normalized-frame grid h ~= 0.043 at res 48
    assert ch < 2e-3, f"chain chamfer too high: {ch}"
    # eval WITHOUT the source mesh: the stored surface samples alone
    # (normalized frame; squared chamfer scales by scale^2)
    pred_n = sample_mesh_surface(pv, pf, 10_000, seed=2)
    ch_n = chamfer_l2(pred_n, gt_surf[:10_000])
    assert ch_n < 2e-3 * scale ** 2, f"stored-surface chamfer: {ch_n}"

    # 5. `eval` CLI works for sdf: sources via the stored GT surfaces
    import json
    main(["eval", str(exp), "--points", "10000"])
    ev = json.loads((exp / "evals" / "chamfer.json").read_text())
    assert ev["num_failed"] == 0
    assert ev["mean"] < 2e-3 * scale ** 2, ev
