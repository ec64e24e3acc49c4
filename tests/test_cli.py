"""CLI smoke tests: every entry point end-to-end on tiny configs
(SURVEY.md s4.7). Runs in-process (no subprocess) so the single-device
backend is shared; covers init -> train-ad -> train-diff -> sample ->
reconstruct -> eval on a 2-scene analytic experiment."""

import json
import pathlib

import numpy as np
import pytest

from latent_diffusion_models_for_shape_sdfs_tpu.cli import main


TINY_OVERRIDES = [
    "--set", "ad.decoder.latent_size=8",
    "--set", "ad.decoder.hidden_dim=32",
    "--set", "ad.decoder.num_layers=3",
    "--set", "ad.decoder.latent_in=[2]",
    "--set", "ad.decoder.use_dropout=false",
    "--set", "ad.scenes_per_batch=2",
    "--set", "ad.samples_per_scene=512",
    "--set", "ad.num_epochs=40",
    "--set", "ad.clamp_dist=0.5",
    "--set", "ad.lr_decoder=0.002",
    "--set", "ad.lr_latent=0.004",
    "--set", "ad.snapshot_every=20",
    "--set", "diff.denoiser.latent_size=8",
    "--set", "diff.denoiser.hidden_dim=32",
    "--set", "diff.denoiser.num_blocks=1",
    "--set", "diff.denoiser.time_embed_dim=16",
    "--set", "diff.timesteps=50",
    "--set", "diff.batch_size=8",
    "--set", "diff.num_steps=100",
    "--set", "diff.scan_chunk=50",
    "--set", "sample.grid_res=24",
    "--set", "sample.ddim_steps=10",
    "--set", "reconstruct.num_steps=50",
    "--set", "encoder.encoder.latent_size=8",
    "--set", "encoder.encoder.point_widths=[16,32]",
    "--set", "encoder.encoder.head_widths=[32]",
    "--set", "encoder.n_obs=64",
    "--set", "encoder.obs_bank_points=256",
    "--set", "encoder.batch_scenes=2",
    "--set", "encoder.num_steps=80",
    "--set", "encoder.scan_chunk=40",
    "--set", "encoder.lr_schedule=constant",
    "--set", "encoder.snapshot_every=40",
]


@pytest.fixture(scope="module")
def exp(tmp_path_factory):
    d = tmp_path_factory.mktemp("exp")
    main(["init-experiment", str(d), "--data", "analytic:sphere",
          "--scenes", "2", *TINY_OVERRIDES])
    main(["train-ad", str(d)])
    return d


def test_init_wrote_specs(exp):
    specs = json.loads((exp / "specs.json").read_text())
    assert specs["ad"]["num_scenes"] == 2
    assert specs["ad"]["decoder"]["hidden_dim"] == 32


def test_train_ad_checkpointed(exp):
    assert any((exp / "checkpoints" / "auto_decoder").iterdir())
    log = (exp / "logs" / "train_ad.jsonl").read_text().strip().splitlines()
    assert json.loads(log[-1])["event"] == "ad_epoch"


def test_train_diff_and_sample(exp):
    main(["train-diff", str(exp)])
    assert any((exp / "checkpoints" / "diffusion").iterdir())
    main(["sample", str(exp), "--num", "2", "--res", "24"])
    objs = list((exp / "samples").glob("*.obj"))
    assert len(objs) == 2


def test_sample_with_dpm_solver(exp):
    # switch the experiment to the 10-step DPM-Solver++(2M) sampler
    specs = json.loads((exp / "specs.json").read_text())
    specs["sample"]["sampler"] = "dpm"
    specs["sample"]["dpm_steps"] = 8
    (exp / "specs.json").write_text(json.dumps(specs))
    try:
        main(["sample", str(exp), "--num", "2", "--res", "24"])
        objs = list((exp / "samples").glob("*.obj"))
        assert len(objs) >= 2
    finally:
        specs["sample"]["sampler"] = "ddim"
        (exp / "specs.json").write_text(json.dumps(specs))


def test_reconstruct(exp):
    main(["reconstruct", str(exp), "--analytic", "sphere",
          "--points", "1024", "--res", "24", "--name", "r0"])
    assert (exp / "reconstructions" / "r0.obj").exists()


def test_train_encoder_and_amortized_reconstruct(exp):
    main(["train-encoder", str(exp)])
    assert any((exp / "checkpoints" / "encoder").iterdir())
    log = (exp / "logs" / "train_enc.jsonl").read_text().splitlines()
    assert json.loads(log[-1])["event"] == "enc_train"
    # encoder-warm-started reconstruction with a short refinement budget
    main(["reconstruct", str(exp), "--analytic", "sphere",
          "--points", "1024", "--res", "24", "--name", "renc",
          "--encoder", "--refine-steps", "20"])
    assert (exp / "reconstructions" / "renc.obj").exists()
    # pure one-shot (refine 0): a single forward pass to a mesh
    main(["reconstruct", str(exp), "--analytic", "sphere",
          "--points", "1024", "--res", "24", "--name", "renc0",
          "--encoder", "--refine-steps", "0"])
    assert (exp / "reconstructions" / "renc0.obj").exists()


def test_reconstruct_with_diffusion_prior(exp):
    # needs the diffusion checkpoint test_train_diff_and_sample wrote
    main(["reconstruct", str(exp), "--analytic", "sphere",
          "--points", "1024", "--res", "24", "--name", "r0sds",
          "--diffusion-prior", "--sds-weight", "1e-3"])
    assert (exp / "reconstructions" / "r0sds.obj").exists()


def test_render(exp):
    main(["render", str(exp), "--scene", "0", "--size", "48",
          "--march-steps", "48"])
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.image import (
        read_png)
    img = read_png(exp / "renders" / "render.png")
    assert img.shape == (48, 48, 3)
    # trained scene 0 is a sphere-family shape: something must be hit
    # (hit pixels shade darker than the >=0.78-gray background)
    assert (img.astype(int).sum(-1) < 550).sum() > 40


def test_eval(exp):
    main(["eval", str(exp), "--points", "2000"])
    out = json.loads((exp / "evals" / "chamfer.json").read_text())
    assert "mean" in out and len(out["chamfer_l2"]) == 2


def test_interpolate(exp):
    main(["interpolate", str(exp), "0", "1", "--steps", "3",
          "--res", "24"])
    objs = sorted((exp / "interpolations").glob("interp_*.obj"))
    assert len(objs) == 3 and all(o.stat().st_size > 100 for o in objs)
    # slerp and lerp share exact endpoints (t=0 -> z_a, t=1 -> z_b),
    # so their endpoint meshes must be identical
    import numpy as np
    from latent_diffusion_models_for_shape_sdfs_tpu.pipeline import (
        run_interpolate)
    m_lerp = run_interpolate(str(exp), 0, 1, steps=2, res=24,
                             name="ends_l")
    m_slerp = run_interpolate(str(exp), 0, 1, steps=2, res=24,
                              mode="slerp", name="ends_s")
    for k in (0, 1):
        np.testing.assert_array_equal(m_lerp[k][0], m_slerp[k][0])
        np.testing.assert_array_equal(m_lerp[k][1], m_slerp[k][1])
    with pytest.raises(ValueError):
        run_interpolate(str(exp), 0, 99, steps=2, res=24)
    # LOD plumbing through the pipeline's dense decode branch
    from latent_diffusion_models_for_shape_sdfs_tpu.ops import isosurface
    lib = isosurface._native_mc_lib()
    if lib is not None and hasattr(lib, "simp_run"):
        m_lod = run_interpolate(str(exp), 0, 1, steps=2, res=24,
                                name="ends_lod", simplify_faces=200)
        for (v, f), (v0, f0) in zip(m_lod, m_lerp):
            assert 0 < len(f) <= 200 < len(f0)


def test_export_decoder_artifact(exp, tmp_path):
    out = tmp_path / "dec.zip"
    main(["export-decoder", str(exp), "--res", "32", "--out", str(out)])
    from latent_diffusion_models_for_shape_sdfs_tpu.export_artifact import (
        load_decode_program)
    art = load_decode_program(out)
    assert art.meta["res"] == 32
    import numpy as np
    from latent_diffusion_models_for_shape_sdfs_tpu.pipeline import (
        load_ad_state)
    _, st = load_ad_state(str(exp))
    g = art.grid(np.asarray(st.codes)[0])
    assert g.shape == (32, 32, 32)
    assert (g <= 0).any() and (g > 0).any()


def test_export_sampler_artifact(exp, tmp_path):
    out = tmp_path / "smp.zip"
    main(["export-sampler", str(exp), "--num", "4", "--steps", "6",
          "--sampler", "dpm", "--out", str(out)])
    from latent_diffusion_models_for_shape_sdfs_tpu.export_artifact import (
        load_sampler_program)
    art = load_sampler_program(out)
    assert art.meta["sampler"] == "dpm" and art.meta["num"] == 4
    z = art.sample_seed(0)
    import numpy as np
    assert z.shape == (4, 8) and np.isfinite(z).all()
    # unnormalization baked in: outputs live at code scale, not N(0,1)
    assert art.meta["unnormalized"]


def test_decode_scenes_and_codes_file(exp, tmp_path):
    main(["decode", str(exp), "--scene", "0", "1", "--res", "24"])
    objs = sorted((exp / "decoded").glob("scene_*.obj"))
    assert len(objs) == 2 and objs[0].stat().st_size > 100
    # same latents via a codes file -> identical meshes
    import numpy as np
    from latent_diffusion_models_for_shape_sdfs_tpu.pipeline import (
        load_ad_state)
    from latent_diffusion_models_for_shape_sdfs_tpu.utils import meshio
    _, st = load_ad_state(str(exp))
    np.save(tmp_path / "z.npy", np.asarray(st.codes)[:2])
    main(["decode", str(exp), "--codes", str(tmp_path / "z.npy"),
          "--res", "24", "--out", str(tmp_path / "dec")])
    v_a, _ = meshio.read_obj(objs[0])
    v_b, _ = meshio.read_obj(tmp_path / "dec" / "code_000.obj")
    np.testing.assert_array_equal(v_a, v_b)
    # --format ply writes binary PLY with the same geometry (PLY carries
    # exact f32 verts; OBJ text is %.6f-rounded)
    main(["decode", str(exp), "--codes", str(tmp_path / "z.npy"),
          "--res", "24", "--out", str(tmp_path / "dec_ply"),
          "--format", "ply"])
    v_p, f_p = meshio.read_ply(tmp_path / "dec_ply" / "code_000.ply")
    np.testing.assert_allclose(v_p, v_b, atol=1e-6)
    assert len(f_p) > 0
    # --simplify-faces LOD on the dense (non-hierarchical-res) path
    from latent_diffusion_models_for_shape_sdfs_tpu.ops import isosurface
    lib = isosurface._native_mc_lib()
    if lib is not None and hasattr(lib, "simp_run"):
        main(["decode", str(exp), "--scene", "0", "--res", "24",
              "--out", str(tmp_path / "lod"), "--simplify-faces", "300"])
        _, f_l = meshio.read_obj(tmp_path / "lod" / "scene_000.obj")
        assert 0 < len(f_l) <= 300
    # --normals writes unit vertex normals into the PLY
    main(["decode", str(exp), "--scene", "0", "--res", "24",
          "--out", str(tmp_path / "nrm"), "--format", "ply",
          "--normals"])
    _, _, nn = meshio.read_ply(tmp_path / "nrm" / "scene_000.ply",
                               with_normals=True)
    assert nn is not None
    np.testing.assert_allclose(np.linalg.norm(nn, axis=1), 1.0,
                               atol=1e-5)


def test_train_ad_resume(exp):
    # --resume restores the latest epoch and continues without error
    main(["train-ad", str(exp), "--resume"])
