from latent_diffusion_models_for_shape_sdfs_tpu.cli import main

main()
