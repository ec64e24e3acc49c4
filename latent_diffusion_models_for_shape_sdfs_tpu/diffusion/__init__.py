from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.schedule import (  # noqa: F401
    DiffusionSchedule,
)
from latent_diffusion_models_for_shape_sdfs_tpu.diffusion.sampler import (  # noqa: F401
    ddpm_sample,
    ddim_sample,
    dpm_solver_sample,
)
