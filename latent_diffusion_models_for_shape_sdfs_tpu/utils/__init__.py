from latent_diffusion_models_for_shape_sdfs_tpu.utils.logging import (  # noqa: F401
    MetricLogger,
)
from latent_diffusion_models_for_shape_sdfs_tpu.utils import meshio as meshio  # noqa: F401
