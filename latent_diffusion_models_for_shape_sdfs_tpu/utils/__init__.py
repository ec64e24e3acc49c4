from latent_diffusion_models_for_shape_sdfs_tpu.utils.logging import (  # noqa: F401
    MetricLogger,
)
from latent_diffusion_models_for_shape_sdfs_tpu.utils import meshio as meshio  # noqa: F401
from latent_diffusion_models_for_shape_sdfs_tpu.utils.checkpoint import (  # noqa: F401
    StageCheckpointer,
)
from latent_diffusion_models_for_shape_sdfs_tpu.utils import profiling as profiling  # noqa: F401
