from latent_diffusion_models_for_shape_sdfs_tpu.data import analytic as analytic  # noqa: F401
from latent_diffusion_models_for_shape_sdfs_tpu.data.sdf_dataset import (  # noqa: F401
    SdfDataset,
    SceneBatch,
)
