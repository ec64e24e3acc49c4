from latent_diffusion_models_for_shape_sdfs_tpu.models.decoder import (  # noqa: F401
    SdfDecoder,
    WNLinear,
)
from latent_diffusion_models_for_shape_sdfs_tpu.models.latent_table import (  # noqa: F401
    LatentTable,
    init_latent_table,
    gather_codes,
)
from latent_diffusion_models_for_shape_sdfs_tpu.models.denoiser import (  # noqa: F401
    LatentDenoiserMLP,
    LatentDenoiserUNet,
    PartialSdfEncoder,
    make_denoiser,
)
from latent_diffusion_models_for_shape_sdfs_tpu.models.encoder import (  # noqa: F401
    LatentEncoder,
    encode_latent,
)
