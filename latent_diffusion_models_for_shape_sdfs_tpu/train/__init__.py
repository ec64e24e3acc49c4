from latent_diffusion_models_for_shape_sdfs_tpu.train.auto_decoder import (  # noqa: F401
    AdTrainState,
    make_ad_train_step,
    train_auto_decoder,
)
from latent_diffusion_models_for_shape_sdfs_tpu.train.diffusion import (  # noqa: F401
    DiffTrainState,
    train_diffusion,
    normalize_codes,
)
from latent_diffusion_models_for_shape_sdfs_tpu.train.encoder import (  # noqa: F401
    EncTrainState,
    train_encoder,
)
