from latent_diffusion_models_for_shape_sdfs_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicated,
    batch_sharded,
)
from latent_diffusion_models_for_shape_sdfs_tpu.parallel.dp import (  # noqa: F401
    make_dp_ad_train_step,
    dp_ddim_sample,
    decode_points_sharded,
    make_dp_pairs_fn,
)
