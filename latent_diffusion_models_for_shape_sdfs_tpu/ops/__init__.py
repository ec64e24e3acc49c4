from latent_diffusion_models_for_shape_sdfs_tpu.ops.isosurface import (  # noqa: F401
    marching_tetrahedra,
    extract_mesh,
    extract_mesh_payload,
    simplify_mesh,
)
from latent_diffusion_models_for_shape_sdfs_tpu.ops.grid_eval import (  # noqa: F401
    make_grid_points,
    decode_grid,
    decode_grid_batch,
    flax_apply_fn,
    decode_grid_hierarchical,
    decode_grid_hierarchical_device,
    decode_grid_hierarchical3_sparse2,
    decode_grid_hierarchical3_batch_flat,
    probe_flat_caps,
    sparse2_to_grid,
    sparse2_fill2,
    hier3_int8_scale,
)
from latent_diffusion_models_for_shape_sdfs_tpu.ops.render import (  # noqa: F401
    render_sdf,
    render_turntable,
)
