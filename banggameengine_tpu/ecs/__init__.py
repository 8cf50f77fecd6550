from banggameengine_tpu.ecs.transform import (
    compute_levels,
    update_world_matrices,
)

__all__ = ["compute_levels", "update_world_matrices"]
