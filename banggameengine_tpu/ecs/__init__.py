from banggameengine_tpu.ecs.lifecycle import (
    despawn,
    free_slots,
    is_alive,
    reparent,
    spawn,
)
from banggameengine_tpu.ecs.transform import (
    compute_levels,
    update_world_matrices,
)

__all__ = [
    "compute_levels",
    "update_world_matrices",
    "spawn",
    "despawn",
    "reparent",
    "is_alive",
    "free_slots",
]
