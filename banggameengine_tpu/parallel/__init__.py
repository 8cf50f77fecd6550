from banggameengine_tpu.parallel.manyworld import (
    make_world_mesh,
    make_many_world_step,
    make_sharded_many_world_step,
    make_flat_many_world_step,
    replicate_state,
    replicate_input,
)

__all__ = [
    "make_world_mesh",
    "make_many_world_step",
    "make_sharded_many_world_step",
    "make_flat_many_world_step",
    "replicate_state",
    "replicate_input",
]
