"""banggameengine_tpu — a TPU-native simulation/game engine in JAX.

Brand-new implementation of the capabilities of the reference C++ engine
Skeletus/BangGameEngine (ECS + Bullet physics + bgfx renderer; see SURVEY.md):
structure-of-arrays world state in HBM, jitted physics/transform/render
pipelines, vmapped many-world simulation, pjit/shard_map scaling over TPU
meshes.
"""

__version__ = "0.1.0"

from banggameengine_tpu import math3d  # noqa: F401
from banggameengine_tpu.state import (  # noqa: F401
    InputFrame,
    StaticScene,
    StepEvents,
    WorldState,
)
