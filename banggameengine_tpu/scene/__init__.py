from banggameengine_tpu.scene.schema import SceneDesc, parse_scene_json
from banggameengine_tpu.scene.resources import ResourceManager
from banggameengine_tpu.scene.build import build_scene, BuiltScene

__all__ = [
    "SceneDesc",
    "parse_scene_json",
    "ResourceManager",
    "build_scene",
    "BuiltScene",
]
