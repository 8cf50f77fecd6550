from banggameengine_tpu.render.camera import Camera
from banggameengine_tpu.render.pipeline import render_frame

__all__ = ["Camera", "render_frame"]
