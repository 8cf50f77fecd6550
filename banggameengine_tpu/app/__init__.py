from banggameengine_tpu.app.events import EventBus, TriggerEvent
from banggameengine_tpu.app.timing import Time
from banggameengine_tpu.app.input import InputSystem
from banggameengine_tpu.app.orbit import CameraOrbitController
from banggameengine_tpu.app.application import Application

__all__ = [
    "EventBus",
    "TriggerEvent",
    "Time",
    "InputSystem",
    "CameraOrbitController",
    "Application",
]
