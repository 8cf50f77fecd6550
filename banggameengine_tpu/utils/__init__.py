from banggameengine_tpu.utils.checkpoint import (
    save_checkpoint,
    load_checkpoint,
)
from banggameengine_tpu.utils.profiling import StepTimer, trace_annotation

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "StepTimer",
    "trace_annotation",
]
