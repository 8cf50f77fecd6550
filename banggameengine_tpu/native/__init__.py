"""Native (C++) runtime components, loaded via ctypes.

Build on demand with :func:`build_native` (g++ -O2 -shared); every native
entry point has a pure-Python fallback so the framework works without a
toolchain.  Python implementations remain the semantics-defining reference.
"""

from banggameengine_tpu.native.build import build_native, native_available
from banggameengine_tpu.native.objloader_binding import load_obj_native

__all__ = ["build_native", "native_available", "load_obj_native"]
