"""On-demand build of the native shared library."""

from __future__ import annotations

import logging
import os
import subprocess

log = logging.getLogger("native")

_DIR = os.path.dirname(os.path.abspath(__file__))
LIB_PATH = os.path.join(_DIR, "libbangnative.so")
_SOURCES = [
    os.path.join(_DIR, "objloader.cpp"),
    os.path.join(_DIR, "xcbwindow.cpp"),
]


def build_native(force: bool = False) -> str | None:
    """Compile the native library if needed.  Returns path or None."""
    if not force and os.path.exists(LIB_PATH):
        newest_src = max(os.path.getmtime(s) for s in _SOURCES)
        if os.path.getmtime(LIB_PATH) >= newest_src:
            return LIB_PATH
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        *_SOURCES, "-o", LIB_PATH, "-ldl",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return LIB_PATH
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError) as e:
        err = getattr(e, "stderr", b"")
        log.warning("native build failed: %s %s", e, err[:500] if err else "")
        return None


def native_available() -> bool:
    return build_native() is not None
