"""Window/presentation layer tests (headless CI: no X server).

The native xcb presenter must build, fail gracefully without a display, and
expose a sane keysym map; create_window must degrade to HeadlessWindow
(the reference's Noop-backend fallback chain, Renderer.cpp:146-157).
"""

import numpy as np
import pytest

from banggameengine_tpu.app.window import (
    HeadlessWindow, XcbWindow, create_window,
)
from banggameengine_tpu.native.build import build_native


def test_native_lib_builds_with_window():
    assert build_native() is not None


def test_xcb_window_graceful_without_display(monkeypatch):
    monkeypatch.delenv("DISPLAY", raising=False)
    with pytest.raises(RuntimeError):
        XcbWindow(320, 200)


def test_create_window_falls_back_headless(monkeypatch):
    monkeypatch.delenv("DISPLAY", raising=False)
    w = create_window(320, 200)
    assert isinstance(w, HeadlessWindow)


def test_keysym_names_cover_reference_bindings():
    from banggameengine_tpu.native.xcbwindow_binding import _KEYSYM_NAMES

    # the names bindings.json uses (InputSystem.cpp:26-79 KeyFromString)
    names = set(_KEYSYM_NAMES.values())
    for required in ["W", "A", "S", "D", "SPACE", "LEFT_SHIFT", "ESCAPE",
                     "F1", "F3", "F5", "F9", "V", "Z", "X", "C", "B", "N",
                     "R", "UP", "DOWN", "LEFT", "RIGHT"]:
        assert required in names, required


def test_headless_present_sink():
    got = []
    w = HeadlessWindow(64, 32, frame_sink=got.append)
    frame = np.zeros((32, 64, 4), np.uint8)
    w.present(frame)
    assert len(got) == 1 and got[0].shape == (32, 64, 4)
