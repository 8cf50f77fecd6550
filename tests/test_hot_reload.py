"""Config hot-reload end-to-end: the three mtime-polled JSON configs
(physics / camera / input) picked up by a live Application without restart
or recompile (reference: PhysicsSystem.cpp:216-324, InputSystem.cpp:347-365,
CameraOrbitController.cpp:66-170)."""

import json
import os
import shutil
import time

import numpy as np
import pytest

REF_ASSETS = "/root/reference/assets"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ASSETS), reason="reference assets not mounted"
)


@pytest.fixture
def writable_assets(tmp_path):
    """Copy of the reference assets we can mutate."""
    dst = tmp_path / "assets"
    shutil.copytree(REF_ASSETS, dst)
    return str(dst)


def _bump_mtime(path):
    future = time.time() + 10
    os.utime(path, (future, future))


def test_physics_config_hot_reload(writable_assets):
    from banggameengine_tpu.app.application import Application

    app = Application(assets_root=writable_assets, width=96, height=54)
    assert app.config.gravity == pytest.approx(-9.81)

    cfg_path = os.path.join(writable_assets, "config/physics.json")
    with open(cfg_path) as f:
        data = json.load(f)
    data["gravity"] = -1.0  # moon mode
    with open(cfg_path, "w") as f:
        json.dump(data, f)
    _bump_mtime(cfg_path)

    app.frame(real_dt=1 / 120)
    assert app.config.gravity == pytest.approx(-1.0)
    assert float(app.built.static.gravity) == pytest.approx(-1.0)

    # behavior check: character falls visibly slower now
    cj = app.built.find_entity("cj")
    y0 = float(app.state.pos[cj, 1])
    for _ in range(6):
        app.frame(real_dt=1 / 12)
    fall_moon = y0 - float(app.state.pos[cj, 1])
    assert 0 < fall_moon < 0.8  # would be ~1.2 under -9.81 after 0.5 s


def test_camera_config_hot_reload(writable_assets):
    from banggameengine_tpu.app.application import Application

    app = Application(assets_root=writable_assets, width=96, height=54)
    assert app.orbit.cfg_distance == pytest.approx(6.0)

    cfg_path = os.path.join(writable_assets, "config/camera.json")
    with open(cfg_path) as f:
        data = json.load(f)
    data["distance"] = 9.5
    with open(cfg_path, "w") as f:
        json.dump(data, f)
    _bump_mtime(cfg_path)

    for _ in range(30):  # let smoothing converge
        app.frame(real_dt=1 / 30)
    assert app.orbit.cfg_distance == pytest.approx(9.5)
    cj = app.built.find_entity("cj")
    tpos = np.asarray(app.state.world[cj][:3, 3])
    d = np.linalg.norm(app.camera.position - tpos)
    assert d == pytest.approx(9.5, rel=0.05)


def test_bindings_hot_reload(writable_assets):
    from banggameengine_tpu.app.application import Application

    app = Application(assets_root=writable_assets, width=96, height=54)
    bind_path = os.path.join(writable_assets, "input/bindings.json")
    with open(bind_path) as f:
        data = json.load(f)
    # rebind MoveForward to the I key
    data["axes"]["MoveForward"] = [{"key": "I", "scale": 1.0}]
    with open(bind_path, "w") as f:
        json.dump(data, f)
    _bump_mtime(bind_path)

    app.frame(real_dt=1 / 120)
    app.input.source.press("W")
    app.input.update()
    assert app.input.get_axis("MoveForward") == 0.0  # W no longer bound
    app.input.source.release("W")
    app.input.source.press("I")
    app.input.update()
    assert app.input.get_axis("MoveForward") == 1.0
