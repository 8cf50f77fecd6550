"""Parity extras: physics facade, render system, wireframe, light controls,
window abstraction."""

import os

import numpy as np
import pytest

REF_ASSETS = "/root/reference/assets"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_ASSETS), reason="reference assets not mounted"
)


@needs_ref
class TestPhysicsFacade:
    @pytest.fixture(scope="class")
    def app(self):
        from banggameengine_tpu.app.application import Application

        a = Application(assets_root=REF_ASSETS, width=128, height=72)
        for _ in range(24):
            a.frame(real_dt=1 / 12)  # land CJ
        return a

    def test_global_raycast(self, app):
        from banggameengine_tpu.physics import api

        assert api.get_active_system() is app
        hit = api.raycast((0.0, 10.0, -5.0), (0.0, -1.0, 0.0), 100.0, mask=1)
        assert hit is not None
        ground = app.built.find_entity("ground")
        assert int(hit.entity) == ground
        assert float(hit.distance) == pytest.approx(10.0 - 0.99, abs=1e-3)

    def test_global_raycast_all(self, app):
        from banggameengine_tpu.physics import api

        hits = api.raycast_all((0.0, 10.0, -5.0), (0.0, -1.0, 0.0), 100.0)
        assert len(hits) >= 2  # CJ capsule + ground box + ground plane
        dists = [float(h.distance) for h in hits]
        assert dists == sorted(dists)

    def test_event_bus_via_facade(self, app):
        from banggameengine_tpu.physics import api

        assert api.get_event_bus() is app.bus

    def test_no_active_system(self):
        from banggameengine_tpu.physics import api

        saved = api.get_active_system()
        try:
            api.set_active_system(None)
            assert api.raycast((0, 0, 0), (0, -1, 0)) is None
            assert api.get_event_bus() is None
        finally:
            api.set_active_system(saved)


@needs_ref
class TestRenderSystem:
    @pytest.fixture(scope="class")
    def built(self):
        from banggameengine_tpu.physics.config import load_physics_config
        from banggameengine_tpu.scene import (
            ResourceManager, build_scene, parse_scene_json,
        )

        desc = parse_scene_json(os.path.join(REF_ASSETS, "scenes/demo.json"))
        return build_scene(
            desc, ResourceManager(assets_root=REF_ASSETS),
            load_physics_config(os.path.join(REF_ASSETS, "config/physics.json")),
        )

    def test_gather_submissions(self, built):
        from banggameengine_tpu.ecs.render_system import gather_submissions

        subs = gather_submissions(built.render)
        # demo: 4 CJ submeshes + 1 ground = 5 draws
        assert len(subs) == 5
        ents = {s.entity for s in subs}
        assert built.find_entity("cj") in ents
        assert built.find_entity("ground") in ents

    def test_render_subset(self, built):
        import jax.numpy as jnp

        from banggameengine_tpu.ecs.render_system import (
            gather_submissions, render_submissions,
        )
        from banggameengine_tpu.render.camera import Camera

        subs = gather_submissions(built.render)
        ground_only = [s for s in subs
                       if s.entity == built.find_entity("ground")]
        cam = Camera()
        cam.position = np.array([0.0, 7.0, -10.0], np.float32)  # see CJ spawn
        img = np.asarray(render_submissions(
            built.render, ground_only, built.initial_state.world,
            cam.view_matrix(), cam.proj_matrix(16 / 9),
            jnp.asarray(cam.position), 160, 90,
        ))
        full = np.asarray(render_submissions(
            built.render, subs, built.initial_state.world,
            cam.view_matrix(), cam.proj_matrix(16 / 9),
            jnp.asarray(cam.position), 160, 90,
        ))
        assert (img != full).any()  # CJ missing from the subset render


@needs_ref
class TestWireframeAndLights:
    @pytest.fixture(scope="class")
    def app(self):
        from banggameengine_tpu.app.application import Application

        a = Application(assets_root=REF_ASSETS, width=160, height=90)
        for _ in range(12):
            a.frame(real_dt=1 / 12)
        return a

    def test_wireframe_mode_differs(self, app):
        app.wireframe = False
        solid = app.render_current_frame()
        app.wireframe = True
        wire = app.render_current_frame()
        app.wireframe = False
        # wireframe shows much more sky/clear color
        sky = [0x88, 0xAA, 0xFF]
        assert (wire[..., :3] == sky).all(-1).mean() > \
            (solid[..., :3] == sky).all(-1).mean() + 0.05

    def test_light_keys_adjust_params(self, app):
        y0 = float(app.light.yaw)
        app.input.source.press("LEFT")
        app.frame(real_dt=0.1)
        app.input.source.release("LEFT")
        assert float(app.light.yaw) < y0
        a0 = float(app.light.ambient)
        app.input.source.press("X")
        app.frame(real_dt=0.1)
        app.input.source.release("X")
        assert float(app.light.ambient) > a0
        # R resets
        app.input.source.press("R")
        app.frame(real_dt=1 / 60)
        app.input.source.release("R")
        assert float(app.light.yaw) == pytest.approx(0.0)
        assert float(app.light.ambient) == pytest.approx(0.5)

    def test_ambient_changes_frame_brightness(self, app):
        import dataclasses

        import jax.numpy as jnp

        from banggameengine_tpu.render.shading import LightParams

        app.light = LightParams.default()
        dark = app.render_current_frame().astype(int)
        app.light = dataclasses.replace(
            LightParams.default(), ambient=jnp.float32(1.0)
        )
        bright = app.render_current_frame().astype(int)
        app.light = LightParams.default()
        sky = (dark[..., :3] == [0x88, 0xAA, 0xFF]).all(-1)
        assert bright[~sky].mean() > dark[~sky].mean() + 5


class TestWindow:
    def test_headless_window_records(self, tmp_path):
        from banggameengine_tpu.app.window import HeadlessWindow

        frames = []
        w = HeadlessWindow(64, 32, frame_sink=frames.append,
                           record_dir=str(tmp_path / "rec"))
        img = np.zeros((32, 64, 4), np.uint8)
        w.present(img)
        w.present(img)
        assert len(frames) == 2
        assert len(os.listdir(tmp_path / "rec")) == 2

    def test_create_window_falls_back(self):
        from banggameengine_tpu.app.window import HeadlessWindow, create_window

        w = create_window(320, 180)
        assert isinstance(w, HeadlessWindow)  # no glfw in this image
        assert w.keys_down() == set()
