"""make_frame_fn: the interactive tick (step + shaded frame, one host call)."""

import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from banggameengine_tpu.engine import engine_step
from banggameengine_tpu.render.camera import Camera
from banggameengine_tpu.render.pipeline import make_frame_fn, render_frame
from banggameengine_tpu.state import InputFrame

W, H = 160, 90
ASSETS = os.environ.get("BANG_ASSETS_DIR", "/root/reference/assets")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ASSETS), reason="needs demo assets")


@pytest.fixture(scope="module")
def built():
    from banggameengine_tpu.physics.config import load_physics_config
    from banggameengine_tpu.scene import (
        ResourceManager, build_scene, parse_scene_json,
    )

    return build_scene(
        parse_scene_json(os.path.join(ASSETS, "scenes/demo.json")),
        ResourceManager(assets_root=ASSETS),
        load_physics_config(os.path.join(ASSETS, "config/physics.json")),
    )


def _camera():
    cam = Camera()
    cam.position[:] = (0.0, 4.0, -10.5)
    cam.set_yaw_pitch(math.pi / 2, -0.12)
    return (jnp.asarray(cam.view_matrix()),
            jnp.asarray(cam.proj_matrix(W / H)),
            jnp.asarray(cam.position))


def test_frame_fn_strict_matches_separate_step_and_render(built):
    view, proj, cam_pos = _camera()
    inp = InputFrame.zero()

    # reference: explicit engine_step + render_frame
    ref_s, _ = jax.jit(engine_step)(built.initial_state, inp, built.static)
    ref_img = np.asarray(jax.jit(
        lambda rs, w: render_frame(rs, w, view, proj, cam_pos,
                                   width=W, height=H, bin_capacity=256)
    )(built.render, ref_s.world))

    ffn = make_frame_fn(built, W, H, bin_capacity=256)  # strict default
    # donation consumes the input state; feed a copy so the shared
    # module fixture stays alive for other tests
    s0 = jax.tree.map(jnp.array, built.initial_state)
    s2, img, ev = ffn(s0, inp, view, proj, cam_pos)

    np.testing.assert_array_equal(np.asarray(img), ref_img)
    np.testing.assert_allclose(np.asarray(s2.pos), np.asarray(ref_s.pos))
    # sky clear where nothing drawn (top-left corner)
    assert tuple(ref_img[0, 0, :3]) == (0x88, 0xAA, 0xFF)


def test_frame_fn_pipelined_renders_pre_step_world(built):
    """pipelined=True draws the CURRENT state (one tick of latency) while
    stepping; frame N's image equals a render of state N's world."""
    view, proj, cam_pos = _camera()
    inp = InputFrame.zero()

    ref_img = np.asarray(jax.jit(
        lambda rs, w: render_frame(rs, w, view, proj, cam_pos,
                                   width=W, height=H, bin_capacity=256)
    )(built.render, built.initial_state.world))

    ffn = make_frame_fn(built, W, H, bin_capacity=256, pipelined=True)
    s0 = jax.tree.map(jnp.array, built.initial_state)
    t0 = float(s0.time)
    s2, img, ev = ffn(s0, inp, view, proj, cam_pos)

    np.testing.assert_array_equal(np.asarray(img), ref_img)
    assert float(s2.time) > t0      # the state still advanced


def test_frame_fn_carries_trigger_events(built):
    """The fused interactive tick must have gameplay-event parity: placing
    CJ inside the checkpoint trigger fires ENTER through the frame fn
    (round-2 VERDICT weak #5: events were silently discarded)."""
    view, proj, cam_pos = _camera()
    ffn = make_frame_fn(built, W, H, bin_capacity=256)
    cj = built.find_entity("cj")
    s = jax.tree.map(jnp.array, built.initial_state)
    # drop CJ into the checkpoint volume (trigger box 1.5^3 at (5, 1, 5))
    from banggameengine_tpu.state import tree_replace
    s = tree_replace(s, pos=s.pos.at[cj].set(jnp.asarray([5.0, 1.0, 5.0])))
    inp = InputFrame.zero()
    s, _img, ev = ffn(s, inp, view, proj, cam_pos)
    assert bool(ev.trigger_enter[0, cj])
    # second frame: still inside -> stay, not enter
    s, _img, ev = ffn(s, inp, view, proj, cam_pos)
    assert not bool(ev.trigger_enter[0, cj])
    assert bool(ev.trigger_stay[0, cj])


def test_frame_fn_substeps_accumulator(built):
    """substeps=2 drains two fixed steps per frame (the reference's
    accumulator at 60 Hz display / 120 Hz sim) and stacks events."""
    view, proj, cam_pos = _camera()
    inp = InputFrame.zero()

    ref_s = jax.tree.map(jnp.array, built.initial_state)
    sfn = jax.jit(engine_step)
    for _ in range(2):
        ref_s, _ = sfn(ref_s, inp, built.static)
    ref_img = np.asarray(jax.jit(
        lambda rs, w: render_frame(rs, w, view, proj, cam_pos,
                                   width=W, height=H, bin_capacity=256)
    )(built.render, ref_s.world))

    ffn = make_frame_fn(built, W, H, bin_capacity=256, substeps=2)
    s0 = jax.tree.map(jnp.array, built.initial_state)
    s2, img, ev = ffn(s0, inp, view, proj, cam_pos)
    np.testing.assert_allclose(np.asarray(s2.pos), np.asarray(ref_s.pos),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(img), ref_img)
    assert ev.trigger_enter.shape[0] == 2  # leading substep axis


def test_frame_fn_merged_single_executable_parity(built):
    view, proj, cam_pos = _camera()
    inp = InputFrame.zero()
    ffn = make_frame_fn(built, W, H, bin_capacity=256)
    mfn = make_frame_fn(built, W, H, bin_capacity=256, merged=True)
    s_a = jax.tree.map(jnp.array, built.initial_state)
    s_b = jax.tree.map(jnp.array, built.initial_state)
    s_a, img_a, ev_a = ffn(s_a, inp, view, proj, cam_pos)
    s_b, img_b, ev_b = mfn(s_b, inp, view, proj, cam_pos)
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
    np.testing.assert_array_equal(np.asarray(ev_a.trigger_enter),
                                  np.asarray(ev_b.trigger_enter))
    np.testing.assert_allclose(np.asarray(s_a.pos), np.asarray(s_b.pos))


def test_interpolated_world_blends_substeps(built):
    """Motion-state interpolation (PhysicsSystem.cpp:848-875): alpha=0
    reproduces the previous step's world, alpha=1 the current one, and
    alpha=0.5 lands positions midway."""
    from banggameengine_tpu.engine import engine_step, interpolated_world

    inp = InputFrame.zero()
    sfn = jax.jit(engine_step)
    s1, _ = sfn(jax.tree.map(jnp.array, built.initial_state), inp,
                built.static)
    s2, _ = sfn(s1, inp, built.static)  # CJ falling

    w0 = np.asarray(interpolated_world(s1, s2, 0.0, built.static))
    w1 = np.asarray(interpolated_world(s1, s2, 1.0, built.static))
    wh = np.asarray(interpolated_world(s1, s2, 0.5, built.static))
    np.testing.assert_allclose(w0, np.asarray(s1.world), atol=1e-6)
    np.testing.assert_allclose(w1, np.asarray(s2.world), atol=1e-6)
    cj = built.find_entity("cj")
    y0, y1, yh = w0[cj, 1, 3], w1[cj, 1, 3], wh[cj, 1, 3]
    assert y1 < y0  # falling
    np.testing.assert_allclose(yh, 0.5 * (y0 + y1), atol=1e-6)


def test_frame_fn_chains_with_donation(built):
    view, proj, cam_pos = _camera()
    ffn = make_frame_fn(built, W, H, bin_capacity=256)
    inp = InputFrame.zero()
    s = jax.tree.map(jnp.array, built.initial_state)
    t0 = float(s.time)
    for _ in range(3):
        s, img, _ev = ffn(s, inp, view, proj, cam_pos)
    assert float(s.time) == pytest.approx(
        t0 + 3 * float(built.static.fixed_dt), rel=1e-5)
    assert np.asarray(img).shape == (H, W, 4)
