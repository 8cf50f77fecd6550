"""Kinematic body motion (reference parity: SyncKinematicBodiesToPhysics,
PhysicsSystem.cpp:952-989 — kinematic transforms are pushed into the world
every tick so platforms push and carry dynamic bodies)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from banggameengine_tpu.engine import make_step_fn
from banggameengine_tpu.physics.kinematic import (
    set_kinematic_target,
    set_kinematic_velocity,
    velocity_to_target,
    warp_kinematic,
)
from banggameengine_tpu.scene.synthetic import build_falling_boxes
from banggameengine_tpu.state import BODY_KINEMATIC, InputFrame
from banggameengine_tpu import math3d


def _platform_world(platform_half=(2.0, 0.25, 2.0), platform_y=1.0):
    """Two bodies: entity 0 = dynamic unit box resting on entity 1 =
    kinematic platform."""
    state, static = build_falling_boxes(2, seed=0, spread=0.0)
    # entity 1 -> kinematic platform
    static = dataclasses.replace(
        static,
        body_type=static.body_type.at[1].set(BODY_KINEMATIC),
        inv_mass=static.inv_mass.at[1].set(0.0),
        inv_inertia_body=static.inv_inertia_body.at[1].set(jnp.zeros(3)),
        shape_size=static.shape_size.at[1].set(jnp.asarray(platform_half)),
        friction=static.friction.at[0].set(0.9).at[1].set(0.9),
    )
    box_y = platform_y + platform_half[1] + 0.5
    state = dataclasses.replace(
        state,
        pos=state.pos.at[0].set(jnp.asarray([0.0, box_y + 0.2, 0.0]))
                 .at[1].set(jnp.asarray([0.0, platform_y, 0.0])),
        quat=jnp.tile(jnp.asarray([0, 0, 0, 1.0], jnp.float32), (state.capacity, 1)),
    )
    return state, static


def test_kinematic_zero_velocity_stays_put():
    state, static = _platform_world()
    fn = make_step_fn(static, donate=False)
    s = state
    for _ in range(60):
        s, _ = fn(s, InputFrame.zero())
    # no gravity, no drift for the kinematic platform
    np.testing.assert_allclose(np.asarray(s.pos[1]), [0.0, 1.0, 0.0], atol=1e-6)


def test_kinematic_platform_carries_box():
    state, static = _platform_world()
    fn = make_step_fn(static, donate=False)
    s = state
    # settle the box onto the platform
    for _ in range(120):
        s, _ = fn(s, InputFrame.zero())
    rest_y = float(s.pos[0, 1])
    assert abs(rest_y - 1.75) < 0.05, rest_y  # platform top 1.25 + half 0.5

    # drive the platform sideways at 1 u/s; friction must carry the box
    s = set_kinematic_velocity(s, 1, [1.0, 0.0, 0.0])
    for _ in range(240):  # 2 s
        s, _ = fn(s, InputFrame.zero())
    px = float(s.pos[1, 0])
    bx = float(s.pos[0, 0])
    bvx = float(s.lin_vel[0, 0])
    assert abs(px - 2.0) < 1e-3, px          # platform moved exactly v*t
    assert bvx > 0.8, bvx                     # box dragged to ~platform speed
    assert bx > 1.0, bx                       # and displaced with it
    # box still riding (not fallen off the 2.0-half platform)
    assert abs(float(s.pos[0, 1]) - rest_y) < 0.1


def test_kinematic_platform_pushes_box_up():
    state, static = _platform_world()
    fn = make_step_fn(static, donate=False)
    s = state
    for _ in range(120):
        s, _ = fn(s, InputFrame.zero())
    s = set_kinematic_velocity(s, 1, [0.0, 0.5, 0.0])
    for _ in range(120):  # 1 s: platform rises 0.5
        s, _ = fn(s, InputFrame.zero())
    assert abs(float(s.pos[1, 1]) - 1.5) < 1e-3
    # box rides up with it
    assert float(s.pos[0, 1]) > 2.1


def test_kinematic_immovable_by_impacts():
    state, static = _platform_world()
    # drop the dynamic box from high above
    state = dataclasses.replace(
        state, pos=state.pos.at[0].set(jnp.asarray([0.0, 6.0, 0.0])))
    fn = make_step_fn(static, donate=False)
    s = state
    for _ in range(300):
        s, _ = fn(s, InputFrame.zero())
    # impact never moves the platform or gives it velocity
    np.testing.assert_allclose(np.asarray(s.pos[1]), [0.0, 1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.lin_vel[1]), 0.0, atol=1e-7)
    # and the box rests on top
    assert abs(float(s.pos[0, 1]) - 1.75) < 0.05


def test_set_kinematic_target_lands_exactly():
    state, static = _platform_world()
    dt = float(static.fixed_dt)
    fn = make_step_fn(static, donate=False)
    target_pos = jnp.asarray([0.3, 1.2, -0.4])
    target_quat = math3d.quat_from_axis_angle(
        jnp.asarray([0.0, 1.0, 0.0]), jnp.float32(0.3))
    s = set_kinematic_target(state, 1, target_pos, target_quat, dt=dt)
    s, _ = fn(s, InputFrame.zero())
    np.testing.assert_allclose(np.asarray(s.pos[1]), np.asarray(target_pos),
                               atol=1e-5)
    q = np.asarray(s.quat[1])
    tq = np.asarray(target_quat)
    # quat_integrate is first-order: a 0.3 rad single-step rotation lands
    # within ~angle^3/24 of the target
    assert min(np.abs(q - tq).max(), np.abs(q + tq).max()) < 5e-3


def test_velocity_to_target_roundtrip():
    q0 = math3d.quat_from_euler_xyz(jnp.asarray([0.2, -0.5, 0.1]))
    q1 = math3d.quat_from_euler_xyz(jnp.asarray([0.3, 0.4, -0.2]))
    p0 = jnp.asarray([1.0, 2.0, 3.0])
    p1 = jnp.asarray([-1.0, 0.5, 2.0])
    dt = 1 / 120
    lin, ang = velocity_to_target(p0, q0, p1, q1, dt)
    p = p0 + lin * dt
    q = math3d.quat_integrate(q0, ang, jnp.float32(dt))
    np.testing.assert_allclose(np.asarray(p), np.asarray(p1), atol=1e-5)
    # quat_integrate is first-order; tolerance scales with angle^2
    qn = np.asarray(q / jnp.linalg.norm(q))
    tq = np.asarray(q1)
    assert min(np.abs(qn - tq).max(), np.abs(qn + tq).max()) < 5e-3


def test_warp_kinematic():
    state, static = _platform_world()
    s = set_kinematic_velocity(state, 1, [1.0, 0.0, 0.0])
    s = warp_kinematic(s, 1, [9.0, 3.0, 9.0])
    np.testing.assert_allclose(np.asarray(s.pos[1]), [9.0, 3.0, 9.0])
    np.testing.assert_allclose(np.asarray(s.lin_vel[1]), 0.0)
