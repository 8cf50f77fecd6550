"""Kinematic character controller.

Reproduces the *observable* behaviors of the reference's
``btKinematicCharacterController`` usage (``PhysicsSystem.cpp:709-846``), not
Bullet's internals (SURVEY.md §7 "Hard parts"):

- camera-yaw-relative WASD walk at ``walkSpeed``, sprint x1.8
  (``PhysicsSystem.cpp:35``, ``:790-846``);
- jump sets vertical speed to ``jumpImpulse`` only when on ground
  (``setJumpSpeed`` + ``canJump``, ``:834-844``);
- gravity from config, fall speed clamped to 3*|g| (``setFallSpeed``,
  ``:763``);
- capsule from config, NOT scaled by the entity transform (``:735``);
- step height: penetration recovery may lift the capsule up to
  ``stepHeight`` per tick;
- slope limit: ground contacts steeper than ``maxSlope`` don't count as
  support (``setMaxSlope``, ``:760``).

The controller is a ghost object: it pushes **itself** out of world geometry
but applies no impulses to dynamic bodies (Bullet ghost semantics).
Implemented as a fixed-iteration depenetration loop against all colliders +
the implicit ground plane, fully vectorized over character slots via vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from banggameengine_tpu import math3d
from banggameengine_tpu.physics import narrowphase as nf
from banggameengine_tpu.physics.config import SPRINT_MULTIPLIER
from banggameengine_tpu.state import SHAPE_BOX, SHAPE_CAPSULE

Array = jax.Array

DEPENETRATION_ITERS = 4
CONTACT_TOLERANCE = 0.05   # ground-support probe distance


def walk_velocity(move_forward, move_right, cam_yaw, walk_speed, sprint):
    """Horizontal walk velocity from input axes, camera-relative
    (``HandleCharacterInput``, PhysicsSystem.cpp:790-846)."""
    fwd = math3d.yaw_pitch_forward(cam_yaw, jnp.float32(0.0))
    fwd = fwd.at[1].set(0.0)
    fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-9)
    right = jnp.cross(fwd, jnp.asarray([0.0, 1.0, 0.0], jnp.float32))
    right = -right  # match reference: right = up x fwd
    wish = fwd * move_forward + right * move_right
    norm = jnp.linalg.norm(wish)
    wish = jnp.where(norm > 1e-6, wish / jnp.maximum(norm, 1e-9), 0.0)
    speed = walk_speed * jnp.where(sprint, SPRINT_MULTIPLIER, 1.0)
    return wish * speed


def _capsule_world_contacts(
    c_pos, radius, half_height,
    pos, quat, shape_type, size, obstacle_mask,
):
    """Contacts of an upright capsule at ``c_pos`` against all entity shapes
    plus the ground plane.  Returns (normals [M,3] pushing the capsule out,
    depths [M], valid [M]) with M = 3*N + 2."""
    n = pos.shape[0]
    ts = jnp.asarray([0.0, 0.5, 1.0], jnp.float32)
    lo = c_pos - jnp.asarray([0.0, 1.0, 0.0]) * half_height
    hi = c_pos + jnp.asarray([0.0, 1.0, 0.0]) * half_height
    samples = lo[None, :] + (hi - lo)[None, :] * ts[:, None]      # [3,3]

    # vs boxes: sphere-box per (sample, entity)
    d_box, n_box, _ = nf._sphere_box_contact(
        samples[:, None, :], radius,
        pos[None, :], quat[None, :], size[None, :],
    )  # [3,N]
    is_box = (shape_type == SHAPE_BOX)[None, :]
    valid_box = is_box & obstacle_mask[None, :]

    # vs capsules: segment-segment against each entity capsule
    seg_a, seg_b = _entity_capsule_segments(pos, quat, size)
    c1, c2 = _closest_seg(lo, hi, seg_a, seg_b)                    # [N,3] each
    delta = c1 - c2
    dist = jnp.linalg.norm(delta, axis=-1)
    n_cap = jnp.where(
        dist[:, None] > 1e-9,
        delta / jnp.maximum(dist, 1e-9)[:, None],
        jnp.asarray([0.0, 1.0, 0.0]),
    )
    d_cap = radius + size[:, 0] - dist                              # [N]
    is_cap = shape_type == SHAPE_CAPSULE
    valid_cap = is_cap & obstacle_mask

    # ground plane: both end spheres
    d_gnd = jnp.stack([radius - lo[1], radius - hi[1]])
    n_gnd = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (2, 3))

    normals = jnp.concatenate([n_box.reshape(3 * n, 3), n_cap, n_gnd], axis=0)
    depths = jnp.concatenate([d_box.reshape(3 * n), d_cap, d_gnd], axis=0)
    valid = jnp.concatenate(
        [jnp.broadcast_to(valid_box, (3, n)).reshape(3 * n), valid_cap,
         jnp.ones(2, bool)],
        axis=0,
    )
    return normals, depths, valid


def _entity_capsule_segments(pos, quat, size):
    up = jnp.zeros_like(pos).at[:, 1].set(size[:, 1])
    axis = math3d.quat_rotate(quat, up)
    return pos - axis, pos + axis


def _closest_seg(p1, q1, p2, q2):
    from banggameengine_tpu.physics.shapes import closest_segment_segment

    return closest_segment_segment(
        jnp.broadcast_to(p1, p2.shape), jnp.broadcast_to(q1, q2.shape), p2, q2
    )


def step_character(
    c_pos: Array,          # f32[3] capsule center (world)
    vel_y: Array,          # f32[] vertical velocity
    on_ground: Array,      # bool[]
    radius: Array, half_height: Array,
    walk_speed: Array, jump_speed: Array,
    inp_forward, inp_right, inp_jump, inp_sprint, cam_yaw,
    pos, quat, shape_type, size, obstacle_mask,
    gravity, dt, step_height, max_slope_cos,
):
    """Advance one character by one fixed step.

    Returns (new_center, new_vel_y, new_on_ground).
    """
    # -- input-driven horizontal walk --
    walk = walk_velocity(inp_forward, inp_right, cam_yaw, walk_speed, inp_sprint)

    # -- vertical dynamics --
    do_jump = inp_jump & on_ground
    vel_y = jnp.where(do_jump, jump_speed, vel_y)
    vel_y = vel_y + gravity * dt
    fall_cap = 3.0 * jnp.abs(gravity)  # setFallSpeed(|g|*3), :763
    vel_y = jnp.clip(vel_y, -fall_cap, jnp.inf)

    # -- proposed motion --
    disp = walk * dt + jnp.asarray([0.0, 1.0, 0.0]) * (vel_y * dt)
    new_pos = c_pos + disp

    # -- depenetration loop --
    def depen_body(_, p):
        normals, depths, valid = _capsule_world_contacts(
            p, radius, half_height, pos, quat, shape_type, size, obstacle_mask
        )
        pen = jnp.where(valid, depths, -jnp.inf)
        worst = jnp.argmax(pen)
        d = jnp.maximum(pen[worst], 0.0)
        push = normals[worst] * d
        # step-height rule: never push below more than stepHeight upward
        # in one go (prevents teleporting up tall walls)
        push_y = jnp.clip(push[1], -step_height, step_height + radius)
        push = push.at[1].set(push_y)
        return jnp.where(d > 0.0, p + push, p)

    new_pos = jax.lax.fori_loop(0, DEPENETRATION_ITERS, depen_body, new_pos)

    # -- ground support probe --
    normals, depths, valid = _capsule_world_contacts(
        new_pos, radius, half_height, pos, quat, shape_type, size, obstacle_mask
    )
    support = valid & (depths > -CONTACT_TOLERANCE) & (normals[:, 1] > max_slope_cos)
    grounded = jnp.any(support)
    vel_y = jnp.where(grounded & (vel_y < 0.0), 0.0, vel_y)

    return new_pos, vel_y, grounded
