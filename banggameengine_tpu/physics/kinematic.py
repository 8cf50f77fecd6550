"""Kinematic body driving: host-side API for animated platforms.

The reference pushes kinematic Transforms into the physics world every tick
(``SyncKinematicBodiesToPhysics``, ``PhysicsSystem.cpp:952-989``) so Bullet
derives their velocity and lets them push/carry dynamic bodies.  Here the
equivalent is velocity-level: the host computes the velocity that moves a
kinematic body onto its target transform over one fixed step and writes it
into ``WorldState``; the step integrates kinematic bodies by that velocity
and feeds it into contact relative velocity (friction drags riders along,
normal impulses push obstacles away).  Kinematic bodies have inv_mass 0 so
they never receive impulses themselves.

All functions are pure pytree -> pytree and jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from banggameengine_tpu import math3d
from banggameengine_tpu.state import WorldState, tree_replace

Array = jax.Array


def velocity_to_target(
    pos: Array, quat: Array, target_pos: Array, target_quat: Array, dt
) -> tuple[Array, Array]:
    """(lin_vel, ang_vel) that carries (pos, quat) onto the target in dt.

    The angular velocity comes from the delta quaternion's axis-angle, the
    same velocity Bullet reconstructs from interpolated motion-state
    transforms for kinematic bodies.
    """
    dt = jnp.maximum(jnp.asarray(dt, jnp.float32), 1e-9)
    lin = (target_pos - pos) / dt

    dq = math3d.quat_mul(target_quat, math3d.quat_conj(quat))
    # shortest arc: flip if w < 0
    dq = jnp.where(dq[..., 3:4] < 0.0, -dq, dq)
    # exact inverse of the first-order quat_integrate (which renormalizes):
    # omega = (2/dt) * dq_vec / dq_w  == (2/dt) * tan(theta/2) * axis.
    # For small per-step deltas this equals theta/dt * axis; it diverges only
    # as theta -> pi (a half-turn per step), which a sweep cannot represent.
    w = jnp.maximum(dq[..., 3:4], 1e-6)
    ang = (2.0 / dt) * dq[..., :3] / w
    return lin, ang


def set_kinematic_velocity(
    state: WorldState, entity, lin_vel, ang_vel=None
) -> WorldState:
    """Set a kinematic body's velocity directly (persists until changed)."""
    e = jnp.asarray(entity, jnp.int32)
    lin = jnp.asarray(lin_vel, jnp.float32)
    new_lin = state.lin_vel.at[e].set(lin)
    new_ang = state.ang_vel
    if ang_vel is not None:
        new_ang = new_ang.at[e].set(jnp.asarray(ang_vel, jnp.float32))
    return tree_replace(state, lin_vel=new_lin, ang_vel=new_ang)


def set_kinematic_target(
    state: WorldState, entity, target_pos, target_quat=None, *, dt
) -> WorldState:
    """Drive a kinematic body so the NEXT step lands it on the target
    transform (the velocity-level image of the reference's per-tick
    kinematic transform push)."""
    e = jnp.asarray(entity, jnp.int32)
    tp = jnp.asarray(target_pos, jnp.float32)
    tq = (state.quat[e] if target_quat is None
          else jnp.asarray(target_quat, jnp.float32))
    lin, ang = velocity_to_target(state.pos[e], state.quat[e], tp, tq, dt)
    return set_kinematic_velocity(state, e, lin, ang)


def warp_kinematic(
    state: WorldState, entity, pos, quat=None
) -> WorldState:
    """Teleport a kinematic body (no velocity: a warp, not a sweep —
    the analog of the reference's dirty-flag warp rebuild)."""
    e = jnp.asarray(entity, jnp.int32)
    new_pos = state.pos.at[e].set(jnp.asarray(pos, jnp.float32))
    new_quat = state.quat
    if quat is not None:
        new_quat = new_quat.at[e].set(jnp.asarray(quat, jnp.float32))
    zero3 = jnp.zeros((3,), jnp.float32)
    return tree_replace(
        state, pos=new_pos, quat=new_quat,
        lin_vel=state.lin_vel.at[e].set(zero3),
        ang_vel=state.ang_vel.at[e].set(zero3),
    )
