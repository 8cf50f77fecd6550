"""Layer-masked raycasts against the world's collision shapes.

Vectorized replacement for ``PhysicsSystem::Raycast``/``RaycastAll``
(``PhysicsSystem.cpp:1076-1146``) and the ``Physics::`` global facade
(``PhysicsAPI.cpp:8-51``): one ray is tested against **all** entity shapes
(boxes via slab test, capsules via quadratic cylinder + cap spheres) plus the
implicit ground plane, in a single fused pass; the closest hit is a masked
argmin.  ``jax.vmap`` over the ray axis gives RaycastAll-style batches for
free.

Hit filter matches Bullet's group test as used by the reference: an object is
hit when ``(object_layer & ray_mask) != 0``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from banggameengine_tpu import math3d
from banggameengine_tpu.state import SHAPE_BOX, SHAPE_CAPSULE

Array = jax.Array

GROUND_ENTITY = -2  # sentinel for the implicit ground plane
NO_HIT = -1


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RaycastHit:
    """Mirrors PhysicsRaycastHit (PhysicsAPI.h:12-18)."""

    entity: Array    # int32: entity id, GROUND_ENTITY, or NO_HIT
    point: Array     # f32[3]
    normal: Array    # f32[3]
    distance: Array  # f32

    @property
    def hit(self) -> Array:
        return self.entity != NO_HIT


def _ray_box(origin_l, dir_l, half):
    """Slab test in box-local frame.  Returns (t_enter, hit, normal_local)."""
    inv_d = 1.0 / jnp.where(jnp.abs(dir_l) > 1e-9, dir_l, jnp.where(dir_l >= 0, 1e-9, -1e-9))
    t1 = (-half - origin_l) * inv_d
    t2 = (half - origin_l) * inv_d
    tmin_ax = jnp.minimum(t1, t2)
    tmax_ax = jnp.maximum(t1, t2)
    t_enter = jnp.max(tmin_ax, axis=-1)
    t_exit = jnp.min(tmax_ax, axis=-1)
    hit = (t_exit >= jnp.maximum(t_enter, 0.0)) & (t_enter >= 0.0)
    axis = jnp.argmax(tmin_ax, axis=-1)
    sign = -jnp.sign(jnp.take_along_axis(dir_l, axis[..., None], axis=-1))[..., 0]
    sign = jnp.where(sign == 0, 1.0, sign)
    n_local = jax.nn.one_hot(axis, 3, dtype=origin_l.dtype) * sign[..., None]
    return t_enter, hit, n_local


def _ray_sphere(origin, direction, center, radius):
    """Returns (t, hit) for the nearest non-negative intersection."""
    oc = origin - center
    b = jnp.sum(oc * direction, -1)
    c = jnp.sum(oc * oc, -1) - radius * radius
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 >= 0.0, t0, t1)
    hit = (disc >= 0.0) & (t >= 0.0)
    return t, hit


def _ray_capsule(origin, direction, pos, quat, radius, half_height):
    """Ray vs Y-axis capsule in the capsule's local frame."""
    qc = math3d.quat_conj(quat)
    o = math3d.quat_rotate(qc, origin - pos)
    d = math3d.quat_rotate(qc, direction)

    # infinite cylinder x^2+z^2=r^2
    a = d[..., 0] ** 2 + d[..., 2] ** 2
    b = o[..., 0] * d[..., 0] + o[..., 2] * d[..., 2]
    c = o[..., 0] ** 2 + o[..., 2] ** 2 - radius * radius
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    safe_a = jnp.maximum(a, 1e-12)
    t_cyl = (-b - sq) / safe_a
    y_at = o[..., 1] + d[..., 1] * t_cyl
    cyl_hit = (disc >= 0.0) & (a > 1e-12) & (t_cyl >= 0.0) & (jnp.abs(y_at) <= half_height)

    # cap spheres at (0, ±h, 0)
    up = jnp.zeros_like(o).at[..., 1].set(half_height)
    t_top, hit_top = _ray_sphere(o, d, up, radius)
    t_bot, hit_bot = _ray_sphere(o, d, -up, radius)

    big = jnp.float32(jnp.inf)
    t = jnp.minimum(
        jnp.where(cyl_hit, t_cyl, big),
        jnp.minimum(jnp.where(hit_top, t_top, big), jnp.where(hit_bot, t_bot, big)),
    )
    hit = jnp.isfinite(t)
    # local hit normal
    p = o + d * t[..., None]
    clamped_y = jnp.clip(p[..., 1], -half_height, half_height)
    axis_pt = jnp.zeros_like(p).at[..., 1].set(clamped_y)
    n_local = p - axis_pt
    n_local = n_local / jnp.maximum(jnp.linalg.norm(n_local, axis=-1, keepdims=True), 1e-9)
    n_world = math3d.quat_rotate(quat, n_local)
    return t, hit, n_world


def raycast_all(
    origin: Array, direction: Array, max_dist: Array, ray_mask: Array,
    pos, quat, shape_type, size, layer, alive, has_collision,
    ground_enabled=True,
):
    """Test one ray against every shape.  Returns per-entity (t [N], hit [N])
    plus ground (t_g, hit_g).  ``direction`` must be normalized."""
    # boxes
    qc = math3d.quat_conj(quat)
    o_l = math3d.quat_rotate(qc, origin[None, :] - pos)
    d_l = math3d.quat_rotate(qc, jnp.broadcast_to(direction, pos.shape))
    t_box, hit_box, n_box_l = _ray_box(o_l, d_l, size)
    n_box = math3d.quat_rotate(quat, n_box_l)

    # capsules
    t_cap, hit_cap, n_cap = _ray_capsule(
        origin[None, :], direction[None, :], pos, quat, size[..., 0], size[..., 1]
    )

    is_box = shape_type == SHAPE_BOX
    is_cap = shape_type == SHAPE_CAPSULE
    t = jnp.where(is_box, t_box, jnp.where(is_cap, t_cap, jnp.inf))
    hit = jnp.where(is_box, hit_box, jnp.where(is_cap, hit_cap, False))
    normal = jnp.where(is_box[:, None], n_box, n_cap)

    hit = (
        hit
        & alive
        & has_collision
        & (t <= max_dist)
        & ((layer & ray_mask) != 0)
    )

    # implicit ground plane y=0 (hit only from above, like Bullet's plane)
    denom = direction[1]
    t_g = jnp.where(jnp.abs(denom) > 1e-9, -origin[1] / jnp.where(jnp.abs(denom) > 1e-9, denom, 1.0), jnp.inf)
    hit_g = (
        jnp.asarray(ground_enabled)
        & (t_g >= 0.0)
        & (t_g <= max_dist)
        & ((jnp.uint32(1) & ray_mask) != 0)  # ground is on the world layer
    )
    return t, hit, normal, t_g, hit_g


def raycast_closest(
    origin, direction, max_dist, ray_mask,
    pos, quat, shape_type, size, layer, alive, has_collision,
    ground_enabled=True,
) -> RaycastHit:
    """Closest-hit raycast (Physics::Raycast, PhysicsSystem.cpp:1076-1114)."""
    t, hit, normal, t_g, hit_g = raycast_all(
        origin, direction, max_dist, ray_mask,
        pos, quat, shape_type, size, layer, alive, has_collision, ground_enabled,
    )
    t_masked = jnp.where(hit, t, jnp.inf)
    best = jnp.argmin(t_masked)
    t_best = t_masked[best]

    use_ground = jnp.where(hit_g, t_g, jnp.inf) < t_best
    any_hit = jnp.isfinite(t_best) | hit_g

    dist = jnp.where(use_ground, t_g, t_best)
    ent = jnp.where(
        any_hit,
        jnp.where(use_ground, GROUND_ENTITY, best.astype(jnp.int32)),
        NO_HIT,
    ).astype(jnp.int32)
    n = jnp.where(use_ground, jnp.asarray([0.0, 1.0, 0.0]), normal[best])
    point = origin + direction * jnp.where(jnp.isfinite(dist), dist, 0.0)
    return RaycastHit(
        entity=ent,
        point=point,
        normal=n,
        distance=jnp.where(jnp.isfinite(dist), dist, jnp.float32(0.0)),
    )
