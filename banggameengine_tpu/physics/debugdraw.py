"""Physics debug-line generation: collision-shape wireframes.

Re-design of ``src/physics/BulletDebugDrawer.{h,cpp}`` +
``PhysicsDebugDraw.h``: produces a fixed-capacity array of colored 3D line
segments for every collision shape, with the reference's color scheme
(``PhysicsSystem.cpp:1155-1173``): static grey, dynamic cyan, kinematic/
character yellow-ish cyan, triggers magenta; plus the ground-plane grid
(``BulletDebugDrawer.cpp:149-188``) and box/capsule wireframe generators
(``:190-285``).

Output is dense ``(points f32[L,2,3], colors f32[L,4], valid bool[L])`` —
consumed by :mod:`banggameengine_tpu.render.lines`.  All shapes emit into
fixed per-entity slot budgets so the whole generator jits with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from banggameengine_tpu import math3d
from banggameengine_tpu.state import (
    BODY_DYNAMIC,
    BODY_KINEMATIC,
    BODY_STATIC,
    SHAPE_BOX,
    SHAPE_CAPSULE,
)

# colors (RGBA) — PhysicsSystem.cpp:1155-1173 scheme
COLOR_STATIC = (0.6, 0.6, 0.6, 1.0)     # grey
COLOR_DYNAMIC = (0.0, 1.0, 1.0, 1.0)    # cyan
COLOR_KINEMATIC = (0.5, 1.0, 1.0, 1.0)
COLOR_TRIGGER = (1.0, 0.0, 1.0, 1.0)    # magenta
COLOR_GRID = (0.35, 0.35, 0.35, 1.0)

_RING_SEGS = 8
# per-entity line budget: box 12 edges; capsule 2 rings x8 + 4 verticals +
# 8 cap arcs = 28 -> use 28 slots for all shapes
LINES_PER_ENTITY = 28

# box edge corner-index pairs (12 edges of the +/-1 cube)
_BOX_EDGES = np.array(
    [
        (0, 1), (1, 3), (3, 2), (2, 0),      # bottom ring (z-)
        (4, 5), (5, 7), (7, 6), (6, 4),      # top ring (z+)
        (0, 4), (1, 5), (2, 6), (3, 7),
    ],
    np.int32,
)
_CORNERS = np.array(
    [
        [-1, -1, -1], [1, -1, -1], [-1, 1, -1], [1, 1, -1],
        [-1, -1, 1], [1, -1, 1], [-1, 1, 1], [1, 1, 1],
    ],
    np.float32,
)


def _box_lines(pos, quat, half):
    """Wireframe of one oriented box -> f32[LINES_PER_ENTITY, 2, 3] (12 real,
    rest degenerate)."""
    corners = math3d.quat_rotate(quat[None, :], _CORNERS * half[None, :]) + pos
    a = corners[_BOX_EDGES[:, 0]]
    b = corners[_BOX_EDGES[:, 1]]
    seg = jnp.stack([a, b], axis=1)                      # [12,2,3]
    pad = jnp.zeros((LINES_PER_ENTITY - 12, 2, 3), jnp.float32) + pos
    return jnp.concatenate([seg, pad], axis=0), jnp.concatenate(
        [jnp.ones(12, bool), jnp.zeros(LINES_PER_ENTITY - 12, bool)]
    )


def _capsule_lines(pos, quat, radius, half_height):
    """Capsule wireframe: two rings, 4 verticals, 8 cap arc segments."""
    ang = np.linspace(0, 2 * np.pi, _RING_SEGS, endpoint=False)
    circ = np.stack([np.cos(ang), np.zeros_like(ang), np.sin(ang)], 1).astype(np.float32)
    circ_next = np.roll(circ, -1, axis=0)

    def ring(y):
        a = circ * radius + jnp.asarray([0.0, 1.0, 0.0]) * y
        b = circ_next * radius + jnp.asarray([0.0, 1.0, 0.0]) * y
        return jnp.stack([a, b], axis=1)                 # [8,2,3]

    top = ring(half_height)
    bot = ring(-half_height)
    # verticals at 4 compass points
    quarter = circ[:: _RING_SEGS // 4]                   # [4,3]
    vert_a = quarter * radius + jnp.asarray([0.0, 1.0, 0.0]) * half_height
    vert_b = quarter * radius - jnp.asarray([0.0, 1.0, 0.0]) * half_height
    verts = jnp.stack([vert_a, vert_b], axis=1)          # [4,2,3]
    # cap arcs: simple 2-segment arcs to the poles in xz planes
    pole_t = jnp.asarray([0.0, 1.0, 0.0]) * (half_height + radius)
    pole_b = -pole_t
    arc_t = jnp.stack([vert_a, jnp.broadcast_to(pole_t, (4, 3))], axis=1)
    arc_b = jnp.stack([vert_b, jnp.broadcast_to(pole_b, (4, 3))], axis=1)

    local = jnp.concatenate([top, bot, verts, arc_t, arc_b], axis=0)  # [28,2,3]
    world = math3d.quat_rotate(quat[None, None, :], local) + pos
    return world, jnp.ones(LINES_PER_ENTITY, bool)


def collision_shape_lines(state, static):
    """All entity collision-shape wireframes + trigger volumes + ground grid.

    Returns (points f32[L,2,3], colors f32[L,4], valid bool[L]) with a static
    L = N*LINES_PER_ENTITY + T*12 + grid lines.
    """
    n = state.capacity
    pos, quat = state.pos, state.quat
    stype, ssize = static.shape_type, static.shape_size
    btype = static.body_type

    def per_entity(i):
        box_seg, box_ok = _box_lines(pos[i], quat[i], ssize[i])
        cap_seg, cap_ok = _capsule_lines(pos[i], quat[i], ssize[i, 0], ssize[i, 1])
        is_box = stype[i] == SHAPE_BOX
        is_cap = stype[i] == SHAPE_CAPSULE
        seg = jnp.where(is_box, box_seg, cap_seg)
        ok = (
            jnp.where(is_box, box_ok, jnp.where(is_cap, cap_ok, False))
            & state.alive[i]
            & (is_box | is_cap)
        )
        color = jnp.where(
            btype[i] == BODY_DYNAMIC,
            jnp.asarray(COLOR_DYNAMIC),
            jnp.where(
                btype[i] == BODY_KINEMATIC,
                jnp.asarray(COLOR_KINEMATIC),
                jnp.asarray(COLOR_STATIC),
            ),
        )
        return seg, jnp.broadcast_to(color, (LINES_PER_ENTITY, 4)), ok

    segs, colors, oks = jax.vmap(per_entity)(jnp.arange(n))
    segs = segs.reshape(-1, 2, 3)
    colors = colors.reshape(-1, 4)
    oks = oks.reshape(-1)

    # trigger volumes (magenta boxes)
    t = static.num_trigger_slots

    def per_trigger(s):
        te = static.trig_entity[s]
        safe = jnp.maximum(te, 0)
        seg, ok = _box_lines(pos[safe], quat[safe], static.trig_size[s])
        ok = ok & (te >= 0) & state.trigger_active[s]
        return seg[:12], ok[:12]

    tseg, tok = jax.vmap(per_trigger)(jnp.arange(t))
    tseg = tseg.reshape(-1, 2, 3)
    tok = tok.reshape(-1)
    tcol = jnp.broadcast_to(jnp.asarray(COLOR_TRIGGER), (tseg.shape[0], 4))

    # ground grid: 11+11 lines over [-25, 25] at y=0
    ticks = np.linspace(-25.0, 25.0, 11).astype(np.float32)
    gx = np.stack(
        [np.stack([ticks, np.zeros(11), np.full(11, -25.0)], 1),
         np.stack([ticks, np.zeros(11), np.full(11, 25.0)], 1)], axis=1)
    gz = np.stack(
        [np.stack([np.full(11, -25.0), np.zeros(11), ticks], 1),
         np.stack([np.full(11, 25.0), np.zeros(11), ticks], 1)], axis=1)
    grid = jnp.asarray(np.concatenate([gx, gz]))
    gok = jnp.broadcast_to(jnp.asarray(static.ground_enabled), (22,))
    gcol = jnp.broadcast_to(jnp.asarray(COLOR_GRID), (22, 4))

    points = jnp.concatenate([segs, tseg, grid], axis=0)
    cols = jnp.concatenate([colors, tcol, gcol], axis=0)
    valid = jnp.concatenate([oks, tok, gok], axis=0)
    return points, cols, valid
