"""Procedural benchmark scenes (no asset files needed).

Generators for the driver's benchmark configs (BASELINE.json):
- falling-boxes stress worlds (configs #2/#5),
- a demo-shaped world (ground box + capsule character + trigger) used when
  the reference asset mount is unavailable.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from banggameengine_tpu import math3d
from banggameengine_tpu.ecs.transform import compute_levels
from banggameengine_tpu.physics.config import PhysicsConfig
from banggameengine_tpu.state import (
    BODY_DYNAMIC,
    BODY_KINEMATIC,
    BODY_STATIC,
    COMP_CHARACTER,
    COMP_COLLIDER,
    COMP_RIGID_BODY,
    COMP_TRANSFORM,
    COMP_TRIGGER,
    LAYER_CHARACTER,
    SHAPE_BOX,
    SHAPE_CAPSULE,
    StaticScene,
    WorldState,
    make_world_state,
)


def _box_inertia_inv(mass, half):
    e = 2.0 * np.asarray(half, np.float64)
    i = mass / 12.0 * np.array(
        [e[1] ** 2 + e[2] ** 2, e[0] ** 2 + e[2] ** 2, e[0] ** 2 + e[1] ** 2]
    )
    return (1.0 / np.maximum(i, 1e-12)).astype(np.float32)


def build_falling_boxes(
    num_bodies: int,
    seed: int = 0,
    spread: float | None = None,
    config: PhysicsConfig | None = None,
    with_character: bool = False,
    with_trigger: bool = False,
) -> tuple[WorldState, StaticScene]:
    """A world of ``num_bodies`` dynamic unit boxes raining onto the ground
    plane (driver config #2 shape).  Deterministic for a given seed."""
    cfg = (config or PhysicsConfig()).sanitized()
    rng = np.random.default_rng(seed)
    extra = (1 if with_character else 0) + (1 if with_trigger else 0)
    n = max(8, int(np.ceil((num_bodies + extra) / 8.0)) * 8)

    alive = np.zeros(n, bool)
    comp = np.zeros(n, np.uint32)
    pos = np.zeros((n, 3), np.float32)
    euler = np.zeros((n, 3), np.float32)
    body_type = np.zeros(n, np.int8)
    shape_type = np.zeros(n, np.int8)
    size = np.zeros((n, 3), np.float32)
    inv_mass = np.zeros(n, np.float32)
    inv_inertia = np.zeros((n, 3), np.float32)
    friction = np.full(n, 0.5, np.float32)
    restitution = np.zeros(n, np.float32)
    layer = np.zeros(n, np.uint32)
    mask = np.zeros(n, np.uint32)

    if spread is None:
        # spacing so resting boxes roughly tile the ground one layer deep
        spread = max(4.0, 1.2 * np.sqrt(num_bodies))

    half = np.array([0.5, 0.5, 0.5], np.float32)
    for i in range(num_bodies):
        alive[i] = True
        comp[i] = COMP_TRANSFORM | COMP_COLLIDER | COMP_RIGID_BODY
        pos[i] = (
            rng.uniform(-spread, spread),
            rng.uniform(2.0, 2.0 + 0.5 * num_bodies),
            rng.uniform(-spread, spread),
        )
        euler[i] = rng.uniform(-np.pi, np.pi, 3)
        body_type[i] = BODY_DYNAMIC
        shape_type[i] = SHAPE_BOX
        size[i] = half
        inv_mass[i] = 1.0
        inv_inertia[i] = _box_inertia_inv(1.0, half)
        layer[i] = 1
        mask[i] = 0xFFFFFFFF

    cursor = num_bodies
    characters = []
    if with_character:
        ci = cursor
        cursor += 1
        alive[ci] = True
        comp[ci] = COMP_TRANSFORM | COMP_COLLIDER | COMP_CHARACTER
        pos[ci] = (0.0, 7.0, -5.0)
        shape_type[ci] = SHAPE_CAPSULE
        size[ci] = (cfg.capsule_radius, cfg.capsule_height * 0.5, 0.0)
        body_type[ci] = BODY_KINEMATIC
        layer[ci] = LAYER_CHARACTER
        mask[ci] = 0xFFFFFFFF
        characters.append(ci)

    triggers = []
    if with_trigger:
        ti = cursor
        cursor += 1
        alive[ti] = True
        comp[ti] = COMP_TRANSFORM | COMP_TRIGGER
        pos[ti] = (5.0, 1.0, 5.0)
        triggers.append(ti)

    t_slots = max(1, len(triggers))
    trig_entity = np.full(t_slots, -1, np.int32)
    trig_shape = np.full(t_slots, SHAPE_BOX, np.int8)
    trig_size = np.tile(np.asarray([1.5, 1.5, 1.5], np.float32), (t_slots, 1))
    trig_layer = np.full(t_slots, 4, np.uint32)
    trig_mask = np.full(t_slots, 0xFFFFFFFF, np.uint32)
    trig_one_shot = np.zeros(t_slots, bool)
    for s, ei in enumerate(triggers):
        trig_entity[s] = ei

    c_slots = max(1, len(characters))
    char_entity = np.full(c_slots, -1, np.int32)
    for s, ei in enumerate(characters):
        char_entity[s] = ei

    parent = np.full(n, -1, np.int32)
    static = StaticScene(
        parent=jnp.asarray(parent),
        level_nodes=jnp.asarray(compute_levels(parent, alive)),
        body_type=jnp.asarray(body_type),
        shape_type=jnp.asarray(shape_type),
        shape_size=jnp.asarray(size),
        inv_mass=jnp.asarray(inv_mass),
        inv_inertia_body=jnp.asarray(inv_inertia),
        friction=jnp.asarray(friction),
        restitution=jnp.asarray(restitution),
        layer=jnp.asarray(layer),
        mask=jnp.asarray(mask),
        trig_entity=jnp.asarray(trig_entity),
        trig_shape=jnp.asarray(trig_shape),
        trig_size=jnp.asarray(trig_size),
        trig_layer=jnp.asarray(trig_layer),
        trig_mask=jnp.asarray(trig_mask),
        trig_one_shot=jnp.asarray(trig_one_shot),
        char_entity=jnp.asarray(char_entity),
        char_radius=jnp.full(c_slots, cfg.capsule_radius, jnp.float32),
        char_half_height=jnp.full(c_slots, cfg.capsule_height * 0.5, jnp.float32),
        char_walk_speed=jnp.full(c_slots, cfg.walk_speed, jnp.float32),
        char_jump_impulse=jnp.full(c_slots, cfg.jump_impulse, jnp.float32),
        gravity=jnp.float32(cfg.gravity),
        fixed_dt=jnp.float32(cfg.fixed_step),
        step_height=jnp.float32(cfg.step_height),
        max_slope_cos=jnp.float32(np.cos(np.deg2rad(cfg.max_slope_deg))),
        ground_enabled=jnp.asarray(True),
    )

    state = make_world_state(n, t_slots)
    state = dataclasses.replace(
        state,
        alive=jnp.asarray(alive),
        comp_mask=jnp.asarray(comp),
        pos=jnp.asarray(pos),
        quat=math3d.quat_from_euler_xyz(jnp.asarray(euler)),
    )
    return state, static


def build_demo_like(config: PhysicsConfig | None = None):
    """Asset-free stand-in for the demo scene: ground box, capsule character,
    checkpoint trigger (same poses as assets/scenes/demo.json)."""
    state, static = build_falling_boxes(
        0, config=config, with_character=True, with_trigger=True
    )
    # add the static ground box (demo.json 'ground': half (50,1,50) at y=-0.01)
    gi = 2  # first free slot after character(0)? compute: num_bodies=0 so
    # character idx 0, trigger idx 1, ground at 2
    state = dataclasses.replace(
        state,
        alive=state.alive.at[gi].set(True),
        comp_mask=state.comp_mask.at[gi].set(
            COMP_TRANSFORM | COMP_COLLIDER | COMP_RIGID_BODY
        ),
        pos=state.pos.at[gi].set(jnp.asarray([0.0, -0.01, 0.0])),
    )
    static = dataclasses.replace(
        static,
        body_type=static.body_type.at[gi].set(BODY_STATIC),
        shape_type=static.shape_type.at[gi].set(SHAPE_BOX),
        shape_size=static.shape_size.at[gi].set(jnp.asarray([50.0, 1.0, 50.0])),
        friction=static.friction.at[gi].set(1.0),
        layer=static.layer.at[gi].set(1),
        mask=static.mask.at[gi].set(0xFFFFFFFF),
    )
    return state, static
