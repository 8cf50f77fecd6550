"""Physics core behavior tests: integrator, contacts, solver, raycast,
triggers, character controller.

These are the correctness fixtures the reference never had (SURVEY.md §4):
each scenario checks physically-required behavior (rest height, momentum,
bounce, friction, support) within float32 tolerances.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from banggameengine_tpu import math3d
from banggameengine_tpu.ecs.transform import compute_levels
from banggameengine_tpu.engine import engine_step, make_step_fn
from banggameengine_tpu.physics import narrowphase as nf
from banggameengine_tpu.physics import raycast as rc
from banggameengine_tpu.physics import shapes as sh
from banggameengine_tpu.state import (
    BODY_DYNAMIC,
    BODY_STATIC,
    COMP_COLLIDER,
    COMP_RIGID_BODY,
    COMP_TRANSFORM,
    SHAPE_BOX,
    SHAPE_CAPSULE,
    InputFrame,
    StaticScene,
    WorldState,
    make_world_state,
)

DT = 1.0 / 120.0


def build_world(bodies, triggers=(), characters=(), gravity=-9.81,
                ground=True, capacity=8):
    """Tiny scene-builder for tests.

    bodies: list of dicts with keys pos, shape ('box'|'capsule'), size,
    type ('static'|'dynamic'), mass, vel, euler, friction, restitution,
    layer, mask.
    """
    n = capacity
    t_slots = max(1, len(triggers))
    c_slots = max(1, len(characters))

    alive = np.zeros(n, bool)
    comp = np.zeros(n, np.uint32)
    pos = np.zeros((n, 3), np.float32)
    euler = np.zeros((n, 3), np.float32)
    vel = np.zeros((n, 3), np.float32)
    ang = np.zeros((n, 3), np.float32)
    body_type = np.zeros(n, np.int8)
    shape_type = np.zeros(n, np.int8)
    size = np.zeros((n, 3), np.float32)
    inv_mass = np.zeros(n, np.float32)
    inv_inertia = np.zeros((n, 3), np.float32)
    friction = np.full(n, 0.5, np.float32)
    restitution = np.zeros(n, np.float32)
    layer = np.zeros(n, np.uint32)
    mask = np.zeros(n, np.uint32)

    for i, b in enumerate(bodies):
        alive[i] = True
        comp[i] |= COMP_TRANSFORM
        pos[i] = b.get("pos", (0, 0, 0))
        euler[i] = b.get("euler", (0, 0, 0))
        vel[i] = b.get("vel", (0, 0, 0))
        ang[i] = b.get("ang", (0, 0, 0))
        bt = b.get("type", "dynamic")
        if bt == "none":
            continue  # bare transform entity (e.g. trigger host)
        comp[i] |= COMP_COLLIDER
        st = b.get("shape", "box")
        shape_type[i] = SHAPE_BOX if st == "box" else SHAPE_CAPSULE
        size[i] = b.get("size", (0.5, 0.5, 0.5))
        body_type[i] = BODY_DYNAMIC if bt == "dynamic" else BODY_STATIC
        friction[i] = b.get("friction", 0.5)
        restitution[i] = b.get("restitution", 0.0)
        layer[i] = b.get("layer", 1)
        mask[i] = b.get("mask", 0xFFFFFFFF)
        if bt == "dynamic":
            comp[i] |= COMP_RIGID_BODY
            m = b.get("mass", 1.0)
            inv_mass[i] = 1.0 / m
            if st == "box":
                e = 2 * np.asarray(size[i])
                ii = m / 12 * np.array([e[1]**2 + e[2]**2, e[0]**2 + e[2]**2,
                                        e[0]**2 + e[1]**2])
            else:
                r, hh = size[i][0], size[i][1]
                e = 2 * np.array([r, hh + r, r])
                ii = m / 12 * np.array([e[1]**2 + e[2]**2, e[0]**2 + e[2]**2,
                                        e[0]**2 + e[1]**2])
            inv_inertia[i] = 1.0 / np.maximum(ii, 1e-12)

    trig_entity = np.full(t_slots, -1, np.int32)
    trig_shape = np.zeros(t_slots, np.int8)
    trig_size = np.zeros((t_slots, 3), np.float32)
    trig_layer = np.zeros(t_slots, np.uint32)
    trig_mask = np.zeros(t_slots, np.uint32)
    trig_one_shot = np.zeros(t_slots, bool)
    for s, t in enumerate(triggers):
        i = t["entity"]
        trig_entity[s] = i
        trig_shape[s] = SHAPE_BOX if t.get("shape", "box") == "box" else SHAPE_CAPSULE
        trig_size[s] = t.get("size", (0.5, 0.5, 0.5))
        trig_layer[s] = t.get("layer", 4)
        trig_mask[s] = t.get("mask", 0xFFFFFFFF)
        trig_one_shot[s] = t.get("one_shot", False)
        from banggameengine_tpu.state import COMP_TRIGGER
        comp[i] |= COMP_TRIGGER

    char_entity = np.full(c_slots, -1, np.int32)
    for s, c in enumerate(characters):
        i = c["entity"]
        char_entity[s] = i
        from banggameengine_tpu.state import COMP_CHARACTER, LAYER_CHARACTER
        comp[i] |= COMP_CHARACTER | COMP_COLLIDER
        shape_type[i] = SHAPE_CAPSULE
        size[i] = (c.get("radius", 0.65), c.get("half_height", 1.3), 0)
        layer[i] = LAYER_CHARACTER
        mask[i] = 0xFFFFFFFF
        from banggameengine_tpu.state import BODY_KINEMATIC
        body_type[i] = BODY_KINEMATIC

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
        char_radius=jnp.asarray([c.get("radius", 0.65) for c in characters] or [0.65], dtype=jnp.float32),
        char_half_height=jnp.asarray([c.get("half_height", 1.3) for c in characters] or [1.3], dtype=jnp.float32),
        char_walk_speed=jnp.asarray([c.get("walk_speed", 3.6) for c in characters] or [3.6], dtype=jnp.float32),
        char_jump_impulse=jnp.asarray([c.get("jump", 8.5) for c in characters] or [8.5], dtype=jnp.float32),
        gravity=jnp.float32(gravity),
        fixed_dt=jnp.float32(DT),
        step_height=jnp.float32(0.35),
        max_slope_cos=jnp.float32(np.cos(np.deg2rad(55.0))),
        ground_enabled=jnp.asarray(ground),
    )

    state = make_world_state(n, t_slots)
    state = dataclasses.replace(
        state,
        alive=jnp.asarray(alive),
        comp_mask=jnp.asarray(comp),
        pos=jnp.asarray(pos),
        quat=math3d.quat_from_euler_xyz(jnp.asarray(euler)),
        lin_vel=jnp.asarray(vel),
        ang_vel=jnp.asarray(ang),
    )
    return state, static


@jax.jit
def _run50(state, inp, static):
    """50 scanned steps with the StaticScene TRACED — one compilation serves
    every test world of the same capacity (host dispatch + per-scene
    compiles dominate CPU test time otherwise)."""
    from banggameengine_tpu.engine import engine_step

    def body(carry, _):
        s, _ev = engine_step(carry, inp, static)
        return s, None

    out, _ = jax.lax.scan(body, state, None, length=50)
    return out


def run_steps(state, static, steps, inp=None):
    """Advance `steps` fixed steps (events discarded)."""
    inp = inp or InputFrame.zero()
    while steps >= 50:
        state = _run50(state, inp, static)
        steps -= 50
    if steps:
        fn = make_step_fn(static, donate=False)
        for _ in range(steps):
            state, _ = fn(state, inp)
    return state, None


# ---------------------------------------------------------------------------
# free fall / integration
# ---------------------------------------------------------------------------

def test_free_fall_matches_analytic():
    state, static = build_world(
        [{"pos": (0, 100, 0), "size": (0.5, 0.5, 0.5)}], ground=False
    )
    steps = 60
    state, _ = run_steps(state, static, steps)
    t = steps * DT
    # semi-implicit Euler: y = y0 - g*dt*(1+2+...+n)*dt = y0 - g dt^2 n(n+1)/2
    expected_y = 100 - 9.81 * DT * DT * steps * (steps + 1) / 2
    assert float(state.pos[0, 1]) == pytest.approx(expected_y, abs=1e-3)
    assert float(state.lin_vel[0, 1]) == pytest.approx(-9.81 * t, abs=1e-3)


# ---------------------------------------------------------------------------
# ground plane contact
# ---------------------------------------------------------------------------

def test_box_rests_on_ground_plane():
    state, static = build_world([{"pos": (0, 2.0, 0), "size": (0.5, 0.5, 0.5)}])
    state, _ = run_steps(state, static, 600)  # 5 seconds
    # box half extent 0.5 -> rest with center at y=0.5 (within slop)
    assert float(state.pos[0, 1]) == pytest.approx(0.5, abs=0.02)
    assert abs(float(state.lin_vel[0, 1])) < 0.05


def test_capsule_rests_on_ground_plane():
    state, static = build_world(
        [{"pos": (0, 3.0, 0), "shape": "capsule", "size": (0.5, 0.75, 0)}]
    )
    state, _ = run_steps(state, static, 600)
    # capsule bottom = center - (half_height + r) -> rest center y = 1.25
    assert float(state.pos[0, 1]) == pytest.approx(1.25, abs=0.02)


def test_restitution_bounces():
    state, static = build_world(
        [{"pos": (0, 3.0, 0), "size": (0.5, 0.5, 0.5), "restitution": 0.8}]
    )
    # ground restitution is 0 (combined = e*0), so bounce only vs bodies; use
    # a static box floor with restitution 1 instead
    state, static = build_world(
        [
            {"pos": (0, 3.0, 0), "size": (0.5, 0.5, 0.5), "restitution": 0.8},
            {"pos": (0, -0.5, 0), "size": (10, 0.5, 10), "type": "static",
             "restitution": 1.0},
        ],
        ground=False,
    )
    max_y = 0.0
    fn = make_step_fn(static, donate=False)
    inp = InputFrame.zero()
    bounced = False
    prev_v = 0.0
    for i in range(400):
        state, _ = fn(state, inp)
        v = float(state.lin_vel[0, 1])
        if prev_v < -1.0 and v > 1.0:
            bounced = True
        prev_v = v
    assert bounced


def test_box_on_static_box():
    state, static = build_world(
        [
            {"pos": (0, 5.0, 0), "size": (0.5, 0.5, 0.5)},
            {"pos": (0, 1.0, 0), "size": (2.0, 1.0, 2.0), "type": "static"},
        ],
        ground=False,
    )
    state, _ = run_steps(state, static, 600)
    # rests on top of static box: 1.0 + 1.0 + 0.5
    assert float(state.pos[0, 1]) == pytest.approx(2.5, abs=0.03)


def test_stack_of_boxes_stable():
    state, static = build_world(
        [
            {"pos": (0, 0.5, 0), "size": (0.5, 0.5, 0.5)},
            {"pos": (0, 1.52, 0), "size": (0.5, 0.5, 0.5)},
            {"pos": (0, 2.54, 0), "size": (0.5, 0.5, 0.5)},
        ]
    )
    state, _ = run_steps(state, static, 600)
    ys = np.asarray(state.pos[:3, 1])
    np.testing.assert_allclose(ys, [0.5, 1.5, 2.5], atol=0.08)
    # no lateral drift
    xz = np.asarray(state.pos[:3, [0, 2]])
    assert np.abs(xz).max() < 0.05


def test_rotated_tower_stable():
    """10-box tower with alternating yaw: edge-aligned stacking exercises
    the edge-edge closest-point contact; must stand for 1000 steps
    (VERDICT quality bar vs Bullet's face-clipped manifolds)."""
    bodies = []
    for i in range(10):
        bodies.append({
            "pos": (0, 0.5 + 1.01 * i, 0),
            "size": (0.5, 0.5, 0.5),
            "euler": (0, 0.35 * (i % 2), 0),   # alternate ~20 deg yaw
            "friction": 0.8,
        })
    state, static = build_world(bodies, capacity=16)
    state, _ = run_steps(state, static, 1000)
    ys = np.sort(np.asarray(state.pos[:10, 1]))
    # every box still in its own layer (tower did not collapse)
    np.testing.assert_allclose(ys, 0.5 + 1.0 * np.arange(10), atol=0.25)
    xz = np.asarray(state.pos[:10, [0, 2]])
    assert np.abs(xz).max() < 0.35, xz


def test_warm_start_cache_populated_and_matched():
    """Persistent contact cache: a resting box caches its ground-corner
    impulses with stable feature ids, and the next step warm-starts from
    them (features are bare ground-slot ids 0..7)."""
    state, static = build_world(
        [{"pos": (0, 0.495, 0), "size": (0.5, 0.5, 0.5)}]
    )
    state, _ = run_steps(state, static, 50)
    feat = np.asarray(state.contact_feat[0])
    imp = np.asarray(state.contact_imp[0])
    live = feat >= 0
    assert live.sum() == 4  # four ground corners
    assert set(feat[live]) <= set(range(8))  # ground feature ids
    # accumulated normal impulses carry the weight: under mass splitting
    # (deltas divided by the contact count) each corner lambda converges to
    # the full m*g*dt, not a quarter of it
    dt = float(static.fixed_dt)
    np.testing.assert_allclose(imp[live, 0], 9.81 * dt, rtol=0.2)
    # features persist step over step (same ids, impulses stay warm)
    state2, _ = run_steps(state, static, 1)
    feat2 = np.asarray(state2.contact_feat[0])
    assert set(feat2[feat2 >= 0]) == set(feat[live])


def test_warm_start_tall_rotated_tower_5000_steps():
    """20-box rotated tower STILL for 5000 steps: the round-4 quality bar
    vs Bullet's sequential-impulse + warm-started persistent manifolds
    (PhysicsSystem.cpp:124-128).  Round 3's residual was a coherent
    vertical compression oscillation (~0.7 u/s at box 20) from
    under-converged mass-splitting Jacobi; heavy-ball momentum over the
    lambda iterates (solver.py momentum=0.5) converges the 20-deep chain
    within the same 10 iterations — post-settle max |v| must stay under
    0.05 u/s (it measures ~1e-4)."""
    bodies = []
    for i in range(20):
        bodies.append({
            "pos": (0, 0.5 + 1.005 * i, 0),
            "size": (0.5, 0.5, 0.5),
            "euler": (0, 0.35 * (i % 2), 0),
            "friction": 0.8,
        })
    state, static = build_world(bodies, capacity=24)
    state, _ = run_steps(state, static, 5000)
    ys = np.sort(np.asarray(state.pos[:20, 1]))
    np.testing.assert_allclose(ys, 0.5 + 1.0 * np.arange(20), atol=0.3)
    xz = np.asarray(state.pos[:20, [0, 2]])
    assert np.abs(xz).max() < 0.4, xz
    # post-settle stillness (the Bullet bar): no residual sway mode —
    # a regression back to the Jacobi oscillation (0.7 u/s) must FAIL
    v = np.abs(np.asarray(state.lin_vel[:20])).max()
    assert v < 0.05, f"tower sway regression: max|v|={v}"


def test_edge_edge_cross_contact():
    """Two boxes meeting edge-on-edge (45-degree yaw offset, touching at a
    single cross-axis point): the contact point lies at the crossing, not
    at a support-corner midpoint, and the upper box comes to rest."""
    bodies = [
        {"pos": (0, 0.5, 0), "size": (0.5, 0.5, 0.5), "friction": 0.9},
        {"pos": (0, 1.75, 0), "size": (0.5, 0.5, 0.5),
         "euler": (0.0, 0.785398, 0.785398), "friction": 0.9},
    ]
    state, static = build_world(bodies, capacity=8)
    state, _ = run_steps(state, static, 800)
    # upper box settled somewhere on/beside the lower one without tunneling
    y = float(state.pos[1, 1])
    assert 0.4 < y < 2.2, y
    speed = float(jnp.linalg.norm(state.lin_vel[1]))
    assert speed < 0.5, speed


def test_friction_stops_sliding_box():
    state, static = build_world(
        [{"pos": (0, 0.5, 0), "size": (0.5, 0.5, 0.5), "vel": (5, 0, 0),
          "friction": 0.8}]
    )
    state, _ = run_steps(state, static, 600)
    speed = float(jnp.linalg.norm(state.lin_vel[0]))
    assert speed < 0.1  # friction brought it to rest
    assert float(state.pos[0, 0]) > 0.5  # but it did slide some distance


def test_frictionless_box_keeps_sliding():
    state, static = build_world(
        [{"pos": (0, 0.5, 0), "size": (0.5, 0.5, 0.5), "vel": (5, 0, 0),
          "friction": 0.0}]
    )
    state, _ = run_steps(state, static, 240)
    assert float(state.lin_vel[0, 0]) > 4.5  # ~no horizontal decel


def test_dynamic_dynamic_collision_momentum():
    # two equal boxes, head-on: momentum ~conserved, both slow/reverse
    state, static = build_world(
        [
            {"pos": (-2, 0.5, 0), "size": (0.5, 0.5, 0.5), "vel": (4, 0, 0),
             "friction": 0.0},
            {"pos": (2, 0.5, 0), "size": (0.5, 0.5, 0.5), "vel": (-4, 0, 0),
             "friction": 0.0},
        ]
    )
    state, _ = run_steps(state, static, 240)
    px = float(state.lin_vel[0, 0] + state.lin_vel[1, 0])
    assert abs(px) < 0.2  # total momentum ~0
    # inelastic (restitution 0): they should not still be approaching
    assert float(state.pos[0, 0]) < float(state.pos[1, 0])


def test_layer_mask_filtering():
    # body 1 on layer 2, body 0's mask excludes layer 2 -> fall through
    state, static = build_world(
        [
            {"pos": (0, 3, 0), "size": (0.5, 0.5, 0.5), "mask": 1},
            {"pos": (0, 1.0, 0), "size": (2, 1, 2), "type": "static",
             "layer": 2},
        ],
        ground=False,
    )
    state, _ = run_steps(state, static, 300)
    assert float(state.pos[0, 1]) < -5.0  # passed through the static box


# ---------------------------------------------------------------------------
# narrowphase unit checks
# ---------------------------------------------------------------------------

def test_sat_overlap_matrix():
    pos = jnp.asarray([[0, 0, 0], [0.9, 0, 0], [3, 0, 0]], jnp.float32)
    quat = math3d.quat_identity((3,))
    st = jnp.asarray([SHAPE_BOX] * 3, jnp.int8)
    size = jnp.asarray([[0.5, 0.5, 0.5]] * 3, jnp.float32)
    m = nf.boolean_overlap_matrix(pos, quat, st, size)
    assert bool(m[0, 1]) and bool(m[1, 0])
    assert not bool(m[0, 2])


def test_sat_rotated_edge_case():
    # 45-degree rotated box near a corner: SAT catches what corner-tests miss
    e = jnp.asarray([[0, 0, 0], [0, np.pi / 4, 0]], jnp.float32)
    pos = jnp.asarray([[0, 0, 0], [1.2, 0, 0]], jnp.float32)
    quat = math3d.quat_from_euler_xyz(e)
    st = jnp.asarray([SHAPE_BOX] * 2, jnp.int8)
    size = jnp.asarray([[0.5, 0.5, 0.5]] * 2, jnp.float32)
    m = nf.boolean_overlap_matrix(pos, quat, st, size)
    # rotated box reaches sqrt(2)*0.5 = 0.707 -> gap 1.2 - 0.5 - 0.707 < 0
    assert bool(m[0, 1])


def test_capsule_capsule_contact_depth():
    pos = jnp.asarray([[0, 0, 0], [0.8, 0, 0]], jnp.float32)
    quat = math3d.quat_identity((2,))
    st = jnp.asarray([SHAPE_CAPSULE] * 2, jnp.int8)
    size = jnp.asarray([[0.5, 0.5, 0], [0.5, 0.5, 0]], jnp.float32)
    _, normal, depth, gvalid = nf.pair_contacts_dense(pos, quat, st, size)
    cc = nf.K_PAIR - 1  # last slot is capsule-capsule
    assert bool(gvalid[0, 1, cc])
    assert float(depth[0, 1, cc]) == pytest.approx(0.2, abs=1e-5)
    np.testing.assert_allclose(np.asarray(normal[0, 1, cc]), [-1, 0, 0], atol=1e-5)


# ---------------------------------------------------------------------------
# raycast
# ---------------------------------------------------------------------------

def _ray_env():
    pos = jnp.asarray([[0, 1, 0], [5, 1, 0]], jnp.float32)
    quat = math3d.quat_identity((2,))
    st = jnp.asarray([SHAPE_BOX, SHAPE_CAPSULE], jnp.int8)
    size = jnp.asarray([[1, 1, 1], [0.5, 0.5, 0]], jnp.float32)
    layer = jnp.asarray([1, 2], jnp.uint32)
    alive = jnp.asarray([True, True])
    hasc = alive
    return pos, quat, st, size, layer, alive, hasc


def test_raycast_hits_box():
    env = _ray_env()
    hit = rc.raycast_closest(
        jnp.asarray([-5.0, 1.0, 0.0]), jnp.asarray([1.0, 0.0, 0.0]),
        jnp.float32(100.0), jnp.uint32(0xFFFFFFFF), *env,
    )
    assert int(hit.entity) == 0
    assert float(hit.distance) == pytest.approx(4.0, abs=1e-4)  # face at x=-1
    np.testing.assert_allclose(np.asarray(hit.normal), [-1, 0, 0], atol=1e-5)


def test_raycast_layer_mask():
    env = _ray_env()
    hit = rc.raycast_closest(
        jnp.asarray([-5.0, 1.0, 0.0]), jnp.asarray([1.0, 0.0, 0.0]),
        jnp.float32(100.0), jnp.uint32(2), *env,  # only layer 2
    )
    assert int(hit.entity) == 1  # skips the box, hits the capsule
    assert float(hit.distance) == pytest.approx(10.0 - 0.5, abs=1e-3)


def test_raycast_ground_plane():
    env = _ray_env()
    hit = rc.raycast_closest(
        jnp.asarray([20.0, 5.0, 0.0]), jnp.asarray([0.0, -1.0, 0.0]),
        jnp.float32(200.0), jnp.uint32(1), *env,
    )
    assert int(hit.entity) == rc.GROUND_ENTITY
    assert float(hit.distance) == pytest.approx(5.0, abs=1e-5)


def test_raycast_miss():
    env = _ray_env()
    hit = rc.raycast_closest(
        jnp.asarray([0.0, 5.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]),
        jnp.float32(100.0), jnp.uint32(0xFFFFFFFF), *env,
    )
    assert int(hit.entity) == rc.NO_HIT


# ---------------------------------------------------------------------------
# triggers
# ---------------------------------------------------------------------------

def test_trigger_enter_stay_exit():
    # dynamic box falls through a trigger volume
    state, static = build_world(
        [
            {"pos": (0, 5, 0), "size": (0.4, 0.4, 0.4)},
            {"pos": (0, 2, 0), "type": "none"},  # trigger host (no collider)
        ],
        triggers=[{"entity": 1, "size": (1.0, 1.0, 1.0)}],
        ground=False,
    )
    fn = make_step_fn(static, donate=False)
    inp = InputFrame.zero()
    saw_enter = saw_stay = saw_exit = False
    for _ in range(240):
        state, ev = fn(state, inp)
        if bool(ev.trigger_enter[0, 0]):
            saw_enter = True
        if bool(ev.trigger_stay[0, 0]):
            saw_stay = True
        if bool(ev.trigger_exit[0, 0]):
            saw_exit = True
    assert saw_enter and saw_stay and saw_exit


def test_trigger_one_shot_deactivates():
    state, static = build_world(
        [
            {"pos": (0, 5, 0), "size": (0.4, 0.4, 0.4)},
            {"pos": (0, 2, 0), "type": "none"},
        ],
        triggers=[{"entity": 1, "size": (1.0, 1.0, 1.0), "one_shot": True}],
        ground=False,
    )
    fn = make_step_fn(static, donate=False)
    inp = InputFrame.zero()
    enters = 0
    for _ in range(240):
        state, ev = fn(state, inp)
        enters += int(bool(ev.trigger_enter[0, 0]))
    assert enters == 1
    assert not bool(state.trigger_active[0])


# ---------------------------------------------------------------------------
# character controller
# ---------------------------------------------------------------------------

def _char_world():
    return build_world(
        [{"pos": (0, 2.0, 0)}],  # entity 0 = character
        characters=[{"entity": 0, "radius": 0.65, "half_height": 1.3,
                     "walk_speed": 3.6, "jump": 8.5}],
    )


def test_character_falls_and_lands():
    state, static = _char_world()
    state, _ = run_steps(state, static, 600)
    # capsule bottom = center - (hh + r) = center - 1.95 -> rest center 1.95
    assert float(state.pos[0, 1]) == pytest.approx(1.95, abs=0.05)
    assert bool(state.char_on_ground[0])


def test_character_walks_forward():
    state, static = _char_world()
    state, _ = run_steps(state, static, 300)  # settle
    inp = InputFrame(
        move_forward=jnp.float32(1.0), move_right=jnp.float32(0.0),
        jump=jnp.asarray(False), sprint=jnp.asarray(False),
        cam_yaw=jnp.float32(np.pi / 2),  # facing +Z
    )
    x0 = np.asarray(state.pos[0])
    state, _ = run_steps(state, static, 120, inp)  # 1 second
    x1 = np.asarray(state.pos[0])
    moved = x1 - x0
    assert moved[2] == pytest.approx(3.6, abs=0.2)  # walkSpeed along +Z
    assert abs(moved[0]) < 0.05


def test_character_sprint_multiplier():
    state, static = _char_world()
    state, _ = run_steps(state, static, 300)
    inp = InputFrame(
        move_forward=jnp.float32(1.0), move_right=jnp.float32(0.0),
        jump=jnp.asarray(False), sprint=jnp.asarray(True),
        cam_yaw=jnp.float32(np.pi / 2),
    )
    z0 = float(state.pos[0, 2])
    state, _ = run_steps(state, static, 120, inp)
    dz = float(state.pos[0, 2]) - z0
    assert dz == pytest.approx(3.6 * 1.8, abs=0.3)


def test_character_jump():
    state, static = _char_world()
    state, _ = run_steps(state, static, 600)  # land
    y0 = float(state.pos[0, 1])
    inp = InputFrame(
        move_forward=jnp.float32(0.0), move_right=jnp.float32(0.0),
        jump=jnp.asarray(True), sprint=jnp.asarray(False),
        cam_yaw=jnp.float32(0.0),
    )
    fn = make_step_fn(static, donate=False)
    max_y = y0
    state, _ = fn(state, inp)  # jump impulse applied
    inp_idle = InputFrame.zero()
    for _ in range(240):
        state, _ = fn(state, inp_idle)
        max_y = max(max_y, float(state.pos[0, 1]))
    # ballistic apex ~ v^2/2g = 8.5^2/19.62 = 3.68
    assert max_y - y0 == pytest.approx(8.5**2 / (2 * 9.81), abs=0.4)
    # and lands again
    assert float(state.pos[0, 1]) == pytest.approx(y0, abs=0.05)


def test_character_blocked_by_wall():
    state, static = build_world(
        [
            {"pos": (0, 2.0, 0)},
            {"pos": (0, 2.0, 3.0), "size": (3.0, 3.0, 0.5), "type": "static"},
        ],
        characters=[{"entity": 0}],
    )
    state, _ = run_steps(state, static, 300)
    inp = InputFrame(
        move_forward=jnp.float32(1.0), move_right=jnp.float32(0.0),
        jump=jnp.asarray(False), sprint=jnp.asarray(False),
        cam_yaw=jnp.float32(np.pi / 2),
    )
    state, _ = run_steps(state, static, 360, inp)  # walk into wall 3s
    # wall front face at z=2.5; capsule radius 0.65 -> stops ~1.85
    assert float(state.pos[0, 2]) < 2.5 - 0.6
    assert float(state.pos[0, 2]) > 1.2


def test_character_steps_up_small_ledge():
    state, static = build_world(
        [
            {"pos": (0, 2.0, 0)},
            # ledge 0.3 high in front (below stepHeight 0.35)
            {"pos": (0, 0.15, 2.0), "size": (3.0, 0.15, 1.0), "type": "static"},
        ],
        characters=[{"entity": 0}],
    )
    state, _ = run_steps(state, static, 300)
    inp = InputFrame(
        move_forward=jnp.float32(1.0), move_right=jnp.float32(0.0),
        jump=jnp.asarray(False), sprint=jnp.asarray(False),
        cam_yaw=jnp.float32(np.pi / 2),
    )
    state, _ = run_steps(state, static, 90, inp)  # ~2.7 units: mid-ledge
    # walked onto the ledge: center y = ledge top (0.3) + 1.95
    assert float(state.pos[0, 2]) > 1.2
    assert float(state.pos[0, 1]) == pytest.approx(2.25, abs=0.08)


# ---------------------------------------------------------------------------
# vmap many-world
# ---------------------------------------------------------------------------

def test_vmap_worlds_diverge_and_match_single():
    state, static = build_world([{"pos": (0, 2.0, 0), "size": (0.5, 0.5, 0.5)}])
    W = 4
    batched = jax.tree.map(lambda x: jnp.stack([x] * W), state)
    # vary initial height per world
    heights = jnp.asarray([2.0, 3.0, 4.0, 5.0], jnp.float32)
    batched = dataclasses.replace(
        batched, pos=batched.pos.at[:, 0, 1].set(heights)
    )
    inp = InputFrame.zero()
    binp = jax.tree.map(lambda x: jnp.stack([x] * W), inp)

    step = jax.jit(jax.vmap(lambda s, i: engine_step(s, i, static)[0]))
    single = jax.jit(lambda s, i: engine_step(s, i, static)[0])

    for _ in range(50):  # 0.42 s: nothing has landed yet
        batched = step(batched, binp)

    # world 0 must equal a single-world run from the same start
    s0, _ = build_world([{"pos": (0, 2.0, 0), "size": (0.5, 0.5, 0.5)}])
    for _ in range(50):
        s0 = single(s0, inp)
    np.testing.assert_allclose(
        np.asarray(batched.pos[0]), np.asarray(s0.pos), atol=1e-5
    )
    # worlds started higher are still higher mid-fall
    ys = np.asarray(batched.pos[:, 0, 1])
    assert np.all(np.diff(ys) > 0)
