"""End-to-end demo scene: the reference's own integration fixture.

Loads ``assets/scenes/demo.json`` unchanged (SURVEY.md: the demo scene IS the
reference's integration test), jits the full engine step, and verifies the
canonical scenario: CJ's capsule falls from (0, 7, -5), lands on the ground
box collider, walks under scripted input, and fires the checkpoint trigger's
Enter/Exit events — driver benchmark config #1.
"""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from banggameengine_tpu.engine import engine_step, make_step_fn
from banggameengine_tpu.physics.config import load_physics_config
from banggameengine_tpu.scene import ResourceManager, build_scene, parse_scene_json
from banggameengine_tpu.state import InputFrame

REF_ASSETS = "/root/reference/assets"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ASSETS), reason="reference assets not mounted"
)


@pytest.fixture(scope="module")
def demo():
    desc = parse_scene_json(os.path.join(REF_ASSETS, "scenes/demo.json"))
    res = ResourceManager(assets_root=REF_ASSETS)
    cfg = load_physics_config(os.path.join(REF_ASSETS, "config/physics.json"))
    return build_scene(desc, res, cfg)


def test_cj_falls_and_lands_on_ground_box(demo):
    cj = demo.find_entity("cj")
    state = demo.initial_state
    fn = make_step_fn(demo.static, donate=False)
    inp = InputFrame.zero()
    assert float(state.pos[cj, 1]) == pytest.approx(7.0)
    for _ in range(600):  # 5 s at 120 Hz
        state, _ = fn(state, inp)
    # ground box top at y=0.99 (pos -0.01, half extent 1); capsule bottom
    # offset = half_height + radius = 1.3 + 0.65 -> rest center 2.94
    assert float(state.pos[cj, 1]) == pytest.approx(2.94, abs=0.05)
    assert bool(state.char_on_ground[cj])
    # no lateral drift while falling straight down
    np.testing.assert_allclose(
        np.asarray(state.pos[cj, [0, 2]]), [0.0, -5.0], atol=1e-3
    )


def test_cj_walks_to_checkpoint_and_triggers(demo):
    cj = demo.find_entity("cj")
    cp = demo.find_entity("checkpoint")
    state = demo.initial_state
    fn = make_step_fn(demo.static, donate=False)

    # land first
    idle = InputFrame.zero()
    for _ in range(400):
        state, _ = fn(state, idle)

    # walk toward the checkpoint at (5, 1, 5) from (0, y, -5)
    target = np.array([5.0, 5.0])  # (x, z)
    start = np.asarray(state.pos[cj, [0, 2]])
    d = target - start
    yaw = float(np.arctan2(d[1], d[0]))  # fwd = (cos yaw, 0, sin yaw)
    walk = InputFrame(
        move_forward=jnp.float32(1.0),
        move_right=jnp.float32(0.0),
        jump=jnp.asarray(False),
        sprint=jnp.asarray(False),
        cam_yaw=jnp.float32(yaw),
    )

    entered = exited = False
    enter_step = None
    for i in range(800):  # up to ~6.6 s of walking
        state, ev = fn(state, walk)
        if bool(ev.trigger_enter[0, cj]):
            entered = True
            enter_step = i
        if entered and bool(ev.trigger_exit[0, cj]):
            exited = True
            break
    assert entered, "CJ never entered the checkpoint trigger"
    assert exited, "CJ never exited the checkpoint trigger"
    # trigger slot 0 is the checkpoint
    assert int(demo.static.trig_entity[0]) == cp
    # walking at 3.6 u/s over ~11.2 units: enter after ~2.5-3.5 s
    assert 200 < enter_step < 600


def test_demo_trajectory_deterministic(demo):
    """Same inputs => bitwise-identical trajectories (fixed-iteration solver,
    no atomics)."""
    fn = make_step_fn(demo.static, donate=False)
    inp = InputFrame.zero()

    def run():
        s = demo.initial_state
        for _ in range(120):
            s, _ = fn(s, inp)
        return np.asarray(s.pos), np.asarray(s.quat)

    p1, q1 = run()
    p2, q2 = run()
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(q1, q2)


def test_demo_vmap_many_worlds(demo):
    """1 world vs vmapped batch: world 0 must match the single run exactly;
    per-world inputs diverge trajectories (driver config #5 shape)."""
    W = 8
    state = demo.initial_state
    batched = jax.tree.map(lambda x: jnp.stack([x] * W), state)
    yaws = jnp.linspace(0.0, 2 * np.pi, W, endpoint=False).astype(jnp.float32)
    binp = InputFrame(
        move_forward=jnp.ones(W, jnp.float32),
        move_right=jnp.zeros(W, jnp.float32),
        jump=jnp.zeros(W, bool),
        sprint=jnp.zeros(W, bool),
        cam_yaw=yaws,
    )
    step = jax.jit(
        jax.vmap(lambda s, i: engine_step(s, i, demo.static)[0])
    )
    for _ in range(300):
        batched = step(batched, binp)

    cj = demo.find_entity("cj")
    xz = np.asarray(batched.pos[:, cj])[:, [0, 2]]
    # worlds walked in 8 different directions: positions must differ
    dists = np.linalg.norm(xz - xz[0], axis=1)
    assert (dists[1:] > 0.5).all()

    # single-world reference for world 0
    sfn = jax.jit(lambda s, i: engine_step(s, i, demo.static)[0])
    s0 = demo.initial_state
    i0 = jax.tree.map(lambda x: x[0], binp)
    for _ in range(300):
        s0 = sfn(s0, i0)
    np.testing.assert_allclose(
        np.asarray(batched.pos[0]), np.asarray(s0.pos), atol=1e-5
    )
