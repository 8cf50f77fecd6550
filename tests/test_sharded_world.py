"""Fully sharded WorldState: step parity vs the single-device dense engine
on the virtual 8-device CPU mesh (SURVEY §2 stretch component (c), state
axis — the capacity-scaling follow-on to the compute-only entity sharding).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from banggameengine_tpu.engine import engine_step
from banggameengine_tpu.parallel.sharded_world import (
    make_entity_axis_mesh, make_fully_sharded_step, shard_world,
)
from banggameengine_tpu.scene.synthetic import build_falling_boxes
from banggameengine_tpu.state import InputFrame


def _mesh(n=8):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return make_entity_axis_mesh(n)


def test_sharded_world_matches_dense():
    mesh = _mesh()
    state, static = build_falling_boxes(32, seed=3)

    # reference: unsharded engine (dense broadphase), same solver settings
    ref_state = state
    inp = InputFrame.zero()
    step_ref = jax.jit(lambda s: engine_step(
        s, inp, static, broadphase="dense", max_neighbors=8,
        any_char=False, enable_capsule=False, any_trig=False)[0])

    sstate, sstatic = shard_world(state, static, mesh)
    step_sh = make_fully_sharded_step(static, mesh, max_neighbors=8)

    for i in range(25):
        ref_state = step_ref(ref_state)
        sstate, _ev = step_sh(sstate, inp, sstatic)

    # the sharded pipeline is the same math in the same order per row;
    # only float reassociation across the gathers differs
    np.testing.assert_allclose(
        np.asarray(sstate.pos), np.asarray(ref_state.pos), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(sstate.lin_vel), np.asarray(ref_state.lin_vel), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(sstate.quat), np.asarray(ref_state.quat), atol=2e-4)
    # world matrices refreshed locally match the level-ordered propagation
    np.testing.assert_allclose(
        np.asarray(sstate.world), np.asarray(ref_state.world), atol=2e-4)


def test_sharded_world_state_is_actually_sharded():
    mesh = _mesh()
    state, static = build_falling_boxes(32, seed=3)
    sstate, sstatic = shard_world(state, static, mesh)
    sh = sstate.pos.sharding
    assert sh.is_fully_replicated is False
    # each device holds N/D rows
    shard_shapes = {tuple(s.data.shape) for s in sstate.pos.addressable_shards}
    assert shard_shapes == {(32 // 8, 3)}

    step = make_fully_sharded_step(static, mesh)
    out, _ev = step(sstate, InputFrame.zero(), sstatic)
    assert out.pos.sharding.is_fully_replicated is False
    assert float(out.time) > 0.0


def test_sharded_world_kinematic_parity():
    # Regression (round-2 ADVICE): kinematic rows were silently frozen in
    # the fully sharded step; they must integrate at their set velocity and
    # push dynamic partners, matching the dense engine.
    import dataclasses

    from banggameengine_tpu.state import BODY_KINEMATIC

    mesh = _mesh()
    state, static = build_falling_boxes(32, seed=5)
    static = dataclasses.replace(
        static, body_type=static.body_type.at[3].set(BODY_KINEMATIC))
    state = dataclasses.replace(
        state,
        pos=state.pos.at[3].set(jnp.asarray([0.0, 0.5, 0.0])),
        lin_vel=state.lin_vel.at[3].set(jnp.asarray([1.0, 0.0, 0.0])),
    )

    inp = InputFrame.zero()
    ref_state = state
    step_ref = jax.jit(lambda s: engine_step(
        s, inp, static, broadphase="dense", max_neighbors=8,
        any_char=False, enable_capsule=False, any_trig=False)[0])
    sstate, sstatic = shard_world(state, static, mesh)
    step_sh = make_fully_sharded_step(static, mesh, max_neighbors=8)

    for _ in range(25):
        ref_state = step_ref(ref_state)
        sstate, _ev = step_sh(sstate, inp, sstatic)

    # the kinematic row must actually have moved at its velocity
    p3 = np.asarray(sstate.pos)[3]
    assert abs(p3[0] - 25 * float(static.fixed_dt) * 1.0) < 1e-5
    np.testing.assert_allclose(
        np.asarray(sstate.pos), np.asarray(ref_state.pos), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(sstate.lin_vel), np.asarray(ref_state.lin_vel), atol=2e-3)


def test_sharded_world_demo_topology_with_character_and_trigger():
    """Round-3 completion: the demo-shaped world (ground box + capsule
    character + checkpoint trigger) steps FULLY SHARDED with parity against
    the dense engine, including character landing and trigger events."""
    import dataclasses

    from banggameengine_tpu.scene.synthetic import build_demo_like

    mesh = _mesh()
    state, static = build_demo_like()
    inp = InputFrame.zero()

    ref = state
    step_ref = jax.jit(lambda s: engine_step(s, inp, static))
    sstate, sstatic = shard_world(state, static, mesh)
    step_sh = make_fully_sharded_step(static, mesh)

    enter_seen = False
    for i in range(120):  # 1 s at 120 Hz: character falls and lands
        ref, ev_ref = step_ref(ref)
        sstate, ev_sh = step_sh(sstate, inp, sstatic)
        if bool(np.asarray(ev_sh.trigger_enter).any()):
            enter_seen = True
    ci = 0  # character entity (build_demo_like layout)
    np.testing.assert_allclose(
        np.asarray(sstate.pos), np.asarray(ref.pos), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(sstate.char_vel_y), np.asarray(ref.char_vel_y), atol=2e-3)
    assert bool(sstate.char_on_ground[ci]) == bool(ref.char_on_ground[ci])
    # trigger overlap state matches the dense engine's
    np.testing.assert_array_equal(
        np.asarray(sstate.trigger_overlap), np.asarray(ref.trigger_overlap))
    # world matrices include the character visual offset
    np.testing.assert_allclose(
        np.asarray(sstate.world), np.asarray(ref.world), atol=2e-3)


def test_sharded_world_trigger_enter_exit_events():
    """A box dropped through a trigger volume produces Enter then Exit on
    the sharded path, and a oneShot trigger deactivates globally."""
    import dataclasses

    mesh = _mesh()
    state, static = build_falling_boxes(8, seed=1, with_trigger=True)
    ti = int(np.asarray(static.trig_entity)[0])
    # raise the trigger volume so the falling box passes THROUGH it (a
    # trigger at rest height would keep overlapping the settled box)
    state = dataclasses.replace(
        state,
        pos=(state.pos.at[0].set(jnp.asarray([5.0, 9.0, 5.0]))
             .at[ti].set(jnp.asarray([5.0, 5.0, 5.0]))),
        quat=state.quat.at[0].set(jnp.asarray([0.0, 0.0, 0.0, 1.0])),
    )
    sstate, sstatic = shard_world(state, static, mesh)
    step = make_fully_sharded_step(static, mesh)
    inp = InputFrame.zero()
    seen_enter = seen_exit = False
    for _ in range(200):
        sstate, ev = step(sstate, inp, sstatic)
        ent = np.asarray(ev.trigger_enter)
        exi = np.asarray(ev.trigger_exit)
        if ent[0, 0]:
            seen_enter = True
        if seen_enter and exi[0, 0]:
            seen_exit = True
    assert seen_enter and seen_exit
