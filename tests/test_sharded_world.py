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
        sstate = step_sh(sstate, sstatic)

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
    out = step(sstate, sstatic)
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
        sstate = step_sh(sstate, sstatic)

    # the kinematic row must actually have moved at its velocity
    p3 = np.asarray(sstate.pos)[3]
    assert abs(p3[0] - 25 * float(static.fixed_dt) * 1.0) < 1e-5
    np.testing.assert_allclose(
        np.asarray(sstate.pos), np.asarray(ref_state.pos), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(sstate.lin_vel), np.asarray(ref_state.lin_vel), atol=2e-3)


def test_sharded_world_rejects_characters():
    mesh = _mesh()
    state, static = build_falling_boxes(8, with_character=True)
    with pytest.raises(ValueError):
        make_fully_sharded_step(static, mesh)
