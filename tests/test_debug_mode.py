"""Checked-step (NaN guard) mode tests."""

import dataclasses

import jax.numpy as jnp
import pytest

from banggameengine_tpu.scene.synthetic import build_falling_boxes
from banggameengine_tpu.state import InputFrame
from banggameengine_tpu.utils.debug import assert_state_healthy, make_checked_step_fn


def test_checked_step_passes_on_healthy_state():
    state, static = build_falling_boxes(4)
    step = make_checked_step_fn(static)
    err, (s2, _) = step(state, InputFrame.zero())
    err.throw()  # no exception
    assert float(s2.time) > 0


def test_checked_step_catches_nan():
    state, static = build_falling_boxes(4)
    step = make_checked_step_fn(static)
    bad = dataclasses.replace(state, pos=state.pos.at[0, 0].set(jnp.nan))
    err, _ = step(bad, InputFrame.zero())
    with pytest.raises(Exception, match="non-finite"):
        err.throw()


def test_checked_step_catches_runaway_velocity():
    state, static = build_falling_boxes(4)
    step = make_checked_step_fn(static)
    bad = dataclasses.replace(
        state, lin_vel=state.lin_vel.at[0, 0].set(1e6)
    )
    err, _ = step(bad, InputFrame.zero())
    with pytest.raises(Exception, match="runaway"):
        err.throw()


def test_assert_state_healthy():
    state, _ = build_falling_boxes(2)
    assert_state_healthy(state)  # fine
    bad = dataclasses.replace(state, pos=state.pos.at[1, 2].set(jnp.inf))
    with pytest.raises(FloatingPointError):
        assert_state_healthy(bad)
