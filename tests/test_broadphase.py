"""Grid broadphase + neighbor-list solver tests: parity vs the dense path
and large-world scale behavior (driver config #2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from banggameengine_tpu import math3d
from banggameengine_tpu.engine import make_step_fn
from banggameengine_tpu.physics.broadphase import build_neighbor_lists
from banggameengine_tpu.scene.synthetic import build_falling_boxes
from banggameengine_tpu.state import SHAPE_BOX, InputFrame


def _boxes_env(positions):
    n = len(positions)
    pos = jnp.asarray(positions, jnp.float32)
    quat = math3d.quat_identity((n,))
    st = jnp.full(n, SHAPE_BOX, jnp.int8)
    size = jnp.tile(jnp.asarray([0.5, 0.5, 0.5], jnp.float32), (n, 1))
    active = jnp.ones(n, bool)
    return pos, quat, st, size, active


class TestNeighborLists:
    def test_adjacent_bodies_found(self):
        pos, quat, st, size, active = _boxes_env(
            [[0, 0, 0], [0.9, 0, 0], [10, 0, 0]]
        )
        nl = build_neighbor_lists(pos, quat, st, size, active, cell_size=2.0)
        n0 = set(np.asarray(nl.idx[0])[np.asarray(nl.valid[0])].tolist())
        assert n0 == {1}
        n1 = set(np.asarray(nl.idx[1])[np.asarray(nl.valid[1])].tolist())
        assert n1 == {0}  # symmetric
        n2 = np.asarray(nl.valid[2]).sum()
        assert n2 == 0  # isolated
        assert int(nl.cell_overflow) == 0

    def test_cross_cell_neighbors(self):
        # bodies straddling a cell boundary must still pair up
        pos, quat, st, size, active = _boxes_env(
            [[1.95, 0, 0], [2.05, 0, 0]]
        )
        nl = build_neighbor_lists(pos, quat, st, size, active, cell_size=2.0)
        assert bool(nl.valid[0, 0]) and int(nl.idx[0, 0]) == 1

    def test_inactive_excluded(self):
        pos, quat, st, size, _ = _boxes_env([[0, 0, 0], [0.5, 0, 0]])
        active = jnp.asarray([True, False])
        nl = build_neighbor_lists(pos, quat, st, size, active, cell_size=2.0)
        assert np.asarray(nl.valid).sum() == 0

    def test_dense_cluster_overflow_reported(self):
        # 40 bodies in one cell with capacity 8 -> overflow counted
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 0.5, (40, 3))
        pos, quat, st, size, active = _boxes_env(pts)
        nl = build_neighbor_lists(
            pos, quat, st, size, active, cell_size=4.0, cell_capacity=8
        )
        assert int(nl.cell_overflow) > 0

    def test_no_false_pairs_from_hash_collisions(self):
        # tiny table forces hash collisions; cell-match filter must reject
        pos, quat, st, size, active = _boxes_env(
            [[0, 0, 0], [50, 0, 0], [100, 0, 0], [150, 0, 0]]
        )
        nl = build_neighbor_lists(
            pos, quat, st, size, active, cell_size=2.0, table_size=2
        )
        assert np.asarray(nl.valid).sum() == 0


class TestGridStepParity:
    def test_grid_matches_dense_small_world(self):
        state, static = build_falling_boxes(12, seed=3, spread=4.0)
        dense = make_step_fn(static, donate=False)
        grid = make_step_fn(static, donate=False, broadphase="grid",
                            grid_cell_size=2.5)
        inp = InputFrame.zero()
        s_d = s_g = state
        # short horizon: identical contact sets, only accumulation-order
        # float drift (longer rollouts diverge chaotically by design —
        # SURVEY.md §7 tolerance-based parity)
        for _ in range(90):
            s_d, _ = dense(s_d, inp)
            s_g, _ = grid(s_g, inp)
        np.testing.assert_allclose(
            np.asarray(s_d.pos), np.asarray(s_g.pos), atol=0.15
        )
        # long horizon: identical resting statistics
        for _ in range(300):
            s_d, _ = dense(s_d, inp)
            s_g, _ = grid(s_g, inp)
        yd = np.asarray(s_d.pos[:12, 1])
        yg = np.asarray(s_g.pos[:12, 1])
        np.testing.assert_allclose(yd, 0.5, atol=0.1)
        np.testing.assert_allclose(yg, 0.5, atol=0.3)

    def test_grid_200_boxes_settle(self):
        state, static = build_falling_boxes(200, seed=1)
        grid = make_step_fn(static, donate=False, broadphase="grid",
                            grid_cell_size=2.5, grid_table_size=8192)
        inp = InputFrame.zero()
        for _ in range(300):
            state, _ = grid(state, inp)
        pos = np.asarray(state.pos[:200])
        assert np.isfinite(pos).all()
        # nothing fell through the ground plane
        assert (pos[:, 1] > 0.2).all()
        # the ones that have landed are resting at box half-height
        landed = np.abs(np.asarray(state.lin_vel[:200, 1])) < 0.05
        assert landed.sum() > 15  # spawn heights reach y~102; most still fall
        np.testing.assert_allclose(pos[landed, 1].min(), 0.5, atol=0.1)
