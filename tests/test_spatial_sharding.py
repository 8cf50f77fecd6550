"""Entity-axis sharded contact phase: parity vs the single-device pipeline
on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from banggameengine_tpu.parallel.spatial import make_entity_sharded_contact_phase
from banggameengine_tpu.scene.synthetic import build_falling_boxes
from banggameengine_tpu.state import BODY_DYNAMIC, COMP_CHARACTER, COMP_COLLIDER


def _mesh(n=8):
    devs = jax.devices()[:n]
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.asarray(devs), ("entity_shard",))


def _phase_inputs(state, static):
    alive = state.alive
    has_collider = (state.comp_mask & (COMP_COLLIDER | COMP_CHARACTER)) != 0
    is_char = (state.comp_mask & COMP_CHARACTER) != 0
    solid = alive & has_collider & ~is_char
    is_dyn = (static.body_type == BODY_DYNAMIC) & alive
    return is_dyn, solid


def _unsharded_reference(state, static, dt, iterations=10, max_neighbors=8):
    from banggameengine_tpu.physics import narrowphase as nf
    from banggameengine_tpu.physics import solver as sv
    from banggameengine_tpu.physics.broadphase import build_neighbor_lists_dense
    from banggameengine_tpu.physics.step import CONTACT_BUDGET, GROUND_FRICTION

    is_dyn, solid = _phase_inputs(state, static)
    n = state.capacity
    layer_ok = ((static.layer[:, None] & static.mask[None, :]) != 0) & (
        (static.layer[None, :] & static.mask[:, None]) != 0
    )
    pair_mask = solid[:, None] & solid[None, :] & layer_ok & (
        is_dyn[:, None] | is_dyn[None, :]
    )
    nl = build_neighbor_lists_dense(
        state.pos, state.quat, static.shape_type, static.shape_size,
        pair_mask, max_neighbors=max_neighbors,
    )
    safe_j = jnp.maximum(nl.idx, 0)
    p_pt, p_n, p_d, p_gv = nf.pair_contacts(
        state.pos[:, None], state.quat[:, None],
        static.shape_type[:, None], static.shape_size[:, None],
        state.pos[safe_j], state.quat[safe_j],
        static.shape_type[safe_j], static.shape_size[safe_j],
    )
    p_v = p_gv & (p_d > 0.0) & nl.valid[..., None]
    partner = jnp.broadcast_to(nl.idx[:, :, None], p_d.shape)
    g_pt, g_n, g_d, g_gv = nf.ground_contacts(
        state.pos, state.quat, static.shape_type, static.shape_size
    )
    g_v = g_gv & (g_d > 0.0) & (is_dyn & solid)[:, None]
    m_pair = p_d.shape[1] * p_d.shape[2]
    all_b = jnp.concatenate(
        [partner.reshape(n, m_pair), jnp.full((n, nf.K_GROUND), -1, jnp.int32)], 1)
    all_pt = jnp.concatenate([p_pt.reshape(n, m_pair, 3), g_pt], 1)
    all_n = jnp.concatenate([p_n.reshape(n, m_pair, 3), g_n], 1)
    all_d = jnp.concatenate([p_d.reshape(n, m_pair), g_d], 1)
    all_v = jnp.concatenate([p_v.reshape(n, m_pair), g_v], 1)
    c_b, c_pt, c_n, c_d, c_valid, _ = sv.compact_contacts(
        all_b, all_pt, all_n, all_d, all_v, CONTACT_BUDGET)
    sb = jnp.maximum(c_b, 0)
    stat_side = c_b < 0
    c_mu = jnp.where(stat_side, static.friction[:, None] * GROUND_FRICTION,
                     static.friction[:, None] * static.friction[sb])
    c_e = jnp.where(stat_side, 0.0,
                    static.restitution[:, None] * static.restitution[sb])
    inv_i = sv.inv_inertia_world(state.quat, static.inv_inertia_body)
    # momentum=0.5 mirrors the engine's production solver settings
    # (physics.step solver_momentum default), which the sharded phase
    # hardcodes to stay row-for-row identical
    return sv.solve_contacts_unified(
        state.lin_vel, state.ang_vel, state.pos, static.inv_mass, inv_i,
        c_b, c_pt, c_n, c_d, c_valid, c_mu, c_e, jnp.float32(dt),
        iterations=iterations, momentum=0.5,
    )


def test_sharded_contact_phase_matches_unsharded():
    mesh = _mesh()
    state, static = build_falling_boxes(24, seed=5, spread=4.0)
    n = state.capacity  # 24, divisible by the 8-device mesh
    # place bodies near the ground so contacts exist
    import dataclasses

    state = dataclasses.replace(
        state,
        pos=state.pos.at[:, 1].set(
            jnp.where(state.alive, 0.45 + 0.1 * (jnp.arange(n) % 3),
                      state.pos[:, 1])
        ),
        lin_vel=state.lin_vel.at[:, 1].set(jnp.where(state.alive, -1.0, 0.0)),
    )
    dt = 1 / 120
    is_dyn, solid = _phase_inputs(state, static)

    phase = make_entity_sharded_contact_phase(static, mesh)
    v_sh, w_sh = jax.jit(phase)(
        state.pos, state.quat, state.lin_vel, state.ang_vel,
        is_dyn, solid, jnp.float32(dt),
    )
    v_ref, w_ref = _unsharded_reference(state, static, dt)

    np.testing.assert_allclose(np.asarray(v_sh), np.asarray(v_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(w_sh), np.asarray(w_ref),
                               atol=1e-4, rtol=1e-4)
    # and it actually resolved contacts (downward velocity stopped)
    assert float(jnp.max(jnp.abs(v_sh))) > 0  # impulses applied
