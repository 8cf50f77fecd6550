"""Entity-axis sharding of a single large world (SURVEY.md §2 stretch
component (c) / §5 "long-context" analog).

Worlds much larger than one chip's comfort zone shard the **contact
pipeline** over a device mesh: each device owns a contiguous row range of
bodies, builds neighbor lists and contact manifolds for its rows only, and
runs the Jacobi solver locally, exchanging partner velocities with one
``all_gather`` per iteration — the engine-domain halo exchange.  All
collectives ride the ICI (``jax.lax.all_gather`` inside ``shard_map``).

The solver's mirrored-row accumulation makes this exact: a device updates
only its own bodies, and the mirrored copy of each cross-shard pair lives on
the partner's device, so no impulse needs to be scattered across shards —
only velocities are exchanged.

This shards COMPUTE (narrowphase + solver, the dominant cost at large N);
state arrays stay replicated, so it raises single-world throughput rather
than capacity.  Fully sharded state (reduce-scattered bodies) is the
follow-on step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from banggameengine_tpu.physics import narrowphase as nf
from banggameengine_tpu.physics import solver as sv
from banggameengine_tpu.physics.step import CONTACT_BUDGET, GROUND_FRICTION

AXIS = "entity_shard"


def local_rows_contact_solve(
    r0, rows, n,
    pos_l, quat_l, vel_l, ang_l,         # [rows, ...] this shard's bodies
    pos_f, quat_f, vel_f, ang_f,         # [N, ...] full (gathered) views
    st_l, st_f,                          # dicts of static columns (local/full)
    ground_enabled, dt, iterations, max_neighbors, axis_name,
    aabb_margin=0.04,
):
    """Contact pipeline for one shard's row range against the full world.

    ``st_l``/``st_f`` carry: shape_type, size, layer, mask, friction,
    restitution, inv_mass, inv_inertia, dyn (bool), solid (bool) — local
    rows and full-world views respectively.  Runs dense AABB broadphase of
    the local rows vs everyone, local narrowphase, and the mirrored-row
    Jacobi solver with one velocity ``all_gather`` per iteration (the halo
    exchange).  Returns ``(vel_local, ang_local, vel_full, ang_full)``.
    """
    from banggameengine_tpu.physics import shapes as sh

    # --- broadphase: local rows vs ALL bodies (dense AABB) ---------------
    mn_f, mx_f = sh.shape_aabb(pos_f, quat_f, st_f["shape_type"], st_f["size"])
    mn_l, mx_l = sh.shape_aabb(pos_l, quat_l, st_l["shape_type"], st_l["size"])
    ov = sh.aabb_overlap(mn_l[:, None], mx_l[:, None],
                         mn_f[None, :], mx_f[None, :], margin=aabb_margin)
    row_ids = r0 + jnp.arange(rows)
    ov &= row_ids[:, None] != jnp.arange(n)[None, :]
    layer_ok = ((st_l["layer"][:, None] & st_f["mask"][None, :]) != 0) & (
        (st_f["layer"][None, :] & st_l["mask"][:, None]) != 0
    )
    any_dyn = st_l["dyn"][:, None] | st_f["dyn"][None, :]
    ov &= st_l["solid"][:, None] & st_f["solid"][None, :] & layer_ok & any_dyn

    selm, nvalid, counts = sv.compaction_matrix(ov, max_neighbors)
    idx_f = jnp.einsum("rmc,m->rc", selm, jnp.arange(n, dtype=jnp.float32))
    nbr = jnp.where(nvalid, idx_f.astype(jnp.int32), -1)
    safe_j = jnp.maximum(nbr, 0)

    # --- local narrowphase ----------------------------------------------
    p_pt, p_n, p_d, p_gv = nf.pair_contacts(
        pos_l[:, None], quat_l[:, None],
        st_l["shape_type"][:, None], st_l["size"][:, None],
        pos_f[safe_j], quat_f[safe_j],
        st_f["shape_type"][safe_j], st_f["size"][safe_j],
    )
    p_v = p_gv & (p_d > 0.0) & nvalid[..., None]
    partner = jnp.broadcast_to(nbr[:, :, None], p_d.shape)

    g_pt, g_n, g_d, g_gv = nf.ground_contacts(
        pos_l, quat_l, st_l["shape_type"], st_l["size"])
    g_v = (
        g_gv & (g_d > 0.0) & (st_l["dyn"] & st_l["solid"])[:, None]
        & jnp.asarray(ground_enabled)
    )

    m_pair = p_d.shape[1] * p_d.shape[2]
    all_b = jnp.concatenate(
        [partner.reshape(rows, m_pair),
         jnp.full((rows, nf.K_GROUND), -1, jnp.int32)], axis=1)
    all_pt = jnp.concatenate([p_pt.reshape(rows, m_pair, 3), g_pt], 1)
    all_n = jnp.concatenate([p_n.reshape(rows, m_pair, 3), g_n], 1)
    all_d = jnp.concatenate([p_d.reshape(rows, m_pair), g_d], 1)
    all_v = jnp.concatenate([p_v.reshape(rows, m_pair), g_v], 1)
    c_b, c_pt, c_n, c_d, c_valid, _ = sv.compact_contacts(
        all_b, all_pt, all_n, all_d, all_v, CONTACT_BUDGET
    )
    sb = jnp.maximum(c_b, 0)
    stat_side = c_b < 0
    c_mu = jnp.where(
        stat_side, st_l["friction"][:, None] * GROUND_FRICTION,
        st_l["friction"][:, None] * st_f["friction"][sb],
    )
    c_e = jnp.where(
        stat_side, 0.0,
        st_l["restitution"][:, None] * st_f["restitution"][sb],
    )

    # --- solver: local rows, velocity halo per iteration -----------------
    inv_i_full = sv.inv_inertia_world(quat_f, st_f["inv_inertia"])
    inv_i_l = sv.inv_inertia_world(quat_l, st_l["inv_inertia"])
    inv_m_l = st_l["inv_mass"]

    ra = c_pt - pos_l[:, None]
    rb = c_pt - pos_f[sb]
    t1, t2 = sv._orthonormal_tangents(c_n)
    im_b = jnp.where(stat_side, 0.0, st_f["inv_mass"][sb])
    ib = jnp.where(stat_side[..., None, None], 0.0, inv_i_full[sb])
    ia = inv_i_l[:, None]

    def k_along(direction):
        rxd_a = jnp.cross(ra, direction)
        ang_a = jnp.cross(jnp.einsum("...ij,...j->...i", ia, rxd_a), ra)
        rxd_b = jnp.cross(rb, direction)
        ang_b = jnp.cross(jnp.einsum("...ij,...j->...i", ib, rxd_b), rb)
        return jnp.maximum(
            inv_m_l[:, None] + im_b
            + jnp.sum(direction * ang_a, -1)
            + jnp.sum(direction * ang_b, -1), 1e-9)

    kn, kt1, kt2 = k_along(c_n), k_along(t1), k_along(t2)

    def rel_vel(vf, wf, vl, wl):
        va = vl[:, None] + jnp.cross(wl[:, None], ra)
        vb = jnp.where(stat_side[..., None], 0.0, vf[sb]) + jnp.cross(
            jnp.where(stat_side[..., None], 0.0, wf[sb]), rb)
        return va - vb

    vn0 = jnp.sum(rel_vel(vel_f, ang_f, vel_l, ang_l) * c_n, -1)
    bounce = c_e * jnp.maximum(-vn0 - sv.RESTITUTION_THRESHOLD, 0.0)
    baum = (sv.BAUMGARTE / dt) * jnp.maximum(c_d - sv.PENETRATION_SLOP, 0.0)
    target = jnp.maximum(bounce, baum)
    split = jnp.maximum(jnp.sum(c_valid, -1).astype(jnp.float32), 1.0)

    zeros = jnp.zeros_like(c_d)

    # heavy-ball extrapolation over the lambda iterates, mirroring
    # solver.solve_contacts_unified's momentum=0.5 default op-for-op (the
    # dense engine path this shard-parallel solve must match row-by-row)
    momentum = 0.5

    def body(_, carry):
        v_l, w_l, v_f, w_f, ln, lt1, lt2, pln, plt1, plt2 = carry
        vr = rel_vel(v_f, w_f, v_l, w_l)
        vn = jnp.sum(vr * c_n, -1)
        dln = (-(vn - target)) / kn
        ln_new = jnp.maximum(ln + dln, 0.0)
        ln_new = jnp.maximum(ln_new + momentum * (ln_new - pln), 0.0)
        dln = jnp.where(c_valid, ln_new - ln, 0.0)
        pln = ln
        ln = jnp.where(c_valid, ln_new, ln)
        vt1 = jnp.sum(vr * t1, -1)
        vt2 = jnp.sum(vr * t2, -1)
        mx_f2 = c_mu * ln
        l1n = lt1 - vt1 / kt1
        l2n = lt2 - vt2 / kt2
        l1n = l1n + momentum * (l1n - plt1)
        l2n = l2n + momentum * (l2n - plt2)
        l1n = jnp.clip(l1n, -mx_f2, mx_f2)
        l2n = jnp.clip(l2n, -mx_f2, mx_f2)
        d1 = jnp.where(c_valid, l1n - lt1, 0.0)
        d2 = jnp.where(c_valid, l2n - lt2, 0.0)
        plt1, plt2 = lt1, lt2
        lt1 = jnp.where(c_valid, l1n, lt1)
        lt2 = jnp.where(c_valid, l2n, lt2)
        imp = (dln[..., None] * c_n + d1[..., None] * t1
               + d2[..., None] * t2)
        lin = jnp.sum(imp, axis=1)
        angi = jnp.sum(jnp.cross(ra, imp), axis=1)
        v_l = v_l + lin * (inv_m_l / split)[:, None]
        w_l = w_l + jnp.einsum("nij,nj->ni", inv_i_l, angi) / split[:, None]
        # halo exchange: everyone sees the new velocities (ICI)
        v_f = jax.lax.all_gather(v_l, axis_name, tiled=True)
        w_f = jax.lax.all_gather(w_l, axis_name, tiled=True)
        return v_l, w_l, v_f, w_f, ln, lt1, lt2, pln, plt1, plt2

    carry = (vel_l, ang_l, vel_f, ang_f, zeros, zeros, zeros,
             zeros, zeros, zeros)
    carry = jax.lax.fori_loop(0, iterations, body, carry)
    return carry[0], carry[1], carry[2], carry[3]


def static_columns(static, sl=None):
    """The static-scene columns the sharded contact pipeline consumes.

    ``sl`` slices to a shard's local rows (None = full view)."""
    take = (lambda a: a) if sl is None else sl
    return dict(
        shape_type=take(static.shape_type),
        size=take(static.shape_size),
        layer=take(static.layer),
        mask=take(static.mask),
        friction=take(static.friction),
        restitution=take(static.restitution),
        inv_mass=take(static.inv_mass),
        inv_inertia=take(static.inv_inertia_body),
    )


def make_entity_sharded_contact_phase(
    static,
    mesh: Mesh,
    max_neighbors: int = 8,
    solver_iterations: int = 10,
    aabb_margin: float = 0.04,
    debug: bool = False,
):
    """Build the sharded (narrowphase + solve) phase.

    Returns ``fn(pos, quat, vel, ang, is_dynamic, solid, dt) -> (vel, ang)``
    with every array replicated in/out; internally each device processes
    rows ``[d*N/D, (d+1)*N/D)``.
    """
    del debug  # retained for API compatibility
    n_dev = mesh.devices.size

    def phase(pos, quat, vel, ang, is_dynamic, solid, dt):
        n = pos.shape[0]
        rows = n // n_dev

        def local(pos_, quat_, vel_, ang_, dyn_, solid_, dt_):
            d = jax.lax.axis_index(AXIS)
            r0 = d * rows
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, r0, rows, axis=0)

            st_f = static_columns(static)
            st_f["dyn"], st_f["solid"] = dyn_, solid_
            st_l = static_columns(static, sl)
            st_l["dyn"], st_l["solid"] = sl(dyn_), sl(solid_)

            _, _, v_full, w_full = local_rows_contact_solve(
                r0, rows, n,
                sl(pos_), sl(quat_), sl(vel_), sl(ang_),
                pos_, quat_, vel_, ang_,
                st_l, st_f,
                static.ground_enabled, dt_, solver_iterations,
                max_neighbors, AXIS, aabb_margin=aabb_margin,
            )
            return v_full, w_full   # gathered full (v, w), replicated

        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(pos, quat, vel, ang, is_dynamic, solid, dt)

    return phase
