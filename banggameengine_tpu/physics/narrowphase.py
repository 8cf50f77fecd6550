"""Narrowphase contact generation for the reference's shape set.

Shapes: oriented boxes, Y-axis capsules, plus the implicit static ground
plane y=0 (``PhysicsSystem.cpp:149-166``).  This replaces Bullet's
dispatcher/manifold machinery (``PhysicsSystem.cpp:124-128``) with dense,
branchless, mask-driven kernels:

- **box-box**: 15-axis SAT MTV (Ericson RTCD 4.4.1) + corner manifold both
  ways (8+8 candidates laterally contained in the other box) + a SAT-center
  fallback contact for edge-edge configurations;
- **box-capsule**: the capsule's core segment sampled at 3 points, each a
  sphere-vs-box contact;
- **capsule-capsule**: closest-points sphere-sphere contact;
- **ground**: box corners / capsule end-spheres against y=0.

Contact normal convention: ``normal`` points from body *b* toward body *a*
(the direction pushing *a* out of *b*).  ``depth > 0`` means penetrating.

The core entry point :func:`pair_contacts` is batched over arbitrary leading
dims, so the same kernels serve both the dense all-pairs ``[N, N]`` path
(small worlds; per-body impulse accumulation becomes a pure axis reduction)
and the grid-broadphase neighbor-list ``[N, K]`` path (10k-body stress,
driver config #2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from banggameengine_tpu import math3d
from banggameengine_tpu.physics import shapes as sh
from banggameengine_tpu.state import SHAPE_BOX, SHAPE_CAPSULE

Array = jax.Array

# contact slots per pair: 17 box-box (8+8 corners + 1 SAT center)
#                         + 3 capsule samples + 1 cap-cap
K_BB = 17
K_PAIR = K_BB + 3 + 1
# ground contact slots per body: 8 corners (box) / 2 end spheres (capsule)
K_GROUND = 8

_CAP_TS = jnp.asarray([0.0, 0.5, 1.0], jnp.float32)  # capsule sample params
_LATERAL_MARGIN = 0.02  # corner containment slack for manifold selection


def _point_in_obb(pts, pos_b, rot_b, half_b, margin):
    """Boolean: points inside the oriented box expanded by margin.
    pts [..., 3]; box params broadcastable against pts' batch dims."""
    local = jnp.einsum("...ij,...i->...j", rot_b, pts - pos_b)  # R^T (p - c)
    return jnp.all(jnp.abs(local) <= half_b + margin, axis=-1)


def box_box_sat_mtv(pos_a, rot_a, half_a, pos_b, rot_b, half_b):
    """Batched box-box SAT with minimum-translation vector.

    Inputs broadcast to a common batch shape ``B``; returns
    (n f32[B,3] unit axis from b toward a, depth f32[B], overlap bool[B],
    best i32[B] winning axis index: 0-2 A faces, 3-5 B faces, 6-14 cross
    axes A_i x B_j with i=(best-6)//3, j=(best-6)%3).
    """
    b_shape = jnp.broadcast_shapes(pos_a.shape[:-1], pos_b.shape[:-1])
    pos_a = jnp.broadcast_to(pos_a, b_shape + (3,))
    pos_b = jnp.broadcast_to(pos_b, b_shape + (3,))
    rot_a = jnp.broadcast_to(rot_a, b_shape + (3, 3))
    rot_b = jnp.broadcast_to(rot_b, b_shape + (3, 3))
    half_a = jnp.broadcast_to(half_a, b_shape + (3,))
    half_b = jnp.broadcast_to(half_b, b_shape + (3,))
    r = jnp.einsum("...ki,...kj->...ij", rot_a, rot_b)   # R = A^T B
    abs_r = jnp.abs(r)
    t_world = pos_b - pos_a
    t_a = jnp.einsum("...ki,...k->...i", rot_a, t_world)
    t_b = jnp.einsum("...ki,...k->...i", rot_b, t_world)
    ha, hb = half_a, half_b

    overlaps, axes, valids = [], [], []
    ones = jnp.ones(t_a.shape[:-1], bool)

    for i in range(3):  # A's face axes
        dist = jnp.abs(t_a[..., i])
        ov = ha[..., i] + jnp.einsum("...j,...j->...", hb, abs_r[..., i, :]) - dist
        overlaps.append(ov)
        axes.append(rot_a[..., :, i])
        valids.append(ones)
    for j in range(3):  # B's face axes
        dist = jnp.abs(t_b[..., j])
        ov = jnp.einsum("...i,...i->...", ha, abs_r[..., :, j]) + hb[..., j] - dist
        overlaps.append(ov)
        axes.append(rot_b[..., :, j])
        valids.append(ones)
    for i in range(3):  # cross axes A_i x B_j
        i1, i2 = (i + 1) % 3, (i + 2) % 3
        for j in range(3):
            j1, j2 = (j + 1) % 3, (j + 2) % 3
            ln = jnp.sqrt(jnp.maximum(1.0 - r[..., i, j] ** 2, 0.0))
            ok = ln > 1e-4
            inv_ln = 1.0 / jnp.maximum(ln, 1e-4)
            ra_ij = ha[..., i1] * abs_r[..., i2, j] + ha[..., i2] * abs_r[..., i1, j]
            rb_ij = hb[..., j1] * abs_r[..., i, j2] + hb[..., j2] * abs_r[..., i, j1]
            dist = jnp.abs(
                t_a[..., i2] * r[..., i1, j] - t_a[..., i1] * r[..., i2, j]
            )
            overlaps.append((ra_ij + rb_ij - dist) * inv_ln)
            axes.append(
                jnp.cross(rot_a[..., :, i], rot_b[..., :, j]) * inv_ln[..., None]
            )
            valids.append(ok)

    ov_all = jnp.stack(overlaps, axis=-1)                # [B,15]
    ax_all = jnp.stack(axes, axis=-2)                    # [B,15,3]
    va_all = jnp.stack(valids, axis=-1)

    separated = jnp.any(jnp.where(va_all, ov_all, jnp.inf) < 0.0, axis=-1)
    ov_masked = jnp.where(va_all, ov_all, jnp.inf)
    best = jnp.argmin(ov_masked, axis=-1)
    depth = jnp.take_along_axis(ov_masked, best[..., None], axis=-1)[..., 0]
    axis = jnp.take_along_axis(ax_all, best[..., None, None], axis=-2)[..., 0, :]
    sign = jnp.sign(jnp.einsum("...k,...k->...", axis, -t_world))
    sign = jnp.where(sign == 0.0, 1.0, sign)
    axis = axis * sign[..., None]
    overlap = ~separated & jnp.isfinite(depth)
    depth = jnp.where(overlap, depth, 0.0)
    return axis, depth, overlap, best.astype(jnp.int32)


def _sphere_box_contact(center, radius, pos_b, quat_b, half_b):
    """Sphere vs oriented box -> (depth, normal_world out of box,
    point_world on box surface).  Broadcasts."""
    qc = math3d.quat_conj(quat_b)
    local = math3d.quat_rotate(qc, center - pos_b)
    p_local, n_local, sdist = sh.closest_point_on_box(local, half_b)
    depth = radius - sdist
    n_world = math3d.quat_rotate(quat_b, n_local)
    p_world = math3d.quat_rotate(quat_b, p_local) + pos_b
    return depth, n_world, p_world


def _proj_half(rot, half, axis):
    """Support extent of an oriented box along a unit axis."""
    return jnp.sum(half * jnp.abs(jnp.einsum("...ij,...i->...j", rot, axis)), -1)


def pair_contacts(
    pos_a, quat_a, type_a, size_a,
    pos_b, quat_b, type_b, size_b,
    enable_capsule: bool = True,
):
    """Contact manifold for batched shape pairs.

    All inputs broadcastable to a common batch shape ``B``.  Returns
    (point f32[B,K,3], normal f32[B,K,3] from b toward a, depth f32[B,K],
    gvalid bool[B,K]) — gvalid marks slots whose shape-type case applies
    (penetration is ``depth > 0``).  K = K_PAIR, or K_BB when
    ``enable_capsule=False`` (host-known box-only scenes skip the capsule
    blocks entirely — characters are ghosts and never reach the solver).
    """
    b_shape = jnp.broadcast_shapes(
        pos_a.shape[:-1], pos_b.shape[:-1], type_a.shape, type_b.shape
    )
    pos_a = jnp.broadcast_to(pos_a, b_shape + (3,))
    pos_b = jnp.broadcast_to(pos_b, b_shape + (3,))
    quat_a = jnp.broadcast_to(quat_a, b_shape + (4,))
    quat_b = jnp.broadcast_to(quat_b, b_shape + (4,))
    size_a = jnp.broadcast_to(size_a, b_shape + (3,))
    size_b = jnp.broadcast_to(size_b, b_shape + (3,))
    type_a = jnp.broadcast_to(type_a, b_shape)
    type_b = jnp.broadcast_to(type_b, b_shape)

    a_box = type_a == SHAPE_BOX
    b_box = type_b == SHAPE_BOX
    a_cap = type_a == SHAPE_CAPSULE
    b_cap = type_b == SHAPE_CAPSULE

    rot_a = math3d.quat_to_mat3(quat_a)
    rot_b = math3d.quat_to_mat3(quat_b)

    # ---- box-box SAT manifold (slots 0..16) ------------------------------
    sat_n, sat_depth, sat_overlap, sat_best = box_box_sat_mtv(
        pos_a, rot_a, size_a, pos_b, rot_b, size_b
    )
    corners_a = sh.box_corners(pos_a, quat_a, size_a)     # [B,8,3]
    corners_b = sh.box_corners(pos_b, quat_b, size_b)

    projb = _proj_half(rot_b, size_b, sat_n)
    proja = _proj_half(rot_a, size_a, sat_n)
    plane_b = jnp.einsum("...k,...k->...", sat_n, pos_b) + projb
    plane_a = jnp.einsum("...k,...k->...", sat_n, pos_a) - proja

    n_dot_ca = jnp.einsum("...k,...ck->...c", sat_n, corners_a)
    depth_ca = plane_b[..., None] - n_dot_ca              # [B,8]
    inside_b = _point_in_obb(
        corners_a, pos_b[..., None, :], rot_b[..., None, :, :],
        size_b[..., None, :], _LATERAL_MARGIN,
    )
    valid_ca = inside_b & (depth_ca <= sat_depth[..., None] + _LATERAL_MARGIN)

    n_dot_cb = jnp.einsum("...k,...ck->...c", sat_n, corners_b)
    depth_cb = n_dot_cb - plane_a[..., None]
    inside_a = _point_in_obb(
        corners_b, pos_a[..., None, :], rot_a[..., None, :, :],
        size_a[..., None, :], _LATERAL_MARGIN,
    )
    valid_cb = inside_a & (depth_cb <= sat_depth[..., None] + _LATERAL_MARGIN)

    # Slot 16 — the non-corner contact.  sign() is deadbanded so axes nearly
    # perpendicular to n don't pick a corner from float noise (keeps the
    # point batch-shape deterministic).
    def _sign_eps(x, eps=1e-5):
        return jnp.where(x > eps, 1.0, jnp.where(x < -eps, -1.0, 0.0))

    n_in_a = _sign_eps(jnp.einsum("...ij,...i->...j", rot_a, sat_n))
    n_in_b = _sign_eps(jnp.einsum("...ij,...i->...j", rot_b, sat_n))
    sup_a = pos_a - jnp.einsum("...ij,...j->...i", rot_a, size_a * n_in_a)
    sup_b = pos_b + jnp.einsum("...ij,...j->...i", rot_b, size_b * n_in_b)

    # When the winning SAT axis is a cross axis A_i x B_j the touching
    # features are two edges: compute their actual closest points (the
    # quality Bullet's dispatcher gets from dBoxBox edge-edge,
    # PhysicsSystem.cpp:124-128) instead of a support-midpoint guess.
    is_edge = sat_best >= 6
    ei = jnp.clip((sat_best - 6) // 3, 0, 2)
    ej = jnp.clip((sat_best - 6) % 3, 0, 2)
    eye = jnp.eye(3, dtype=pos_a.dtype)
    hot_i = eye[ei]                                     # [...,3]
    hot_j = eye[ej]
    ua = jnp.einsum("...ij,...j->...i", rot_a, hot_i)   # A's edge direction
    ub = jnp.einsum("...ij,...j->...i", rot_b, hot_j)
    # edge centers: support corners along -/+n with the edge axis zeroed
    pa_c = pos_a - jnp.einsum(
        "...ij,...j->...i", rot_a, size_a * n_in_a * (1.0 - hot_i))
    pb_c = pos_b + jnp.einsum(
        "...ij,...j->...i", rot_b, size_b * n_in_b * (1.0 - hot_j))
    w = pa_c - pb_c
    cc_ = jnp.einsum("...k,...k->...", ua, ub)
    a1 = jnp.einsum("...k,...k->...", ua, w)
    b1 = jnp.einsum("...k,...k->...", ub, w)
    den = jnp.maximum(1.0 - cc_ * cc_, 1e-8)
    t_b = (b1 - cc_ * a1) / den
    s_a = cc_ * t_b - a1
    ha_i = jnp.einsum("...k,...k->...", size_a, hot_i)
    hb_j = jnp.einsum("...k,...k->...", size_b, hot_j)
    s_a = jnp.clip(s_a, -ha_i, ha_i)
    t_b = jnp.clip(t_b, -hb_j, hb_j)
    edge_pt = 0.5 * (pa_c + s_a[..., None] * ua + pb_c + t_b[..., None] * ub)

    center_pt = jnp.where(
        is_edge[..., None], edge_pt, 0.5 * (sup_a + sup_b))[..., None, :]
    center_depth = sat_depth[..., None]
    any_corner = jnp.any(valid_ca, -1) | jnp.any(valid_cb, -1)
    center_valid = (is_edge | ~any_corner)[..., None]

    bb_gate = (a_box & b_box & sat_overlap)[..., None]
    bb_pts = jnp.concatenate([corners_a, corners_b, center_pt], axis=-2)
    bb_n = jnp.broadcast_to(sat_n[..., None, :], b_shape + (K_BB, 3))
    bb_depth = jnp.concatenate([depth_ca, depth_cb, center_depth], axis=-1)
    bb_gvalid = (
        jnp.concatenate([valid_ca, valid_cb, center_valid], axis=-1) & bb_gate
    )

    if not enable_capsule:
        return bb_pts, bb_n, bb_depth, bb_gvalid

    # ---- box-capsule sphere samples (slots 17..19) -----------------------
    seg_a0, seg_a1 = sh.capsule_segment(pos_a, quat_a, size_a[..., 1])
    seg_b0, seg_b1 = sh.capsule_segment(pos_b, quat_b, size_b[..., 1])
    samp_a = seg_a0[..., None, :] + (seg_a1 - seg_a0)[..., None, :] * _CAP_TS[:, None]
    samp_b = seg_b0[..., None, :] + (seg_b1 - seg_b0)[..., None, :] * _CAP_TS[:, None]
    rad_a = size_a[..., 0]
    rad_b = size_b[..., 0]

    # a capsule vs b box
    d_cb, n_cb, p_cb = _sphere_box_contact(
        samp_a, rad_a[..., None],
        pos_b[..., None, :], quat_b[..., None, :], size_b[..., None, :],
    )
    # a box vs b capsule (spheres of b against box a; flip normal)
    d_bc, n_bc_outa, p_bc = _sphere_box_contact(
        samp_b, rad_b[..., None],
        pos_a[..., None, :], quat_a[..., None, :], size_a[..., None, :],
    )
    a_cap_b_box = (a_cap & b_box)[..., None]
    a_box_b_cap = (a_box & b_cap)[..., None]
    bc_pts = jnp.where(a_cap_b_box[..., None], p_cb, p_bc)
    bc_n = jnp.where(a_cap_b_box[..., None], n_cb, -n_bc_outa)
    bc_depth = jnp.where(a_cap_b_box, d_cb, d_bc)
    bc_gvalid = jnp.broadcast_to(a_cap_b_box | a_box_b_cap, b_shape + (3,))

    # ---- capsule-capsule (slot 20) ---------------------------------------
    c1, c2 = sh.closest_segment_segment(seg_a0, seg_a1, seg_b0, seg_b1)
    delta = c1 - c2
    dist = jnp.linalg.norm(delta, axis=-1)
    cc_n = jnp.where(
        dist[..., None] > 1e-9,
        delta / jnp.maximum(dist, 1e-9)[..., None],
        jnp.asarray([0.0, 1.0, 0.0]),
    )
    cc_depth = rad_a + rad_b - dist
    cc_pt = 0.5 * (c1 + c2)
    cc_gvalid = a_cap & b_cap

    point = jnp.concatenate([bb_pts, bc_pts, cc_pt[..., None, :]], axis=-2)
    normal = jnp.concatenate([bb_n, bc_n, cc_n[..., None, :]], axis=-2)
    depth = jnp.concatenate([bb_depth, bc_depth, cc_depth[..., None]], axis=-1)
    gvalid = jnp.concatenate([bb_gvalid, bc_gvalid, cc_gvalid[..., None]], axis=-1)
    return point, normal, depth, gvalid


def pair_contacts_dense(pos, quat, shape_type, size):
    """All-pairs dense contacts over entity arrays: outputs [N, N, K_PAIR]."""
    return pair_contacts(
        pos[:, None], quat[:, None], shape_type[:, None], size[:, None],
        pos[None, :], quat[None, :], shape_type[None, :], size[None, :],
    )


def ground_contacts(pos, quat, shape_type, size):
    """Contacts of every shape against the implicit static plane y=0.

    Returns (point [N,K_GROUND,3], normal (+Y), depth, geom_valid).
    Boxes contribute their 8 corners; capsules their two end-spheres.
    """
    n = pos.shape[0]
    is_box = shape_type == SHAPE_BOX
    is_cap = shape_type == SHAPE_CAPSULE

    corners = sh.box_corners(pos, quat, size)        # [N,8,3]
    box_depth = -corners[..., 1]

    seg_a, seg_b = sh.capsule_segment(pos, quat, size[..., 1])
    ends = jnp.stack([seg_a, seg_b], axis=1)          # [N,2,3]
    radius = size[..., 0]
    cap_depth = radius[:, None] - ends[..., 1]
    cap_pts = ends.at[..., 1].add(-radius[:, None])

    pts = jnp.where(is_box[:, None, None], corners,
                    jnp.concatenate([cap_pts, jnp.zeros((n, 6, 3))], axis=1))
    depth = jnp.where(is_box[:, None], box_depth,
                      jnp.concatenate([cap_depth, jnp.full((n, 6), -1.0)], axis=1))
    slot_valid = jnp.where(
        is_box[:, None],
        jnp.ones((n, K_GROUND), bool),
        jnp.concatenate([jnp.ones((n, 2), bool), jnp.zeros((n, 6), bool)], axis=1),
    ) & (is_box | is_cap)[:, None]
    normal = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (n, K_GROUND, 3)
    )
    return pts, normal, depth, slot_valid


def boolean_overlap_pairs(
    pos_a, quat_a, type_a, size_a,
    pos_b, quat_b, type_b, size_b,
):
    """Lean boolean shape-overlap for batched pairs (no manifolds).

    box-box: 15-axis SAT; box-capsule: 3 sampled spheres vs box;
    capsule-capsule: segment distance.  Used by triggers every step, so it
    skips all contact-point math.
    """
    b_shape = jnp.broadcast_shapes(
        pos_a.shape[:-1], pos_b.shape[:-1], type_a.shape, type_b.shape
    )
    pos_a = jnp.broadcast_to(pos_a, b_shape + (3,))
    pos_b = jnp.broadcast_to(pos_b, b_shape + (3,))
    quat_a = jnp.broadcast_to(quat_a, b_shape + (4,))
    quat_b = jnp.broadcast_to(quat_b, b_shape + (4,))
    size_a = jnp.broadcast_to(size_a, b_shape + (3,))
    size_b = jnp.broadcast_to(size_b, b_shape + (3,))
    type_a = jnp.broadcast_to(type_a, b_shape)
    type_b = jnp.broadcast_to(type_b, b_shape)

    a_box = type_a == SHAPE_BOX
    b_box = type_b == SHAPE_BOX
    a_cap = type_a == SHAPE_CAPSULE
    b_cap = type_b == SHAPE_CAPSULE

    rot_a = math3d.quat_to_mat3(quat_a)
    rot_b = math3d.quat_to_mat3(quat_b)
    _, _, sat, _ = box_box_sat_mtv(pos_a, rot_a, size_a, pos_b, rot_b, size_b)

    seg_a0, seg_a1 = sh.capsule_segment(pos_a, quat_a, size_a[..., 1])
    seg_b0, seg_b1 = sh.capsule_segment(pos_b, quat_b, size_b[..., 1])
    samp_a = seg_a0[..., None, :] + (seg_a1 - seg_a0)[..., None, :] * _CAP_TS[:, None]
    samp_b = seg_b0[..., None, :] + (seg_b1 - seg_b0)[..., None, :] * _CAP_TS[:, None]
    d_cb, _, _ = _sphere_box_contact(
        samp_a, size_a[..., 0:1],
        pos_b[..., None, :], quat_b[..., None, :], size_b[..., None, :],
    )
    d_bc, _, _ = _sphere_box_contact(
        samp_b, size_b[..., 0:1],
        pos_a[..., None, :], quat_a[..., None, :], size_a[..., None, :],
    )
    mixed = jnp.where(
        a_cap & b_box, jnp.any(d_cb > 0, -1), jnp.any(d_bc > 0, -1)
    )

    c1, c2 = sh.closest_segment_segment(seg_a0, seg_a1, seg_b0, seg_b1)
    cc = jnp.linalg.norm(c1 - c2, axis=-1) < size_a[..., 0] + size_b[..., 0]

    return jnp.where(
        a_box & b_box, sat,
        jnp.where(a_cap & b_cap, cc,
                  ((a_cap & b_box) | (a_box & b_cap)) & mixed),
    )


def boolean_overlap_matrix(pos, quat, shape_type, size, margin: float = 0.0):
    """Exact-ish boolean shape overlap [N, N] used by triggers.

    Box-box via SAT; mixed/capsule via the contact helpers.
    """
    point, normal, depth, gvalid = pair_contacts_dense(pos, quat, shape_type, size)
    del point, normal
    pen = jnp.any(gvalid & (depth > -margin), axis=-1)

    rot = math3d.quat_to_mat3(quat)
    _, _, sat_overlap, _ = box_box_sat_mtv(
        pos[:, None], rot[:, None], size[:, None],
        pos[None, :], rot[None, :], size[None, :],
    )
    is_box = shape_type == SHAPE_BOX
    bb = is_box[:, None] & is_box[None, :]
    return jnp.where(bb, sat_overlap, pen)
