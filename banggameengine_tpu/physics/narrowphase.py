"""Narrowphase contact generation for the reference's shape set.

Shapes: oriented boxes, Y-axis capsules, plus the implicit static ground
plane y=0 (``PhysicsSystem.cpp:149-166``).  This replaces Bullet's
dispatcher/manifold machinery (``PhysicsSystem.cpp:124-128``) with dense,
branchless, mask-driven kernels:

- **box-box**: corner-vs-box contacts both ways (8+8 candidate points).
  Face-face stacking resolves with full 4-corner manifolds; degenerate
  edge-edge-only configurations are approximated (SURVEY.md §7 "Hard parts":
  tolerance-based parity, not Bullet bit-exactness).
- **box-capsule**: the capsule's core segment sampled at 3 points, each a
  sphere-vs-box contact.
- **capsule-capsule**: closest-points sphere-sphere contact.
- **ground**: box corners / capsule end-spheres against y=0.

Contact normal convention: ``normal`` points from body *b* toward body *a*
(the direction pushing *a* out of *b*).  ``depth > 0`` means penetrating.

Everything is computed densely over an ``[N, N]`` pair matrix (all pairs,
masked to the upper triangle by the caller) so per-body impulse accumulation
in the solver is a pure axis-reduction — no scatters on the TPU hot path.
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
    """Boolean: are points inside the oriented box expanded by margin.

    pts [..., 3]; pos_b/rot_b/half_b broadcastable against pts' batch dims.
    """
    local = jnp.einsum("...ij,...i->...j", rot_b, pts - pos_b)  # R^T (p - c)
    return jnp.all(jnp.abs(local) <= half_b + margin, axis=-1)


def _box_box_sat_mtv(pos, rot, half):
    """Dense [N, N] box-box SAT with minimum-translation vector.

    Returns (n [N,N,3] unit axis pointing from box b toward box a,
    depth [N,N] overlap along that axis, overlap [N,N] bool).
    Classic 15-axis test (Ericson RTCD 4.4.1) with normalized cross axes so
    overlaps are comparable across axis families.
    """
    n_ = pos.shape[0]
    ra_cols = rot[:, None]                     # [N,1,3,3] box a axes (columns)
    rb_cols = rot[None, :]
    r = jnp.einsum("abki,abkj->abij", ra_cols, rb_cols)  # R = A^T B
    abs_r = jnp.abs(r)
    t_world = pos[None, :] - pos[:, None]      # from a to b
    t_a = jnp.einsum("abki,abk->abi", ra_cols, t_world)  # in A frame
    ha = half[:, None]
    hb = half[None, :]

    overlaps = []
    axes = []
    valids = []

    # A's face axes
    for i in range(3):
        dist = jnp.abs(t_a[..., i])
        ov = ha[..., i] + jnp.einsum("abj,abj->ab", hb, abs_r[..., i, :]) - dist
        overlaps.append(ov)
        axes.append(jnp.broadcast_to(ra_cols[..., :, i], (n_, n_, 3)))
        valids.append(jnp.ones((n_, n_), bool))
    # B's face axes
    t_b = jnp.einsum("abki,abk->abi", rb_cols, t_world)
    for j in range(3):
        dist = jnp.abs(t_b[..., j])
        ov = jnp.einsum("abi,abi->ab", ha, abs_r[..., :, j]) + hb[..., j] - dist
        overlaps.append(ov)
        axes.append(jnp.broadcast_to(rb_cols[..., :, j], (n_, n_, 3)))
        valids.append(jnp.ones((n_, n_), bool))
    # cross axes A_i x B_j
    for i in range(3):
        i1, i2 = (i + 1) % 3, (i + 2) % 3
        for j in range(3):
            j1, j2 = (j + 1) % 3, (j + 2) % 3
            ln = jnp.sqrt(jnp.maximum(1.0 - r[..., i, j] ** 2, 0.0))
            ok = ln > 1e-4
            inv_ln = 1.0 / jnp.maximum(ln, 1e-4)
            ra_ij = ha[..., i1] * abs_r[..., i2, j] + ha[..., i2] * abs_r[..., i1, j]
            rb_ij = hb[..., j1] * abs_r[..., i, j2] + hb[..., j2] * abs_r[..., i, j1]
            dist = jnp.abs(t_a[..., i2] * r[..., i1, j] - t_a[..., i1] * r[..., i2, j])
            overlaps.append((ra_ij + rb_ij - dist) * inv_ln)
            axis_w = jnp.cross(
                jnp.broadcast_to(ra_cols[..., :, i], (n_, n_, 3)),
                jnp.broadcast_to(rb_cols[..., :, j], (n_, n_, 3)),
            ) * inv_ln[..., None]
            axes.append(axis_w)
            valids.append(ok)

    ov_all = jnp.stack(overlaps, axis=-1)      # [N,N,15]
    ax_all = jnp.stack(axes, axis=-2)          # [N,N,15,3]
    va_all = jnp.stack(valids, axis=-1)

    separated = jnp.any(jnp.where(va_all, ov_all, jnp.inf) < 0.0, axis=-1)
    ov_masked = jnp.where(va_all, ov_all, jnp.inf)
    best = jnp.argmin(ov_masked, axis=-1)
    depth = jnp.take_along_axis(ov_masked, best[..., None], axis=-1)[..., 0]
    axis = jnp.take_along_axis(ax_all, best[..., None, None], axis=-2)[..., 0, :]
    # orient from b toward a
    sign = jnp.sign(jnp.einsum("abk,abk->ab", axis, -t_world))
    sign = jnp.where(sign == 0.0, 1.0, sign)
    axis = axis * sign[..., None]
    overlap = ~separated & jnp.isfinite(depth)
    depth = jnp.where(overlap, depth, 0.0)
    return axis, depth, overlap


def _sphere_box_contact(center, radius, pos_b, quat_b, half_b):
    """Sphere vs oriented box.  Returns (depth, normal_world out of box,
    point_world on box surface)."""
    qc = math3d.quat_conj(quat_b)
    local = math3d.quat_rotate(qc, center - pos_b)
    p_local, n_local, sdist = sh.closest_point_on_box(local, half_b)
    depth = radius - sdist  # sdist<0 inside -> depth > radius
    n_world = math3d.quat_rotate(quat_b, n_local)
    p_world = math3d.quat_rotate(quat_b, p_local) + pos_b
    return depth, n_world, p_world


def pair_contacts_dense(pos, quat, shape_type, size):
    """All-pairs dense contact generation.

    Inputs are per-entity arrays over capacity N; output arrays are
    ``[N, N, K_PAIR]`` where entry (a, b, k) is a candidate contact between
    bodies a and b.  The caller masks validity (upper triangle, aliveness,
    layer filters, depth > 0).

    Returns (point, normal, depth, geom_valid) where geom_valid marks slots
    whose shape-type case applies (independent of penetration).
    """
    n = pos.shape[0]
    is_box = shape_type == SHAPE_BOX
    is_cap = shape_type == SHAPE_CAPSULE

    # --- block 1: box-box SAT manifold (slots 0..16) ----------------------
    rot = math3d.quat_to_mat3(quat)
    sat_n, sat_depth, sat_overlap = _box_box_sat_mtv(pos, rot, size)
    corners = sh.box_corners(pos, quat, size)  # [N, 8, 3]

    # support extents of each box along the MTV axis
    # proj_half(X along n) = sum_i hx_i |n . X_i|
    def proj_half(rot_x, half_x, axis):
        # rot_x [...,3,3] columns are body axes; axis [...,3]
        return jnp.sum(
            half_x * jnp.abs(jnp.einsum("...ij,...i->...j", rot_x, axis)), -1
        )

    # b's farthest extent along n (from b to a): plane corners of A must not
    # exceed; per-corner depth = (n.pos_b + projb) - n.corner
    projb = proj_half(rot[None, :], size[None, :], sat_n)     # [N,N]
    proja = proj_half(rot[:, None], size[:, None], sat_n)
    plane_b = jnp.einsum("abk,bk->ab", sat_n, pos) + projb     # b's top along n
    plane_a = (
        jnp.einsum("abk,ak->ab", sat_n, pos) - proja
    )                                                          # a's bottom along n

    # corners of A: depth = plane_b - n.c ; laterally contained in B(+margin)
    ca = corners[:, None]                                      # [N,1,8,3] -> b'cast
    n_dot_ca = jnp.einsum("abk,abck->abc", sat_n, jnp.broadcast_to(ca, (n, n, 8, 3)))
    depth_a = plane_b[..., None] - n_dot_ca                    # [N,N,8]
    inside_b = _point_in_obb(
        jnp.broadcast_to(ca, (n, n, 8, 3)),
        pos[None, :, None], rot[None, :, None], size[None, :, None],
        _LATERAL_MARGIN,
    )
    valid_a = inside_b & (depth_a <= sat_depth[..., None] + _LATERAL_MARGIN)
    pts_a = jnp.broadcast_to(ca, (n, n, 8, 3))

    # corners of B: depth = n.c - plane_a ; contained in A(+margin)
    cb = corners[None, :]                                      # [1,N,8,3]
    n_dot_cb = jnp.einsum("abk,abck->abc", sat_n, jnp.broadcast_to(cb, (n, n, 8, 3)))
    depth_b = n_dot_cb - plane_a[..., None]
    inside_a = _point_in_obb(
        jnp.broadcast_to(cb, (n, n, 8, 3)),
        pos[:, None, None], rot[:, None, None], size[:, None, None],
        _LATERAL_MARGIN,
    )
    valid_b = inside_a & (depth_b <= sat_depth[..., None] + _LATERAL_MARGIN)
    pts_b = jnp.broadcast_to(cb, (n, n, 8, 3))

    # SAT center contact (covers edge-edge where no corner is contained):
    # midpoint of the two support points along +/- n
    sup_a = pos[:, None] - jnp.einsum(
        "abij,abj->abi",
        jnp.broadcast_to(rot[:, None], (n, n, 3, 3)),
        size[:, None] * jnp.sign(jnp.einsum("abij,abi->abj", jnp.broadcast_to(rot[:, None], (n, n, 3, 3)), sat_n)),
    )
    sup_b = pos[None, :] + jnp.einsum(
        "abij,abj->abi",
        jnp.broadcast_to(rot[None, :], (n, n, 3, 3)),
        size[None, :] * jnp.sign(jnp.einsum("abij,abi->abj", jnp.broadcast_to(rot[None, :], (n, n, 3, 3)), sat_n)),
    )
    pts_c = 0.5 * (sup_a + sup_b)[:, :, None]                  # [N,N,1,3]
    depth_c = sat_depth[..., None]
    # center contact only when no corner contact was found (keeps face-face
    # manifolds to their 4 corner points)
    any_corner = jnp.any(valid_a, -1) | jnp.any(valid_b, -1)
    valid_c = (~any_corner)[..., None]

    bb_pair = is_box[:, None] & is_box[None, :]
    bb_gate = (bb_pair & sat_overlap)[..., None]
    bb_pts = jnp.concatenate([pts_a, pts_b, pts_c], axis=2)    # [N,N,17,3]
    bb_n = jnp.broadcast_to(sat_n[:, :, None], (n, n, K_BB, 3))
    bb_depth = jnp.concatenate([depth_a, depth_b, depth_c], axis=2)
    bb_gvalid = jnp.concatenate([valid_a, valid_b, valid_c], axis=2) & bb_gate

    # --- block 2: box-capsule sphere samples (slots 16..18) ---------------
    seg_a, seg_b = sh.capsule_segment(pos, quat, size[..., 1])  # [N,3] each
    # sample points along each entity's capsule segment: [N, 3smp, 3]
    samples = seg_a[:, None, :] + (seg_b - seg_a)[:, None, :] * _CAP_TS[None, :, None]
    radius = size[..., 0]

    # case A: a is capsule, b is box — spheres of a vs box b
    d_cb, n_cb, p_cb = _sphere_box_contact(
        samples[:, None],                       # [N,1,3smp,3]
        radius[:, None, None],
        pos[None, :, None], quat[None, :, None], size[None, :, None],
    )
    # normal out of box b == from b toward a ✓

    # case B: a is box, b is capsule — spheres of b vs box a
    d_bc, n_bc_outa, p_bc = _sphere_box_contact(
        samples[None, :],                       # [1,N,3smp,3] b's samples
        radius[None, :, None],
        pos[:, None, None], quat[:, None, None], size[:, None, None],
    )
    n_bc = -n_bc_outa  # push a out of b = -(out of box a)

    a_cap_b_box = (is_cap[:, None] & is_box[None, :])[..., None]
    a_box_b_cap = (is_box[:, None] & is_cap[None, :])[..., None]
    bc_pts = jnp.where(a_cap_b_box[..., None], p_cb, p_bc)
    bc_n = jnp.where(a_cap_b_box[..., None], n_cb, n_bc)
    bc_depth = jnp.where(a_cap_b_box, d_cb, d_bc)
    bc_gvalid = jnp.broadcast_to(a_cap_b_box | a_box_b_cap, (n, n, 3))

    # --- block 3: capsule-capsule (slot 19) -------------------------------
    c1, c2 = sh.closest_segment_segment(
        seg_a[:, None], seg_b[:, None], seg_a[None, :], seg_b[None, :]
    )  # [N,N,3] closest points on a's and b's segments
    delta = c1 - c2
    dist = jnp.linalg.norm(delta, axis=-1)
    cc_n = delta / jnp.maximum(dist, 1e-9)[..., None]  # from b to a ✓
    # coincident segments: fall back to +Y
    cc_n = jnp.where(dist[..., None] > 1e-9, cc_n, jnp.asarray([0.0, 1.0, 0.0]))
    cc_depth = radius[:, None] + radius[None, :] - dist
    cc_pt = 0.5 * (c1 + c2)
    cc_gvalid = is_cap[:, None] & is_cap[None, :]

    point = jnp.concatenate([bb_pts, bc_pts, cc_pt[:, :, None]], axis=2)
    normal = jnp.concatenate([bb_n, bc_n, cc_n[:, :, None]], axis=2)
    depth = jnp.concatenate([bb_depth, bc_depth, cc_depth[:, :, None]], axis=2)
    gvalid = jnp.concatenate([bb_gvalid, bc_gvalid, cc_gvalid[:, :, None]], axis=2)
    return point, normal, depth, gvalid


def ground_contacts(pos, quat, shape_type, size):
    """Contacts of every shape against the implicit static plane y=0.

    Returns (point [N,K_GROUND,3], normal [N,K_GROUND,3] = +Y, depth,
    geom_valid).  Boxes contribute their 8 corners; capsules their two
    end-spheres (slots 0-1).
    """
    n = pos.shape[0]
    is_box = shape_type == SHAPE_BOX
    is_cap = shape_type == SHAPE_CAPSULE

    corners = sh.box_corners(pos, quat, size)        # [N,8,3]
    box_depth = -corners[..., 1]                      # below y=0 => positive

    seg_a, seg_b = sh.capsule_segment(pos, quat, size[..., 1])
    ends = jnp.stack([seg_a, seg_b], axis=1)          # [N,2,3]
    radius = size[..., 0]
    cap_depth = radius[:, None] - ends[..., 1]        # r - y
    cap_pts = ends.at[..., 1].add(-radius[:, None])   # lowest sphere points

    pts = jnp.where(is_box[:, None, None], corners,
                    jnp.concatenate([cap_pts, jnp.zeros((n, 6, 3))], axis=1))
    depth = jnp.where(is_box[:, None], box_depth,
                      jnp.concatenate([cap_depth, jnp.full((n, 6), -1.0)], axis=1))
    slot_valid = jnp.where(
        is_box[:, None],
        jnp.ones((n, K_GROUND), bool),
        jnp.concatenate([jnp.ones((n, 2), bool), jnp.zeros((n, 6), bool)], axis=1),
    ) & (is_box | is_cap)[:, None]
    normal = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (n, K_GROUND, 3))
    return pts, normal, depth, slot_valid


def boolean_overlap_matrix(pos, quat, shape_type, size, margin: float = 0.0):
    """Exact-ish boolean shape overlap [N, N] used by triggers.

    Box-box uses a 15-axis SAT; box-capsule uses the sampled sphere contacts;
    capsule-capsule the segment distance.  (Bullet's ghost triggers fire on
    broadphase AABB pairs, ``PhysicsSystem.cpp:1017-1074`` via
    btPairCachingGhostObject; we keep trigger tests at true shape overlap and
    expose AABB mode separately in the trigger module.)
    """
    point, normal, depth, gvalid = pair_contacts_dense(pos, quat, shape_type, size)
    del point, normal
    pen = jnp.any(gvalid & (depth > -margin), axis=-1)

    # SAT for box-box (corner tests alone miss edge-edge overlap)
    rot = math3d.quat_to_mat3(quat)
    _, _, sat_overlap = _box_box_sat_mtv(pos, rot, size)
    is_box = shape_type == SHAPE_BOX
    bb = is_box[:, None] & is_box[None, :]
    return jnp.where(bb, sat_overlap, pen)
