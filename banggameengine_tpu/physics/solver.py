"""Velocity-level contact solver: fixed-iteration mass-splitting Jacobi.

Replaces Bullet's sequential-impulse solver (``btSequentialImpulseConstraint
Solver``, created at ``PhysicsSystem.cpp:124-128``) with a deterministic,
order-independent scheme that maps to the TPU's dense vector units:

- contacts live in dense ``[N, N, K]`` (pair) and ``[N, K_g]`` (ground)
  blocks, so per-body impulse accumulation is a pure axis reduction —
  **no scatter/gather in the iteration loop**;
- Jacobi with *mass splitting*: each body's velocity delta is divided by its
  active contact count, which makes simultaneous-impulse Jacobi convergent
  (the standard parallel-solver trick; equivalent to solving with split
  masses) at the cost of more iterations than Gauss-Seidel;
- warm-start-free, fixed iteration count => bitwise deterministic and
  identical under ``vmap``.

Friction uses a 2-tangent pyramid clamped by mu * lambda_n; restitution uses
pre-solve approach speed with Bullet-style velocity threshold; Baumgarte
stabilization replaces split-impulse position correction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from banggameengine_tpu import math3d

Array = jax.Array

BAUMGARTE = 0.2            # Bullet global ERP default
PENETRATION_SLOP = 0.005   # ~ Bullet linear slop
RESTITUTION_THRESHOLD = 1.0  # Bullet m_restitutionVelocityThreshold default


def _orthonormal_tangents(n: Array) -> tuple[Array, Array]:
    """Build two tangents orthogonal to unit normal n, branchless."""
    # pick the helper axis least aligned with n
    helper = jnp.where(
        (jnp.abs(n[..., 0]) < 0.7)[..., None],
        jnp.asarray([1.0, 0.0, 0.0], n.dtype),
        jnp.asarray([0.0, 1.0, 0.0], n.dtype),
    )
    t1 = jnp.cross(n, helper)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


def inv_inertia_world(quat: Array, inv_inertia_body: Array) -> Array:
    """I^-1_world = R diag(I^-1_body) R^T. [..., 3, 3]."""
    r = math3d.quat_to_mat3(quat)
    return jnp.einsum("...ij,...j,...kj->...ik", r, inv_inertia_body, r)


@partial(jax.jit, static_argnames=("iterations",))
def solve_contacts(
    v: Array,                # f32[N,3] linear velocity (pre-solve)
    w: Array,                # f32[N,3] angular velocity
    pos: Array,              # f32[N,3] body centers
    inv_m: Array,            # f32[N]
    inv_i_world: Array,      # f32[N,3,3]
    friction: Array,         # f32[N]
    restitution: Array,      # f32[N]
    # pair contacts, dense [N,N,K]
    p_point: Array, p_normal: Array, p_depth: Array, p_valid: Array,
    # ground contacts [N,Kg]
    g_point: Array, g_normal: Array, g_depth: Array, g_valid: Array,
    ground_friction: Array,  # f32[] combined-with static plane (ref friction 0.5 default)
    dt: Array,
    iterations: int = 10,
) -> tuple[Array, Array]:
    """Solve all contacts; returns post-solve (v, w).

    ``p_valid``/``g_valid`` must already encode aliveness, layer filters,
    penetration (depth > 0) and the i<j upper-triangle convention for pairs.
    """
    n = v.shape[0]

    # contact anchors
    ra_p = p_point - pos[:, None, None]          # [N,N,K,3] from body a
    rb_p = p_point - pos[None, :, None]          # from body b
    ra_g = g_point - pos[:, None]                # [N,Kg,3]

    # combined material params (Bullet multiplies)
    mu_p = friction[:, None] * friction[None, :]          # [N,N]
    e_p = restitution[:, None] * restitution[None, :]
    mu_g = friction * ground_friction
    e_g = restitution * 0.0  # static plane restitution 0 (Bullet default)

    t1_p, t2_p = _orthonormal_tangents(p_normal)
    t1_g, t2_g = _orthonormal_tangents(g_normal)

    def rel_vel_pair(v_, w_):
        va = v_[:, None, None] + jnp.cross(w_[:, None, None], ra_p)
        vb = v_[None, :, None] + jnp.cross(w_[None, :, None], rb_p)
        return va - vb

    def rel_vel_ground(v_, w_):
        return v_[:, None] + jnp.cross(w_[:, None], ra_g)

    # effective masses (constant through iterations)
    def k_along(direction, ra, rb, ia, ib, im_a, im_b):
        # k = im_a + im_b + d . ((Ia (ra x d)) x ra + (Ib (rb x d)) x rb)
        rxd_a = jnp.cross(ra, direction)
        ang_a = jnp.cross(jnp.einsum("...ij,...j->...i", ia, rxd_a), ra)
        k = im_a + jnp.sum(direction * ang_a, -1)
        if rb is not None:
            rxd_b = jnp.cross(rb, direction)
            ang_b = jnp.cross(jnp.einsum("...ij,...j->...i", ib, rxd_b), rb)
            k = k + im_b + jnp.sum(direction * ang_b, -1)
        return jnp.maximum(k, 1e-9)

    ia_p = inv_i_world[:, None, None]
    ib_p = inv_i_world[None, :, None]
    im_a_p = inv_m[:, None, None]
    im_b_p = inv_m[None, :, None]
    kn_p = k_along(p_normal, ra_p, rb_p, ia_p, ib_p, im_a_p, im_b_p)
    kt1_p = k_along(t1_p, ra_p, rb_p, ia_p, ib_p, im_a_p, im_b_p)
    kt2_p = k_along(t2_p, ra_p, rb_p, ia_p, ib_p, im_a_p, im_b_p)

    ia_g = inv_i_world[:, None]
    im_a_g = inv_m[:, None]
    kn_g = k_along(g_normal, ra_g, None, ia_g, None, im_a_g, None)
    kt1_g = k_along(t1_g, ra_g, None, ia_g, None, im_a_g, None)
    kt2_g = k_along(t2_g, ra_g, None, ia_g, None, im_a_g, None)

    # bias: Baumgarte + restitution from pre-solve approach speed
    vn0_p = jnp.sum(rel_vel_pair(v, w) * p_normal, -1)
    vn0_g = jnp.sum(rel_vel_ground(v, w) * g_normal, -1)
    bounce_p = e_p[..., None] * jnp.maximum(-vn0_p - RESTITUTION_THRESHOLD, 0.0)
    bounce_g = e_g[:, None] * jnp.maximum(-vn0_g - RESTITUTION_THRESHOLD, 0.0)
    baum_p = (BAUMGARTE / dt) * jnp.maximum(p_depth - PENETRATION_SLOP, 0.0)
    baum_g = (BAUMGARTE / dt) * jnp.maximum(g_depth - PENETRATION_SLOP, 0.0)
    # target normal velocity (>=0): push-out speed
    target_p = jnp.maximum(bounce_p, baum_p)
    target_g = jnp.maximum(bounce_g, baum_g)

    # mass splitting: per-body active contact count
    cnt = (
        jnp.sum(p_valid, axis=(1, 2))      # contacts where body is 'a'
        + jnp.sum(p_valid, axis=(0, 2))    # where body is 'b'
        + jnp.sum(g_valid, axis=1)
    ).astype(jnp.float32)
    split = jnp.maximum(cnt, 1.0)

    zeros_p = jnp.zeros_like(p_depth)
    zeros_g = jnp.zeros_like(g_depth)

    def body(_, carry):
        v_, w_, ln_p, lt1_p, lt2_p, ln_g, lt1_g, lt2_g = carry

        # ---- pair contacts ----
        vr = rel_vel_pair(v_, w_)
        vn = jnp.sum(vr * p_normal, -1)
        dln = (-(vn - target_p)) / kn_p
        ln_new = jnp.maximum(ln_p + dln, 0.0)
        dln = jnp.where(p_valid, ln_new - ln_p, 0.0)
        ln_p = jnp.where(p_valid, ln_new, ln_p)

        vt1 = jnp.sum(vr * t1_p, -1)
        vt2 = jnp.sum(vr * t2_p, -1)
        max_f = mu_p[..., None] * ln_p
        lt1_new = jnp.clip(lt1_p - vt1 / kt1_p, -max_f, max_f)
        lt2_new = jnp.clip(lt2_p - vt2 / kt2_p, -max_f, max_f)
        dlt1 = jnp.where(p_valid, lt1_new - lt1_p, 0.0)
        dlt2 = jnp.where(p_valid, lt2_new - lt2_p, 0.0)
        lt1_p = jnp.where(p_valid, lt1_new, lt1_p)
        lt2_p = jnp.where(p_valid, lt2_new, lt2_p)

        imp_p = (
            dln[..., None] * p_normal
            + dlt1[..., None] * t1_p
            + dlt2[..., None] * t2_p
        )  # [N,N,K,3] impulse applied +a / -b

        # ---- ground contacts ----
        vrg = rel_vel_ground(v_, w_)
        vng = jnp.sum(vrg * g_normal, -1)
        dlng = (-(vng - target_g)) / kn_g
        lng_new = jnp.maximum(ln_g + dlng, 0.0)
        dlng = jnp.where(g_valid, lng_new - ln_g, 0.0)
        ln_g = jnp.where(g_valid, lng_new, ln_g)

        vt1g = jnp.sum(vrg * t1_g, -1)
        vt2g = jnp.sum(vrg * t2_g, -1)
        max_fg = mu_g[:, None] * ln_g
        lt1g_new = jnp.clip(lt1_g - vt1g / kt1_g, -max_fg, max_fg)
        lt2g_new = jnp.clip(lt2_g - vt2g / kt2_g, -max_fg, max_fg)
        dlt1g = jnp.where(g_valid, lt1g_new - lt1_g, 0.0)
        dlt2g = jnp.where(g_valid, lt2g_new - lt2_g, 0.0)
        lt1_g = jnp.where(g_valid, lt1g_new, lt1_g)
        lt2_g = jnp.where(g_valid, lt2g_new, lt2_g)

        imp_g = (
            dlng[..., None] * g_normal
            + dlt1g[..., None] * t1_g
            + dlt2g[..., None] * t2_g
        )

        # ---- accumulate per body (pure reductions) ----
        lin_imp = (
            jnp.sum(imp_p, axis=(1, 2))       # + as body a
            - jnp.sum(imp_p, axis=(0, 2))     # - as body b
            + jnp.sum(imp_g, axis=1)
        )
        ang_imp = (
            jnp.sum(jnp.cross(ra_p, imp_p), axis=(1, 2))
            - jnp.sum(jnp.cross(rb_p, imp_p), axis=(0, 2))
            + jnp.sum(jnp.cross(ra_g, imp_g), axis=1)
        )
        v_ = v_ + lin_imp * (inv_m / split)[:, None]
        w_ = w_ + jnp.einsum("nij,nj->ni", inv_i_world, ang_imp) / split[:, None]
        return v_, w_, ln_p, lt1_p, lt2_p, ln_g, lt1_g, lt2_g

    carry = (v, w, zeros_p, zeros_p, zeros_p, zeros_g, zeros_g, zeros_g)
    carry = jax.lax.fori_loop(0, iterations, body, carry)
    return carry[0], carry[1]


@partial(jax.jit, static_argnames=("iterations",))
def solve_contacts_nbr(
    v: Array,                # f32[N,3]
    w: Array,                # f32[N,3]
    pos: Array,              # f32[N,3]
    inv_m: Array,            # f32[N]
    inv_i_world: Array,      # f32[N,3,3]
    friction: Array,         # f32[N]
    restitution: Array,      # f32[N]
    nbr_idx: Array,          # i32[N,K] neighbor ids (-1 pad)
    # neighbor-pair contacts [N,K,C]: row i treats i as body 'a'
    p_point: Array, p_normal: Array, p_depth: Array, p_valid: Array,
    # ground contacts [N,Kg]
    g_point: Array, g_normal: Array, g_depth: Array, g_valid: Array,
    ground_friction: Array,
    dt: Array,
    iterations: int = 10,
) -> tuple[Array, Array]:
    """Neighbor-list variant of :func:`solve_contacts` for the grid
    broadphase path (10k-body stress).

    Every unordered pair appears mirrored in both participants' rows with
    identical lambdas by symmetry, so each row only accumulates impulses on
    its own body — per-body accumulation is a row reduction, no scatters.
    """
    safe_j = jnp.maximum(nbr_idx, 0)

    ra = p_point - pos[:, None, None]                 # [N,K,C,3]
    rb = p_point - pos[safe_j][:, :, None]

    mu_p = friction[:, None] * friction[safe_j]       # [N,K]
    e_p = restitution[:, None] * restitution[safe_j]
    mu_g = friction * ground_friction
    e_g = restitution * 0.0

    t1_p, t2_p = _orthonormal_tangents(p_normal)
    t1_g, t2_g = _orthonormal_tangents(g_normal)

    def rel_vel_pair(v_, w_):
        va = v_[:, None, None] + jnp.cross(w_[:, None, None], ra)
        vb = v_[safe_j][:, :, None] + jnp.cross(w_[safe_j][:, :, None], rb)
        return va - vb

    def rel_vel_ground(v_, w_):
        return v_[:, None] + jnp.cross(w_[:, None], g_point - pos[:, None])

    def k_along(direction, ra_, rb_, ia_, ib_, im_a, im_b):
        rxd_a = jnp.cross(ra_, direction)
        ang_a = jnp.cross(jnp.einsum("...ij,...j->...i", ia_, rxd_a), ra_)
        k = im_a + jnp.sum(direction * ang_a, -1)
        if rb_ is not None:
            rxd_b = jnp.cross(rb_, direction)
            ang_b = jnp.cross(jnp.einsum("...ij,...j->...i", ib_, rxd_b), rb_)
            k = k + im_b + jnp.sum(direction * ang_b, -1)
        return jnp.maximum(k, 1e-9)

    ia_p = inv_i_world[:, None, None]
    ib_p = inv_i_world[safe_j][:, :, None]
    im_a_p = inv_m[:, None, None]
    im_b_p = inv_m[safe_j][:, :, None]
    kn_p = k_along(p_normal, ra, rb, ia_p, ib_p, im_a_p, im_b_p)
    kt1_p = k_along(t1_p, ra, rb, ia_p, ib_p, im_a_p, im_b_p)
    kt2_p = k_along(t2_p, ra, rb, ia_p, ib_p, im_a_p, im_b_p)

    ra_g = g_point - pos[:, None]
    ia_g = inv_i_world[:, None]
    im_a_g = inv_m[:, None]
    kn_g = k_along(g_normal, ra_g, None, ia_g, None, im_a_g, None)
    kt1_g = k_along(t1_g, ra_g, None, ia_g, None, im_a_g, None)
    kt2_g = k_along(t2_g, ra_g, None, ia_g, None, im_a_g, None)

    vn0_p = jnp.sum(rel_vel_pair(v, w) * p_normal, -1)
    vn0_g = jnp.sum(rel_vel_ground(v, w) * g_normal, -1)
    bounce_p = e_p[..., None] * jnp.maximum(-vn0_p - RESTITUTION_THRESHOLD, 0.0)
    bounce_g = e_g[:, None] * jnp.maximum(-vn0_g - RESTITUTION_THRESHOLD, 0.0)
    baum_p = (BAUMGARTE / dt) * jnp.maximum(p_depth - PENETRATION_SLOP, 0.0)
    baum_g = (BAUMGARTE / dt) * jnp.maximum(g_depth - PENETRATION_SLOP, 0.0)
    target_p = jnp.maximum(bounce_p, baum_p)
    target_g = jnp.maximum(bounce_g, baum_g)

    cnt = (
        jnp.sum(p_valid, axis=(1, 2)) + jnp.sum(g_valid, axis=1)
    ).astype(jnp.float32)
    split = jnp.maximum(cnt, 1.0)

    zeros_p = jnp.zeros_like(p_depth)
    zeros_g = jnp.zeros_like(g_depth)

    def body(_, carry):
        v_, w_, ln_p, lt1_p, lt2_p, ln_g, lt1_g, lt2_g = carry

        vr = rel_vel_pair(v_, w_)
        vn = jnp.sum(vr * p_normal, -1)
        dln = (-(vn - target_p)) / kn_p
        ln_new = jnp.maximum(ln_p + dln, 0.0)
        dln = jnp.where(p_valid, ln_new - ln_p, 0.0)
        ln_p = jnp.where(p_valid, ln_new, ln_p)

        vt1 = jnp.sum(vr * t1_p, -1)
        vt2 = jnp.sum(vr * t2_p, -1)
        max_f = mu_p[..., None] * ln_p
        lt1_new = jnp.clip(lt1_p - vt1 / kt1_p, -max_f, max_f)
        lt2_new = jnp.clip(lt2_p - vt2 / kt2_p, -max_f, max_f)
        dlt1 = jnp.where(p_valid, lt1_new - lt1_p, 0.0)
        dlt2 = jnp.where(p_valid, lt2_new - lt2_p, 0.0)
        lt1_p = jnp.where(p_valid, lt1_new, lt1_p)
        lt2_p = jnp.where(p_valid, lt2_new, lt2_p)

        imp_p = (
            dln[..., None] * p_normal
            + dlt1[..., None] * t1_p
            + dlt2[..., None] * t2_p
        )

        vrg = rel_vel_ground(v_, w_)
        vng = jnp.sum(vrg * g_normal, -1)
        dlng = (-(vng - target_g)) / kn_g
        lng_new = jnp.maximum(ln_g + dlng, 0.0)
        dlng = jnp.where(g_valid, lng_new - ln_g, 0.0)
        ln_g = jnp.where(g_valid, lng_new, ln_g)

        vt1g = jnp.sum(vrg * t1_g, -1)
        vt2g = jnp.sum(vrg * t2_g, -1)
        max_fg = mu_g[:, None] * ln_g
        lt1g_new = jnp.clip(lt1_g - vt1g / kt1_g, -max_fg, max_fg)
        lt2g_new = jnp.clip(lt2_g - vt2g / kt2_g, -max_fg, max_fg)
        dlt1g = jnp.where(g_valid, lt1g_new - lt1_g, 0.0)
        dlt2g = jnp.where(g_valid, lt2g_new - lt2_g, 0.0)
        lt1_g = jnp.where(g_valid, lt1g_new, lt1_g)
        lt2_g = jnp.where(g_valid, lt2g_new, lt2_g)

        imp_g = (
            dlng[..., None] * g_normal
            + dlt1g[..., None] * t1_g
            + dlt2g[..., None] * t2_g
        )

        # row reductions only: body i's impulses live in row i
        lin_imp = jnp.sum(imp_p, axis=(1, 2)) + jnp.sum(imp_g, axis=1)
        ang_imp = (
            jnp.sum(jnp.cross(ra, imp_p), axis=(1, 2))
            + jnp.sum(jnp.cross(ra_g, imp_g), axis=1)
        )
        v_ = v_ + lin_imp * (inv_m / split)[:, None]
        w_ = w_ + jnp.einsum("nij,nj->ni", inv_i_world, ang_imp) / split[:, None]
        return v_, w_, ln_p, lt1_p, lt2_p, ln_g, lt1_g, lt2_g

    carry = (v, w, zeros_p, zeros_p, zeros_p, zeros_g, zeros_g, zeros_g)
    carry = jax.lax.fori_loop(0, iterations, body, carry)
    return carry[0], carry[1]
