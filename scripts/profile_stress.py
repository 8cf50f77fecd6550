"""Stage-marginal timing of the 10k-body stress pipeline on the real chip.

Dispatch overhead through the axon tunnel is ~30 ms, so single-dispatch
stage timings are useless.  Instead: run 50-step scans of pipeline variants
with later stages disabled (outputs kept alive through a cheap dependence so
XLA cannot DCE the earlier stages), and report marginal per-step costs.

Variants:
  integrate   — no broadphase/contacts/solve, just gravity+integrate
  +broadphase — broadphase kept alive, contacts/solve skipped
  +contacts   — broadphase+narrowphase+compaction, solve skipped
  +solve(1)   — one solver iteration
  +solve(10)  — the full pipeline (should match bench.py stress)

Usage: python scripts/profile_stress.py [N] [settle_steps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from banggameengine_tpu import math3d
from banggameengine_tpu.physics import contact_t
from banggameengine_tpu.physics.broadphase_pallas import neighbor_lists_pallas
from banggameengine_tpu.physics.step import CONTACT_BUDGET, physics_step
from banggameengine_tpu.scene.synthetic import build_falling_boxes
from banggameengine_tpu.state import BODY_DYNAMIC, InputFrame

STEPS = 50


def make_variant(static, stage: str, iters: int = 10):
    """Mirrors physics_step's sorted-space pallas branch, stage-gated."""
    from banggameengine_tpu.physics import shapes as sh_mod
    from banggameengine_tpu.physics.broadphase_pallas import (
        morton_key_xz, neighbor_lists_pallas_aabb,
    )

    dt = static.fixed_dt
    gvec = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)

    def one(state, _):
        pos, quat = state.pos, state.quat
        vel, ang = state.lin_vel, state.ang_vel
        alive = state.alive
        n = pos.shape[0]
        is_dyn = (static.body_type == BODY_DYNAMIC) & alive
        vel = jnp.where(is_dyn[:, None], vel + gvec * static.gravity * dt, vel)

        if stage != "integrate":
            order = jnp.argsort(morton_key_xz(pos))
            mn, mx = sh_mod.shape_aabb(
                pos, quat, static.shape_type, static.shape_size)
            dyn_flag = jnp.where(alive, is_dyn.astype(jnp.int32), -1)

            def bits(a):
                return jax.lax.bitcast_convert_type(
                    a.astype(jnp.int32), jnp.float32)

            feat = jnp.concatenate(
                [mn, mx, pos, quat, vel, ang, static.shape_size,
                 static.inv_mass[:, None], static.inv_inertia_body,
                 static.friction[:, None], static.restitution[:, None],
                 bits(dyn_flag)[:, None], bits(static.layer)[:, None],
                 bits(static.mask)[:, None],
                 jnp.zeros((n, 1), jnp.float32)], axis=1)
            sf = feat[order]

            def ints(a):
                return jax.lax.bitcast_convert_type(a, jnp.int32)

            pos_s, quat_s = sf[:, 6:9], sf[:, 9:13]
            vel_s, ang_s = sf[:, 13:16], sf[:, 16:19]
            dyn_s = ints(sf[:, 28])
            nl = neighbor_lists_pallas_aabb(
                sf[:, 0:3], sf[:, 3:6], dyn_s, ints(sf[:, 29]),
                ints(sf[:, 30]), max_neighbors=8)
            if stage == "broadphase":
                vel = vel + 1e-30 * jnp.sum(nl.idx).astype(jnp.float32)
            else:
                ground_ok = dyn_s > 0
                (c_prt, c_ptx, c_pty, c_ptz, c_nx, c_ny, c_nz, c_dep,
                 c_valid, _ovf) = contact_t.box_contacts_t(
                    pos_s, quat_s, sf[:, 19:22], nl.idx, nl.valid,
                    ground_ok, budget=CONTACT_BUDGET)
                if stage == "contacts":
                    vel = vel + 1e-30 * (jnp.sum(c_dep)
                                         + jnp.sum(c_prt).astype(jnp.float32))
                else:
                    vel_s, ang_s = contact_t.solve_contacts_t(
                        vel_s, ang_s, pos_s, quat_s, sf[:, 22], sf[:, 23:26],
                        c_prt, c_ptx, c_pty, c_ptz, c_nx, c_ny, c_nz,
                        c_dep, c_valid, sf[:, 26], sf[:, 27],
                        dt, iterations=iters)
                    out = jnp.concatenate([vel_s, ang_s], axis=1)
                    out = out[jnp.argsort(order)]   # gather, not scatter
                    vel, ang = out[:, 0:3], out[:, 3:6]

        pos = jnp.where(is_dyn[:, None], pos + vel * dt, pos)
        quat = jnp.where(is_dyn[:, None],
                         math3d.quat_integrate(quat, ang, dt), quat)
        import dataclasses
        return dataclasses.replace(
            state, pos=pos, quat=quat, lin_vel=vel, ang_vel=ang), None

    @jax.jit
    def run(state):
        out, _ = jax.lax.scan(one, state, None, length=STEPS)
        return out

    return run


def timeit(name, fn, state, reps=3):
    t_compile0 = time.perf_counter()
    out = fn(state)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t_compile0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(state)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2] / STEPS * 1e3
    print(f"{name:12s} {med:8.3f} ms/step   (compile {t_compile:.1f}s)")
    return med


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    settle = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    state, static = build_falling_boxes(n)
    inp = InputFrame.zero()

    step1 = jax.jit(lambda s: physics_step(
        s, inp, static, broadphase="pallas", max_neighbors=8)[0])
    for _ in range(settle):
        state = step1(state)
    jax.block_until_ready(state)
    print(f"N={n}, settled {settle} steps; "
          f"mean |vel|={float(jnp.mean(jnp.abs(state.lin_vel))):.3f}")

    t0 = timeit("integrate", make_variant(static, "integrate"), state)
    t1 = timeit("+broadphase", make_variant(static, "broadphase"), state)
    t2 = timeit("+contacts", make_variant(static, "contacts"), state)
    tz = timeit("+solve(0)", make_variant(static, "solve", iters=0), state)
    t3 = timeit("+solve(1)", make_variant(static, "solve", iters=1), state)
    t5 = timeit("+solve(5)", make_variant(static, "solve", iters=5), state)
    t4 = timeit("+solve(10)", make_variant(static, "solve", iters=10), state)
    print("--- marginals ---")
    print(f"broadphase   {t1 - t0:8.3f} ms/step")
    print(f"contacts     {t2 - t1:8.3f} ms/step")
    print(f"solve setup  {tz - t2:8.3f} ms/step (0 iters)")
    print(f"iter 0->1    {t3 - tz:8.3f}   1->5 {(t5 - t3) / 4:8.3f}/it   "
          f"5->10 {(t4 - t5) / 5:8.3f}/it")
    print(f"total        {t4:8.3f} ms/step -> {1e3 / t4:.1f} steps/s")


if __name__ == "__main__":
    main()
