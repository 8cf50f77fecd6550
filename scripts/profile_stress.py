"""Stage-by-stage timing of the 10k-body stress step on the real TPU.

Times each pipeline stage in isolation (own jit, block_until_ready) plus the
fused full step, to locate the bottleneck. Not a driver config — a dev tool.

Usage: python scripts/profile_stress.py [N] [--cpu]
"""

import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10000
if "--cpu" in sys.argv:
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from banggameengine_tpu.physics import narrowphase as nf
from banggameengine_tpu.physics import solver as sv
from banggameengine_tpu.physics.broadphase import build_neighbor_lists
from banggameengine_tpu.physics.step import CONTACT_BUDGET, physics_step
from banggameengine_tpu.scene.synthetic import build_falling_boxes
from banggameengine_tpu.state import BODY_DYNAMIC, COMP_CHARACTER, COMP_COLLIDER, InputFrame

state, static = build_falling_boxes(N)
print(f"platform={jax.devices()[0].platform} N={state.capacity}", flush=True)

# settle some steps so there are real contacts
step20 = jax.jit(lambda s, i: _scan_steps(s, i))


def _scan_steps(s, i):
    def body(c, _):
        out, _ = physics_step(c, i, static, broadphase="grid",
                              grid_cell_size=2.5, grid_table_size=16384,
                              max_neighbors=8)
        return out, None
    out, _ = jax.lax.scan(body, s, None, length=10)
    return out


inp = InputFrame.zero()
t0 = time.perf_counter()
state = step20(state, inp)
jax.block_until_ready(state)
print(f"compile+settle 10 steps: {time.perf_counter()-t0:.1f}s", flush=True)
for _ in range(11):  # ~1s sim: plenty of resting contacts
    state = step20(state, inp)
jax.block_until_ready(state)

alive = state.alive
solid = alive & ((state.comp_mask & (COMP_COLLIDER | COMP_CHARACTER)) != 0)
is_dyn = (static.body_type == BODY_DYNAMIC) & alive


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{name:34s} {ts[len(ts)//2]*1e3:8.2f} ms", flush=True)
    return out


# --- stage 1: broadphase ---------------------------------------------------
bp = jax.jit(lambda p, q: build_neighbor_lists(
    p, q, static.shape_type, static.shape_size, active=solid,
    cell_size=2.5, table_size=16384, cell_capacity=8, max_neighbors=8))
nl = timeit("broadphase grid+compact", bp, state.pos, state.quat)
print(f"  valid neighbor entries: {int(jnp.sum(nl.valid))}", flush=True)

# --- stage 2: narrowphase on neighbor lists --------------------------------
safe_j = jnp.maximum(nl.idx, 0)


def narrow(p, q):
    return nf.pair_contacts(
        p[:, None], q[:, None],
        static.shape_type[:, None], static.shape_size[:, None],
        p[safe_j], q[safe_j],
        static.shape_type[safe_j], static.shape_size[safe_j],
        enable_capsule=False,
    )


np_out = timeit("narrowphase SAT manifolds", jax.jit(narrow), state.pos, state.quat)
p_point, p_normal, p_depth, p_gvalid = np_out

# --- stage 3: ground + fold + compaction ------------------------------------
def compact(p, q):
    pp, pn, pd, pg = narrow(p, q)
    pv = pg & (pd > 0.0) & nl.valid[..., None]
    partner = jnp.broadcast_to(nl.idx[:, :, None], pd.shape)
    n = p.shape[0]
    m_pair = pd.shape[1] * pd.shape[2]
    gp, gn, gd, gv = nf.ground_contacts(p, q, static.shape_type, static.shape_size)
    gv = gv & (gd > 0.0) & is_dyn[:, None]
    all_b = jnp.concatenate([partner.reshape(n, m_pair),
                             jnp.full((n, nf.K_GROUND), -1, jnp.int32)], 1)
    all_pt = jnp.concatenate([pp.reshape(n, m_pair, 3), gp], 1)
    all_n = jnp.concatenate([pn.reshape(n, m_pair, 3), gn], 1)
    all_d = jnp.concatenate([pd.reshape(n, m_pair), gd], 1)
    all_v = jnp.concatenate([pv.reshape(n, m_pair), gv], 1)
    return sv.compact_contacts(all_b, all_pt, all_n, all_d, all_v, CONTACT_BUDGET)


cb, cpt, cn, cd, cvalid, _ovf = timeit("narrow+ground+compact", jax.jit(compact),
                                       state.pos, state.quat)[:6]
print(f"  compacted contacts: {int(jnp.sum(cvalid))}", flush=True)

# --- stage 4: solver 10 iterations ------------------------------------------
safe_b = jnp.maximum(cb, 0)
mu = jnp.where(cb < 0, static.friction[:, None] * 0.5,
               static.friction[:, None] * static.friction[safe_b])
e = jnp.zeros_like(mu)


def solve(v, w, p, q):
    inv_i_w = sv.inv_inertia_world(q, static.inv_inertia_body)
    return sv.solve_contacts_unified(
        v, w, p, static.inv_mass, inv_i_w,
        cb, cpt, cn, cd, cvalid, mu, e, jnp.float32(1 / 120), iterations=10)


timeit("solver x10 iters", jax.jit(solve), state.lin_vel, state.ang_vel,
       state.pos, state.quat)

# --- full fused step ---------------------------------------------------------
full = jax.jit(lambda s, i: physics_step(
    s, i, static, broadphase="grid", grid_cell_size=2.5,
    grid_table_size=16384, max_neighbors=8)[0])
timeit("FULL fused physics_step", full, state, inp)

# --- broadphase internals ----------------------------------------------------
def bp_sort_only(p):
    cells = jnp.floor(p / 2.5).astype(jnp.int32)
    h = ((cells[..., 0] * 73856093) ^ (cells[..., 1] * 19349663)
         ^ (cells[..., 2] * 83492791)) % 16384
    return jnp.argsort(jnp.where(solid, h, 16384))


timeit("  argsort(hashes) alone", jax.jit(bp_sort_only), state.pos)
