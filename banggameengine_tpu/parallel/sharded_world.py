"""Fully sharded single world: state AND compute split over the mesh.

Completes SURVEY.md §2 stretch component (c) / VERDICT round-1 item 8: the
entity-sharded contact phase in :mod:`spatial` shards only *compute* (state
stays replicated); here the ``WorldState`` and ``StaticScene`` body arrays
themselves live sharded over an ``('entity',)`` mesh — each device holds
``N / D`` rows of every ``[N, ...]`` array, so a single world's capacity
scales with the slice instead of one chip's HBM.

Per step each shard:

1. applies gravity to its local dynamic rows;
2. ``all_gather``\\ s the pose/velocity columns it needs to see potential
   partners (transient [N, ...] views — the *persistent* state stays
   sharded; the gathered temporaries are a small multiple of pos+quat+vel);
3. runs the shared local-rows contact pipeline
   (:func:`spatial.local_rows_contact_solve`): dense AABB broadphase of its
   rows vs the gathered world, local narrowphase, mirrored-row Jacobi solve
   with one velocity all_gather per iteration over ICI;
4. integrates its rows and refreshes their world matrices locally.

Restrictions (asserted at factory time): flat hierarchy (all bodies roots —
the intended use is huge physics worlds, not deep scene graphs), no
characters and no triggers (their slots are O(1) host-replicated concepts;
shard them when a use case appears).

Reference frame: the pipeline stages mirror ``PhysicsSystem::Update``
(``PhysicsSystem.cpp:1208-1328``) exactly as :func:`physics_step` does —
this module only changes WHERE each row lives.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from banggameengine_tpu import math3d
from banggameengine_tpu.parallel.spatial import (
    local_rows_contact_solve, static_columns,
)
from banggameengine_tpu.state import (
    BODY_DYNAMIC, BODY_KINEMATIC, COMP_CHARACTER, COMP_COLLIDER, StaticScene,
    WorldState, tree_replace,
)

AXIS = "entity"


def make_entity_axis_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


def _row_sharded_spec(a, mesh):
    """PartitionSpec sharding axis 0 for [N, ...] arrays, replicated for
    scalars."""
    if getattr(a, "ndim", 0) >= 1:
        return NamedSharding(mesh, P(AXIS, *([None] * (a.ndim - 1))))
    return NamedSharding(mesh, P())


def shard_world(state: WorldState, static: StaticScene, mesh: Mesh):
    """Place a (host or single-device) world onto the mesh, row-sharded.

    Every array whose leading axis is the body axis N is split over the
    mesh's ``entity`` axis; scalars and non-body tables (character/trigger
    slots, hierarchy levels) replicate.  Returns (state, static) as sharded
    jax Arrays.
    """
    n = state.capacity
    n_dev = mesh.devices.size
    if n % n_dev:
        raise ValueError(f"capacity {n} not divisible by {n_dev} devices")

    def place(a):
        a = jnp.asarray(a)
        if a.ndim >= 1 and a.shape[0] == n:
            return jax.device_put(a, _row_sharded_spec(a, mesh))
        return jax.device_put(a, NamedSharding(mesh, P()))

    return jax.tree.map(place, state), jax.tree.map(place, static)


def make_fully_sharded_step(static: StaticScene, mesh: Mesh,
                            solver_iterations: int = 10,
                            max_neighbors: int = 8,
                            aabb_margin: float = 0.04):
    """Jitted ``step(state, static) -> state`` over row-sharded arrays.

    ``static`` at factory time may be host-side (used only for the census
    asserts); the *call* receives the sharded static from
    :func:`shard_world`.  State buffers are donated — stepping is in-place
    per shard.
    """
    parent = np.asarray(static.parent)
    if (parent >= 0).any():
        raise ValueError(
            "fully sharded worlds require a flat hierarchy (all roots); "
            "deep scene graphs belong on the single-chip/many-world paths")
    if (np.asarray(static.char_entity) >= 0).any():
        raise ValueError("fully sharded worlds do not support characters yet")
    if (np.asarray(static.trig_entity) >= 0).any():
        raise ValueError("fully sharded worlds do not support triggers yet")

    n_dev = mesh.devices.size

    def step(state: WorldState, st: StaticScene) -> WorldState:
        n = state.capacity
        rows = n // n_dev
        dt = st.fixed_dt

        def local(pos_l, quat_l, vel_l, ang_l, alive_l, comp_l, stc):
            # stc: dict of LOCAL static columns (+ scalars)
            d = jax.lax.axis_index(AXIS)
            r0 = d * rows

            has_col = (comp_l & (COMP_COLLIDER | COMP_CHARACTER)) != 0
            dyn_l = (stc["body_type"] == BODY_DYNAMIC) & alive_l
            solid_l = alive_l & has_col

            # 1. gravity on local dynamic rows
            gvec = jnp.zeros(3, jnp.float32).at[1].set(stc["gravity"])
            vel_l = jnp.where(dyn_l[:, None], vel_l + gvec * dt, vel_l)

            # 2. transient full views for partner lookups (ICI gathers)
            gather = lambda a: jax.lax.all_gather(a, AXIS, tiled=True)
            pos_f, quat_f = gather(pos_l), gather(quat_l)
            vel_f, ang_f = gather(vel_l), gather(ang_l)
            st_l = {k: stc[k] for k in (
                "shape_type", "size", "layer", "mask", "friction",
                "restitution", "inv_mass", "inv_inertia")}
            st_l["dyn"], st_l["solid"] = dyn_l, solid_l
            st_f = {k: gather(v) for k, v in st_l.items()}

            # 3. contacts + mirrored-row Jacobi solve (shared helper)
            v_l, w_l, _, _ = local_rows_contact_solve(
                r0, rows, n,
                pos_l, quat_l, vel_l, ang_l,
                pos_f, quat_f, vel_f, ang_f,
                st_l, st_f,
                stc["ground_enabled"], dt, solver_iterations,
                max_neighbors, AXIS, aabb_margin=aabb_margin,
            )

            # 4. integrate local rows (semi-implicit Euler) + world refresh.
            # kinematic rows integrate at their set velocity exactly like the
            # dense engine (physics/step.py `moving = dynamic | kinematic`);
            # they take no impulses (dyn mask) but carry/push via the
            # gathered partner velocities.
            moving = (dyn_l | ((stc["body_type"] == BODY_KINEMATIC)
                               & alive_l))
            pos_l = jnp.where(moving[:, None], pos_l + v_l * dt, pos_l)
            quat_l = jnp.where(
                moving[:, None], math3d.quat_integrate(quat_l, w_l, dt),
                quat_l)
            v_l = jnp.where(moving[:, None], v_l, 0.0)
            w_l = jnp.where(moving[:, None], w_l, 0.0)
            world_l = math3d.mat_from_srt(stc["scale"], quat_l, pos_l)
            return pos_l, quat_l, v_l, w_l, world_l

        row = P(AXIS)
        stc_in = dict(
            shape_type=row, size=row, layer=row, mask=row, friction=row,
            restitution=row, inv_mass=row, inv_inertia=row, body_type=row,
            scale=row, gravity=P(), ground_enabled=P(),
        )
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(row, row, row, row, row, row, stc_in),
            out_specs=(row, row, row, row, row),
            check_vma=False,
        )
        stc = dict(
            shape_type=st.shape_type, size=st.shape_size, layer=st.layer,
            mask=st.mask, friction=st.friction, restitution=st.restitution,
            inv_mass=st.inv_mass, inv_inertia=st.inv_inertia_body,
            body_type=st.body_type, scale=state.scale,
            gravity=st.gravity, ground_enabled=st.ground_enabled,
        )
        pos, quat, vel, ang, world = fn(
            state.pos, state.quat, state.lin_vel, state.ang_vel,
            state.alive, state.comp_mask, stc,
        )
        return tree_replace(
            state, pos=pos, quat=quat, lin_vel=vel, ang_vel=ang, world=world,
            time=state.time + dt, step_idx=state.step_idx + 1,
        )

    return jax.jit(step, donate_argnums=(0,))
