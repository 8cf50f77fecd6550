"""Many-world data parallelism: vmap over worlds, shard over the device mesh.

The reference is a single-threaded single-world loop
(``Application.cpp:78-148``); the TPU build's scaling axis is **worlds**
(SURVEY.md §2 "Parallelism & distributed communication"): ``jax.vmap`` turns
the engine step into a lockstep many-world simulator, and a 1-D
``jax.sharding.Mesh`` over the world axis distributes it across a v5e-8
slice.  Worlds are embarrassingly parallel — the compiled step contains **no
cross-chip collectives**; XLA only inserts them for the optional metric
reductions (``psum``-style means over the world axis), which ride the ICI.

This file is the framework's entire distributed-communication story — the
idiomatic TPU replacement for the NCCL/MPI layer a GPU engine would carry.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from banggameengine_tpu.engine import engine_step
from banggameengine_tpu.state import InputFrame, StaticScene, WorldState

WORLD_AXIS = "world"


def make_world_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices, axis name 'world'."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (WORLD_AXIS,))


def replicate_state(state: WorldState, num_worlds: int) -> WorldState:
    """Stack one world into a [W, ...] batch."""
    return jax.tree.map(lambda x: jnp.stack([x] * num_worlds), state)


def replicate_input(inp: InputFrame, num_worlds: int) -> InputFrame:
    return jax.tree.map(lambda x: jnp.stack([x] * num_worlds), inp)


def shard_batched(tree, mesh: Mesh):
    """Place a [W, ...]-batched pytree with the leading axis sharded over the
    world mesh axis."""

    def put(x):
        spec = P(WORLD_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def world_metrics(state: WorldState) -> dict:
    """Per-world scalar diagnostics, reduced across worlds by the caller.
    Computed inside the sharded step so the mean is an XLA collective over
    ICI (the engine-domain analog of a ``psum`` loss reduction)."""
    ke = 0.5 * jnp.sum(state.lin_vel**2, axis=(-2, -1))
    return {
        "mean_kinetic_energy": ke,
        "mean_height": jnp.sum(state.pos[..., 1] * state.alive, axis=-1)
        / jnp.maximum(jnp.sum(state.alive, axis=-1), 1),
    }


def make_sharded_many_world_step(
    static: StaticScene,
    mesh: Optional[Mesh] = None,
    num_steps: int = 1,
    solver_iterations: int = 10,
    with_metrics: bool = False,
    **physics_kwargs,
):
    """Build the jitted sharded lockstep-many-worlds step.

    Returns ``step(batched_state, batched_input) -> batched_state`` (or
    ``(state, metrics)`` with ``with_metrics``); state arrays must carry a
    leading world axis, which is sharded across the mesh.  ``num_steps > 1``
    folds a ``lax.scan`` inside the single dispatch (driver config #5:
    1k worlds stepped in lockstep).
    """
    mesh = mesh or make_world_mesh()

    from banggameengine_tpu.physics.step import scene_census

    kwargs = {**scene_census(static), **physics_kwargs}
    vstep = jax.vmap(
        lambda s, i, st: engine_step(s, i, st, solver_iterations,
                                     **kwargs)[0],
        in_axes=(0, 0, None),
    )

    def run(bstate, binp, st):
        if num_steps == 1:
            out = vstep(bstate, binp, st)
        else:
            def body(carry, _):
                return vstep(carry, binp, st), None

            out, _ = jax.lax.scan(body, bstate, None, length=num_steps,
                                  unroll=2)
        if with_metrics:
            m = world_metrics(out)
            metrics = {k: jnp.mean(v) for k, v in m.items()}  # ICI reduce
            return out, metrics
        return out

    # jit infers output shardings from the (already device_put) inputs;
    # donation keeps stepping in-place per shard.  The static scene is a
    # traced argument (replicated): captured constants cost a flat host
    # round-trip per dispatch on tunneled runtimes.
    jfn = jax.jit(run, donate_argnums=(0,))
    static = jax.device_put(static)
    step = lambda bstate, binp: jfn(bstate, binp, static)
    step.jitted, step.bound_static = jfn, static   # for roofline/AOT tools
    return step
