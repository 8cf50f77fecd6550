"""Global physics facade.

Re-design of ``src/physics/PhysicsAPI.{h,cpp}``: the reference publishes a
file-static active-system pointer so any code can raycast or reach the
trigger EventBus without plumbing references (``Physics::SetActiveSystem``,
``PhysicsAPI.cpp:8-16``).  Here the facade wraps the active
(state, static, bus) triplet maintained by the Application; free functions
mirror ``Physics::Raycast`` / ``Physics::RaycastAll`` /
``Physics::GetEventBus`` (``PhysicsAPI.h:20-36``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from banggameengine_tpu.physics import raycast as rc
from banggameengine_tpu.state import COMP_CHARACTER, COMP_COLLIDER

_active = None  # the Application (or any provider of state/static/bus)


def set_active_system(app) -> None:
    """Register the provider (Application or compatible).  Pass None to
    clear (PhysicsSystem shutdown does the same, PhysicsAPI.cpp:13-16)."""
    global _active
    _active = app


def get_active_system():
    return _active


def get_event_bus():
    """Physics::GetEventBus — None when no active system."""
    return _active.bus if _active is not None else None


def _query_args():
    app = _active
    s = app.built.static
    st = app.state
    return (
        st.pos, st.quat, s.shape_type, s.shape_size, s.layer, st.alive,
        (st.comp_mask & (COMP_COLLIDER | COMP_CHARACTER)) != 0,
        s.ground_enabled,
    )


def raycast(origin, direction, max_dist: float = 1000.0,
            mask: int = 0xFFFFFFFF) -> Optional[rc.RaycastHit]:
    """Closest-hit raycast against the active world (Physics::Raycast).

    Returns None when no system is active or nothing was hit (the reference
    returns false / an empty optional).
    """
    if _active is None:
        return None
    o = jnp.asarray(origin, jnp.float32)
    d = jnp.asarray(direction, jnp.float32)
    d = d / jnp.maximum(jnp.linalg.norm(d), 1e-9)
    hit = rc.raycast_closest(
        o, d, jnp.float32(max_dist), jnp.uint32(mask), *_query_args()
    )
    if int(hit.entity) == rc.NO_HIT:
        return None
    return hit


def raycast_all(origin, direction, max_dist: float = 1000.0,
                mask: int = 0xFFFFFFFF):
    """All-hits raycast (Physics::RaycastAll): list of RaycastHit sorted by
    distance (the reference returns an unsorted vector; we sort for
    determinism)."""
    if _active is None:
        return []
    o = jnp.asarray(origin, jnp.float32)
    d = jnp.asarray(direction, jnp.float32)
    d = d / jnp.maximum(jnp.linalg.norm(d), 1e-9)
    t, hit, normal, t_g, hit_g = rc.raycast_all(
        o, d, jnp.float32(max_dist), jnp.uint32(mask), *_query_args()
    )
    import numpy as np

    t = np.asarray(t)
    hits = []
    for i in np.nonzero(np.asarray(hit))[0]:
        hits.append(
            rc.RaycastHit(
                entity=jnp.int32(i),
                point=o + d * t[i],
                normal=jnp.asarray(normal)[i],
                distance=jnp.float32(t[i]),
            )
        )
    if bool(hit_g):
        hits.append(
            rc.RaycastHit(
                entity=jnp.int32(rc.GROUND_ENTITY),
                point=o + d * float(t_g),
                normal=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
                distance=jnp.float32(float(t_g)),
            )
        )
    hits.sort(key=lambda h: float(h.distance))
    return hits
