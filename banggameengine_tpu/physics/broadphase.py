"""Broadphase collision pruning.

Replaces Bullet's DBVT broadphase (``btDbvtBroadphase`` at
``PhysicsSystem.cpp:124``) with two TPU-shaped strategies:

- **dense all-pairs** (implicit in :func:`narrowphase.pair_contacts_dense`)
  for small worlds (N <= a few hundred) — O(N^2) but pure VPU work with
  reduction-only accumulation, the right trade at demo scale;
- **uniform spatial hash grid + fixed-capacity neighbor lists** (this
  module) for large worlds (10k-body stress, driver config #2): bodies are
  hashed by cell, a ``[table, cell_capacity]`` cell list is built with one
  sort + one scatter, and each body gathers candidates from its 27-cell
  neighborhood, AABB-filtered and compacted to a ``[N, max_neighbors]``
  list.  The solver then accumulates per-body impulses by **row reduction**
  (each unordered pair appears in both rows, mirrored), keeping scatters out
  of the iteration loop.

Capacity overflows (cell or neighbor list) are counted and returned so
callers can surface dropped-pair diagnostics instead of silently missing
collisions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from banggameengine_tpu.physics import shapes as sh

Array = jax.Array

# large primes for 3D spatial hashing
_P1, _P2, _P3 = 73856093, 19349663, 83492791


class NeighborLists(NamedTuple):
    idx: Array        # i32[N, K] neighbor body ids, -1 padded
    valid: Array      # bool[N, K]
    cell_overflow: Array   # i32[] bodies dropped from full cells
    nbr_overflow: Array    # i32[] candidate pairs dropped from full rows


def _cell_coords(pos: Array, cell_size) -> Array:
    return jnp.floor(pos / cell_size).astype(jnp.int32)


def _hash_coords(c: Array, table_size: int) -> Array:
    h = (c[..., 0] * _P1) ^ (c[..., 1] * _P2) ^ (c[..., 2] * _P3)
    return jnp.mod(h, table_size)


def build_neighbor_lists_dense(
    pos: Array,
    quat: Array,
    shape_type: Array,
    size: Array,
    pair_mask: Array,      # bool[N,N] extra validity (layers, dynamics, ...)
    max_neighbors: int = 8,
    aabb_margin: float = 0.04,
) -> NeighborLists:
    """All-pairs AABB broadphase compacted to fixed neighbor lists.

    For small worlds: the [N,N] boolean AABB matrix is cheap, and pruning
    partners *before* narrowphase keeps the expensive manifold math (and its
    [..., 3]-shaped temporaries) on ~K instead of N partners per body.
    """
    n = pos.shape[0]
    mn, mx = sh.shape_aabb(pos, quat, shape_type, size)
    ov = sh.aabb_overlap(mn[:, None], mx[:, None], mn[None, :], mx[None, :],
                         margin=aabb_margin)
    ov &= pair_mask
    # XLA folds ~eye into a pred[N,N] literal baked in the executable;
    # small baked literals are fine — unlike CAPTURED device arrays, they
    # are not re-fetched from the host per dispatch (the step runs at
    # 3.2 ms/dispatch with one embedded; see scripts/find_constants.py)
    ov &= ~jnp.eye(n, dtype=bool)

    # sort-free stable compaction (cumsum destinations + one-hot matmul)
    from banggameengine_tpu.physics.solver import compaction_matrix

    sel, valid, counts = compaction_matrix(ov, max_neighbors)
    ids_f = jnp.einsum(
        "nmc,m->nc", sel, jnp.arange(n, dtype=jnp.float32)
    )
    idx = jnp.where(valid, ids_f.astype(jnp.int32), -1)
    overflow = jnp.sum(jnp.maximum(counts - max_neighbors, 0)).astype(jnp.int32)
    return NeighborLists(idx=idx, valid=valid,
                         cell_overflow=jnp.int32(0), nbr_overflow=overflow)


def build_neighbor_lists(
    pos: Array,            # f32[N,3]
    quat: Array,
    shape_type: Array,
    size: Array,
    active: Array,         # bool[N] participate in broadphase
    cell_size: float,
    table_size: int = 4096,
    cell_capacity: int = 8,
    max_neighbors: int = 16,
    aabb_margin: float = 0.04,
) -> NeighborLists:
    """Build fixed-capacity symmetric neighbor lists.

    ``cell_size`` should be >= the largest dynamic body diameter so a body's
    collision partners always lie in the 27-cell neighborhood.
    """
    n = pos.shape[0]
    cells = _cell_coords(pos, cell_size)               # [N,3]
    hashes = jnp.where(active, _hash_coords(cells, table_size), table_size)

    # cell list: sort bodies by hash, rank within each run, scatter
    order = jnp.argsort(hashes)                        # stable
    sorted_h = hashes[order]
    same_prev = jnp.concatenate(
        [jnp.zeros(1, bool), sorted_h[1:] == sorted_h[:-1]]
    )
    # rank of each sorted element within its hash run
    seg_start = jnp.where(~same_prev, jnp.arange(n), 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank = jnp.arange(n) - seg_start

    table = jnp.full((table_size + 1, cell_capacity), -1, jnp.int32)
    ok = (rank < cell_capacity) & (sorted_h < table_size)
    scatter_h = jnp.where(ok, sorted_h, table_size)
    scatter_r = jnp.where(ok, rank, 0)
    table = table.at[scatter_h, scatter_r].set(
        jnp.where(ok, order.astype(jnp.int32), -1), mode="drop"
    )
    table = table.at[table_size].set(-1)               # dump row stays empty
    cell_overflow = jnp.sum(
        jnp.where(sorted_h < table_size, jnp.maximum(rank - cell_capacity + 1, 0) > 0, False)
    ).astype(jnp.int32)

    # candidate gathering from the 27-cell neighborhood
    offs = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2),
            indexing="ij",
        ),
        axis=-1,
    ).reshape(27, 3)
    nbr_cells = cells[:, None, :] + offs[None, :, :]    # [N,27,3]
    nbr_hash = _hash_coords(nbr_cells, table_size)      # [N,27]
    cand = table[nbr_hash]                              # [N,27,cap]

    safe_cand = jnp.maximum(cand, 0)
    cand_cells = cells[safe_cand]                       # [N,27,cap,3]
    # a candidate is genuine iff it sits exactly in the probed neighbor cell
    # (kills hash-collision ghosts AND duplicate appearances)
    cell_match = jnp.all(cand_cells == nbr_cells[:, :, None, :], axis=-1)
    cand_ok = (cand >= 0) & cell_match
    cand_ok &= cand != jnp.arange(n)[:, None, None]     # no self
    cand_ok &= active[safe_cand] & active[:, None, None]

    # AABB filter
    mn, mx = sh.shape_aabb(pos, quat, shape_type, size)
    overlap = sh.aabb_overlap(
        mn[:, None, None], mx[:, None, None],
        mn[safe_cand], mx[safe_cand], margin=aabb_margin,
    )
    cand_ok &= overlap

    # compact to max_neighbors (sort-free cumsum + one-hot contraction)
    from banggameengine_tpu.physics.solver import compaction_matrix

    flat_ok = cand_ok.reshape(n, -1)
    flat_id = cand.reshape(n, -1)
    selm, valid, counts = compaction_matrix(flat_ok, max_neighbors)
    idx_f = jnp.einsum("nmc,nm->nc", selm, flat_id.astype(jnp.float32))
    idx = jnp.where(valid, idx_f.astype(jnp.int32), -1)
    nbr_overflow = jnp.sum(jnp.maximum(counts - max_neighbors, 0)).astype(jnp.int32)

    return NeighborLists(idx=idx, valid=valid,
                         cell_overflow=cell_overflow,
                         nbr_overflow=nbr_overflow)
