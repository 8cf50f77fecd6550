"""Isolate the cost of the binning stage's sub-steps on chip.

Round-3 numbers: the depth pipeline is 6.4 ms of which `bin` (vertex
transform + clip + setup + bin_triangles) is 4.3 ms.  Suspects: the one
global sort over tris*span_slots keys, the global-list compaction einsum,
the scatter, and the segment ops.

Usage: python scripts/profile_bin_parts.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from banggameengine_tpu.utils.profiling import measure_throughput

T = 10000            # sub-triangles (2x demo triangles)
SPAN = 16            # span slots per triangle
TILES = 510


def timeit(name, fn, *args, reps=20):
    try:
        sec = measure_throughput(fn, *args, calls=reps)
    except Exception as e:
        print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None
    print(f"{name:14s} {sec * 1e3:8.3f} ms", flush=True)
    return sec * 1e3


def main():
    rng = np.random.default_rng(0)
    m = T * SPAN
    key_np = rng.integers(0, 2 ** 30, m).astype(np.int32)
    key = jax.device_put(jnp.asarray(key_np))
    valid = jax.device_put(jnp.asarray(rng.random(T) < 0.9))
    vals = jax.device_put(jnp.asarray(rng.standard_normal(m), jnp.float32))
    pk_tile = jax.device_put(jnp.asarray(rng.integers(0, TILES, m), jnp.int32))

    @jax.jit
    def just_sort(k):
        return jnp.sort(k).sum()

    @jax.jit
    def sort_small(k):  # 4x fewer keys (span 2x2 variant)
        return jnp.sort(k[: m // 4]).sum()

    from banggameengine_tpu.physics.solver import compaction_matrix

    @jax.jit
    def global_compact(v):
        sel, gvalid, gcounts = compaction_matrix(v[None, :], 16)
        gids = jnp.einsum("omc,m->oc", sel, jnp.arange(T, dtype=jnp.float32))
        return gids.sum() + gcounts.sum()

    @jax.jit
    def seg_ops(pt, va):
        same_prev = jnp.concatenate([jnp.zeros(1, bool), pt[1:] == pt[:-1]])
        seg_start = jnp.where(~same_prev, jnp.arange(m), 0)
        seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
        rank = jnp.arange(m) - seg_start
        counts = jax.ops.segment_sum(
            jnp.ones(m, jnp.int32), pt, num_segments=TILES + 1)
        return rank.sum() + counts.sum()

    @jax.jit
    def scatter(pt, va):
        ids = jnp.full((TILES + 1, 2048), -1, jnp.int32)
        rank = jnp.arange(m) % 2048
        out = ids.at[pt, rank].set(jnp.arange(m, dtype=jnp.int32), mode="drop")
        return out.sum()

    @jax.jit
    def gather_tables(v):
        # per-tile pre-gather for the raster: [tiles, 64] ids -> 6 arrays
        ids = jnp.broadcast_to(jnp.arange(64)[None, :], (TILES, 64))
        return sum(jnp.take(v, ids + c, axis=0).sum() for c in range(6))

    timeit("sort_160k", just_sort, key)
    timeit("sort_40k", sort_small, key)
    timeit("global_16", global_compact, valid)
    timeit("seg_rank", seg_ops, pk_tile, valid)
    timeit("scatter", scatter, pk_tile, valid)
    timeit("gather_tbl", gather_tables, vals)


if __name__ == "__main__":
    main()
