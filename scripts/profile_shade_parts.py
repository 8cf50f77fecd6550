"""Microbenchmarks isolating the deferred-shade cost components on chip.

The 1080p shade (~20.4 ms round 3 start) is two big per-pixel takes plus
VPU math.  This measures each in isolation at P = 1920*1080:

  attr_take   — jnp.take(f32[28, T], idx[P], axis=1) (triangle super-row)
  texel_take  — jnp.take(u8[16, 512K], idx[P], axis=1) (texel quads)
  texel_rows  — u8[512K, 16] row-gather variant
  onehot_mm   — per-tile one-hot matmul resolve (XLA): the candidate
                replacement for attr_take ([tiles,px,K] x [tiles,K,28])
  pl_gather   — Pallas kernel doing the texel gather from a VMEM-resident
                table (support probe: may fail to lower)
  math_only   — full shade body with both gathers' results precomputed

Usage: python scripts/profile_shade_parts.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from banggameengine_tpu.utils.profiling import measure_throughput

W, H = 1920, 1080
P = W * H
T = 5000          # demo-scale triangle count
TEX = 8 * 256 * 256


def timeit(name, fn, *args, reps=20):
    try:
        sec = measure_throughput(fn, *args, calls=reps)
    except Exception as e:  # lowering failures for probe variants
        print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None
    ms = sec * 1e3
    print(f"{name:12s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    tri_rows = jnp.asarray(rng.standard_normal((28, T)), jnp.float32)
    tid = jnp.asarray(rng.integers(0, T, P), jnp.int32)
    tq = jnp.asarray(rng.integers(0, 255, (16, TEX)), jnp.uint8)
    tq_rows = jnp.asarray(np.asarray(tq).T.copy())
    tex_idx = jnp.asarray(rng.integers(0, TEX, P), jnp.int32)

    tri_rows, tid, tq, tq_rows, tex_idx = jax.device_put(
        (tri_rows, tid, tq, tq_rows, tex_idx))

    @jax.jit
    def attr_take(rows, idx):
        return jax.lax.optimization_barrier(jnp.take(rows, idx, axis=1)).sum(1)

    @jax.jit
    def texel_take(t, idx):
        q = jax.lax.optimization_barrier(jnp.take(t, idx, axis=1))
        return q.astype(jnp.float32).sum(1)

    @jax.jit
    def texel_rows(t, idx):
        q = jax.lax.optimization_barrier(jnp.take(t, idx, axis=0))
        return q.astype(jnp.float32).sum(0)

    # per-tile one-hot matmul resolve: 510 tiles x 4096 px x 80 slots
    n_tiles, px, K = 510, 4096, 80
    slot_idx = jnp.asarray(rng.integers(0, K, (n_tiles, px)), jnp.int32)
    tables = jnp.asarray(rng.standard_normal((n_tiles, K, 28)), jnp.float32)
    slot_idx, tables = jax.device_put((slot_idx, tables))

    @jax.jit
    def onehot_mm(slots, tabs):
        oh = (slots[..., None] == jnp.arange(K)[None, None, :]).astype(
            jnp.float32)
        out = jnp.einsum("tpk,tkc->tpc", oh, tabs,
                         preferred_element_type=jnp.float32)
        return out.sum((0, 2))

    # Pallas probe: texel gather from VMEM table inside the kernel
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TB = 8192  # pixels per block

    def gather_kernel(idx_ref, table_ref, out_ref):
        idx = idx_ref[:]                       # i32[TB]
        out_ref[:, :] = jnp.take(table_ref[:, :], idx, axis=0)

    @jax.jit
    def pl_gather(t_rows, idx):
        out = pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((P, 16), jnp.uint8),
            grid=(P // TB,),
            in_specs=[
                pl.BlockSpec((TB,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((TEX, 16), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, 16), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(idx, t_rows)
        return out.astype(jnp.float32).sum(0)

    timeit("attr_take", attr_take, tri_rows, tid)
    timeit("texel_take", texel_take, tq, tex_idx)
    timeit("texel_rows", texel_rows, tq_rows, tex_idx)
    timeit("onehot_mm", onehot_mm, slot_idx, tables)
    timeit("pl_gather", pl_gather, tq_rows, tex_idx)


if __name__ == "__main__":
    main()
