"""Pallas TPU kernel for the per-tile one-hot attribute resolve.

The deferred shader needs, per pixel, the C-channel super-row of its
winning triangle.  Per tile the winners come from a <= KL-entry list, so
the fetch is ``onehot[px, KL] @ table[KL, C]``.  The XLA formulation must
materialize the one-hot ([tiles, px, KL], ~0.27 GB in bf16 at 1080p)
through HBM AND split the [t, C, px] dot output into per-channel planes
(another ~3.7 ms of relayout fusions — XLA folds a [C, t, px] transpose
into a layout relabel, leaving channels lane-padded minor).  This kernel
builds the one-hot in VMEM per tile, contracts on the MXU, and writes the
resolved channels **directly channel-major** ([C_pad, tiles*px] — each
channel row IS a contiguous plane), so neither the one-hot nor any
relayout ever touches HBM.

Layout/shape choices that make Mosaic happy:
- ``tiles_blk`` tiles per grid program (default 10): the round-4 kernel
  ran one PROGRAM per tile — 510 programs whose per-program DMA/launch
  overhead dominated (~5.8 ms measured vs ~1.5 ms ideal);
- the one-hot is built as [KL_pad, px] via broadcasted-iota-vs-lane-vector
  compare (no in-kernel transposes);
- the table arrives pre-transposed/padded as [tiles, C_pad, KL_pad] so the
  contraction is a single [C_pad, KL_pad] x [KL_pad, px] ``jnp.dot``
  with ``precision=HIGHEST`` (payload rows must come through f32-EXACT —
  the engine-wide bf16-rounding rule, see ``banggameengine_tpu.__init__``);
- table pad rows are zero, so slots in [KL, KL_pad) resolve to zeros and
  slots >= KL_pad match nothing — both are overwritten by the caller's
  fallback handling;
- the output is 2-D [C_pad, tiles*px] with a (C_pad, blk*px) block per
  program — Mosaic requires the last two block dims (8, 128)-divisible,
  which a [C_pad, 1, px] 3-D block is not; callers reshape channel rows
  back to [tiles, px] (a free row-major split).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kl_pad(kl: int) -> int:
    """One-hot row count (contraction dim), padded to the 128-lane tile."""
    return max(128, -(-kl // 128) * 128)


def _resolve_kernel(slot_ref, table_ref, out_ref, *, kl_pad: int,
                    tiles_blk: int, px: int):
    """One block of tiles: per tile, build onehot chunks [128, px] in
    VMEM, contract, accumulate, write [C_pad, px] into the block's column
    range.  Chunking the contraction dim keeps the live one-hot at 2 MB
    regardless of KL (the heavy-tile call runs KL_pad = 384)."""
    for b in range(tiles_blk):                       # static unroll
        slots = slot_ref[b, :]                       # i32[px] lane vector
        acc = None
        for lo in range(0, kl_pad, 128):
            kl_iota = lo + jax.lax.broadcasted_iota(jnp.int32, (128, px), 0)
            oh = (kl_iota == slots[None, :]).astype(jnp.float32)  # [128, px]
            part = jnp.dot(
                table_ref[b, :, lo:lo + 128], oh,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            acc = part if acc is None else acc + part
        out_ref[:, b * px:(b + 1) * px] = acc


def resolve_tiles_pallas(
    slot_flat: Array,     # i32[tiles, px] winning slot per pixel (-1 bg)
    tables_t: Array,      # f32[tiles, C, KL] per-tile channel-major tables
    interpret: bool = False,
    tiles_blk: int = 8,
) -> Array:
    """-> resolved f32[C, tiles, px] (channel-planar)."""
    n_tiles, px = slot_flat.shape
    c = tables_t.shape[1]
    kl = tables_t.shape[2]
    c_pad = -(-c // 8) * 8
    kl_pad = _kl_pad(kl)
    blk = min(tiles_blk, n_tiles)
    n_blocks = -(-n_tiles // blk)
    t_pad = n_blocks * blk
    tab = jnp.zeros((t_pad, c_pad, kl_pad), jnp.float32)
    tab = tab.at[:n_tiles, :c, :kl].set(tables_t)
    slot_p = slot_flat
    if t_pad != n_tiles:
        slot_p = jnp.pad(slot_flat, ((0, t_pad - n_tiles), (0, 0)),
                         constant_values=-1)

    out = pl.pallas_call(
        functools.partial(_resolve_kernel, kl_pad=kl_pad, tiles_blk=blk,
                          px=px),
        out_shape=jax.ShapeDtypeStruct((c_pad, t_pad * px), jnp.float32),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((blk, px), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, c_pad, kl_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c_pad, blk * px), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        # the double-buffered (C_pad, blk*px) out block plus the unrolled
        # one-hot temporaries overflow the default 16 MB scoped-vmem limit
        # on the KL_pad=384 heavy call (measured 17.91 MB); v5e has 128 MB
        # of VMEM per core, so raise the scope rather than shrink the block
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(slot_p, tab)
    return out[:c].reshape(c, t_pad, px)[:, :n_tiles]


def _resolve_wide_kernel(max_slot_ref, slot_ref, table_ref, out_ref, *,
                         kl_pad: int, tiles_blk: int, px: int):
    """One block of tiles, heavy-width table, per-tile chunk skipping.

    Per tile: chunk 0 of the one-hot contraction always runs (every tile's
    light-list winners live there); chunks >= 1 run under a ``lax.cond``
    on the tile's pre-reduced max winning slot (scalar-prefetch, SMEM) —
    only the few heavy-pass tiles pay the wide contraction.  The block's
    [C_pad, blk, px] result assembles in VMEM registers and writes once.
    """
    blk_i = pl.program_id(0)
    cols = []
    for b in range(tiles_blk):                       # static unroll
        slots = slot_ref[b, :]                       # i32[px] lane vector
        ms = max_slot_ref[blk_i * tiles_blk + b]     # SMEM scalar

        def base_chunk(_, slots=slots, b=b):
            kl_iota = jax.lax.broadcasted_iota(jnp.int32, (128, px), 0)
            oh = (kl_iota == slots[None, :]).astype(jnp.float32)
            return jnp.dot(table_ref[b, :, 0:128], oh,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

        # all-background tiles (max slot < 0: the sky) skip even the base
        # chunk — the shade replaces background pixels with the clear
        # color, so their resolved rows are never read (zeros match the
        # no-pixel-matches one-hot result bit-exactly anyway)
        acc = jax.lax.cond(
            ms >= 0, base_chunk,
            lambda _: jnp.zeros((table_ref.shape[1], px), jnp.float32),
            0)
        for lo in range(128, kl_pad, 128):
            def wide_chunk(acc, lo=lo, slots=slots, b=b):
                kli = lo + jax.lax.broadcasted_iota(
                    jnp.int32, (128, px), 0)
                ohc = (kli == slots[None, :]).astype(jnp.float32)
                return acc + jnp.dot(
                    table_ref[b, :, lo:lo + 128], ohc,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)

            acc = jax.lax.cond(ms >= lo, wide_chunk, lambda a: a, acc)
        cols.append(acc)
    out_ref[...] = jnp.stack(cols, axis=1)           # [C_pad, blk, px]


def resolve_tiles_pallas_wide(
    slot_flat: Array,     # i32[tiles, px] winning slot per pixel (-1 bg)
    tables_t: Array,      # f32[tiles, C, KL] per-tile channel-major tables
    max_slot: Array,      # i32[tiles] per-tile max winning slot
    interpret: bool = False,
    tiles_blk: int = 8,
) -> Array:
    """Unified light+heavy resolve -> f32[C, tiles, px] channel planes.

    Replaces the (light resolve, heavy resolve, one-hot merge, fallback
    cond) four-step with ONE kernel: KL covers the heavy raster walk, and
    per-tile chunk predication keeps the cost at light width for the ~90%
    of tiles whose winners all sit in the light list.  The 3-D
    [C_pad, t_pad, px] output makes each channel plane a contiguous
    leading-dim slice — no relayout copy downstream (the 2-D form's
    plane split copied ~335 MB/frame, ~1 ms measured)."""
    n_tiles, px = slot_flat.shape
    c = tables_t.shape[1]
    kl = tables_t.shape[2]
    c_pad = -(-c // 8) * 8
    kl_pad = _kl_pad(kl)
    blk = min(tiles_blk, n_tiles)
    n_blocks = -(-n_tiles // blk)
    t_pad = n_blocks * blk
    tab = jnp.zeros((t_pad, c_pad, kl_pad), jnp.float32)
    tab = tab.at[:n_tiles, :c, :kl].set(tables_t)
    slot_p = slot_flat
    ms_p = max_slot.astype(jnp.int32)
    if t_pad != n_tiles:
        slot_p = jnp.pad(slot_flat, ((0, t_pad - n_tiles), (0, 0)),
                         constant_values=-1)
        ms_p = jnp.pad(ms_p, (0, t_pad - n_tiles), constant_values=-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((blk, px), lambda i, ms: (i, 0)),
            pl.BlockSpec((blk, c_pad, kl_pad), lambda i, ms: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((c_pad, blk, px), lambda i, ms: (0, i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_resolve_wide_kernel, kl_pad=kl_pad,
                          tiles_blk=blk, px=px),
        out_shape=jax.ShapeDtypeStruct((c_pad, t_pad, px), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(ms_p, slot_p, tab)
    return out[:c, :n_tiles]
