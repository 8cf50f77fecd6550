"""Pallas TPU kernel for the per-tile one-hot attribute resolve.

The deferred shader needs, per pixel, the C-channel super-row of its
winning triangle.  Per tile the winners come from a <= KL-entry list, so
the fetch is ``onehot[px, KL] @ table[KL, C]``.  The XLA formulation must
materialize the one-hot ([tiles, px, KL] f32, ~0.7 GB at 1080p) through
HBM; this kernel builds it in VMEM per tile and contracts on the MXU,
writing only the resolved channels (planar: [C, tiles, px]) back.

Layout choices that make Mosaic happy:
- the slot plane arrives pre-flattened as [tiles, 1, px] (XLA does that
  relayout once, ~8 MB);
- the one-hot is built as [KL_pad, px] via broadcasted-iota-vs-lane-vector
  compare (no in-kernel transposes);
- the table arrives pre-transposed/padded as [tiles, C_pad, KL_pad] so the
  contraction is a single [C_pad, KL_pad] x [KL_pad, px] ``jnp.dot``;
- table pad rows are zero, so slots in [KL, KL_pad) resolve to zeros and
  slots >= KL_pad match nothing — both are overwritten by the caller's
  heavy-tile row-gather fallback (slot >= KL).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

def _kl_pad(kl: int) -> int:
    """One-hot row count (contraction dim), padded to the 128-lane tile."""
    return max(128, -(-kl // 128) * 128)


def _resolve_kernel(slot_ref, table_ref, out_ref, *, kl_pad: int):
    """One tile: build onehot [kl_pad, px] in VMEM, contract, write
    [C_pad, px]."""
    slots = slot_ref[0, 0, :]                        # i32[px] lane vector
    kl_iota = jax.lax.broadcasted_iota(
        jnp.int32, (kl_pad, slots.shape[0]), 0)
    oh = (kl_iota == slots[None, :]).astype(jnp.float32)   # [KL_PAD, px]
    out_ref[:, :] = jnp.dot(
        table_ref[0], oh, preferred_element_type=jnp.float32)


def resolve_tiles_pallas(
    slot_flat: Array,     # i32[tiles, px] winning slot per pixel (-1 bg)
    tables_t: Array,      # f32[tiles, C, KL] per-tile channel-major tables
    interpret: bool = False,
) -> Array:
    """-> resolved f32[C, tiles, px] (channel-planar)."""
    n_tiles, px = slot_flat.shape
    c = tables_t.shape[1]
    kl = tables_t.shape[2]
    c_pad = -(-c // 8) * 8
    kl_pad = _kl_pad(kl)
    tab = jnp.zeros((n_tiles, c_pad, kl_pad), jnp.float32)
    tab = tab.at[:, :c, :kl].set(tables_t)

    # output is 2-D [C_pad, tiles*px] with a (C_pad, px) block per tile —
    # Mosaic requires the last two block dims to be (8, 128)-divisible,
    # which a [C_pad, 1, px] 3-D block is not; callers reshape channel
    # rows back to [tiles, px] (a free row-major split)
    import functools

    out = pl.pallas_call(
        functools.partial(_resolve_kernel, kl_pad=kl_pad),
        out_shape=jax.ShapeDtypeStruct((c_pad, n_tiles * px), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, px), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_pad, kl_pad), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c_pad, px), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(slot_flat[:, None, :], tab)
    return out[:c].reshape(c, n_tiles, px)
