"""Pallas TPU broadphase: blocked all-pairs AABB -> fixed-capacity neighbor
lists, sort-free and gather-free.

Replaces the spatial-hash grid path for the 10k-body stress config (driver
config #2).  The grid path costs one 32 ms argsort plus 27-cell gathers and a
[N, 216, K] one-hot compaction (~79 ms/step at N=10k on v5e); this kernel
streams the whole [N, N] pair space through the VPU in [BI, BJ] blocks and
compacts surviving partners into per-row neighbor slots on the fly
(~2-4 ms at N=10k).  O(N^2) in work but pure dense vector math — on TPU that
beats the O(N log N) pointer-ish alternative well past 16k bodies.

The pair filter matches physics_step's grid path exactly: AABB overlap
(+margin) & both solid & layer/mask both ways & at least one dynamic &
not-self.  Bullet's role equivalent: btDbvtBroadphase pair cache
(PhysicsSystem.cpp:124).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from banggameengine_tpu.physics import shapes as sh
from banggameengine_tpu.physics.broadphase import NeighborLists

Array = jax.Array

BI = 128    # rows (bodies) per program, sublane axis
BJ = 1024   # candidate columns per inner chunk, lane axis.  Wide chunks
# amortize the per-chunk fixed cost (loads, cond machinery, the slot-select
# loop): measured at N=10k on v5e, BJ 128 -> 1024 cuts the kernel 4.1 ->
# 1.4 ms/step.  Block-bound pruning stays at BI=128 granularity (a chunk is
# scanned when ANY of its BJ/BI sub-blocks overlaps the row block).


def _neighbor_kernel(
    # per-128-block AABB bounds [nblk, 8] in SMEM (minxyz, maxxyz, pad2)
    blk,
    # row-oriented [N, 1] blocks (sublanes)
    rminx, rminy, rminz, rmaxx, rmaxy, rmaxz, rdyn, rlayer, rmask,
    # column-oriented [1, N] full rows (lanes)
    cminx, cminy, cminz, cmaxx, cmaxy, cmaxz, cdyn, clayer, cmask,
    # outputs
    nb_ref, count_ref,
    *, n: int, k: int,
):
    i = pl.program_id(0)
    row0 = i * BI

    # this row block's union AABB (scalars)
    bx0 = blk[i, 0]; by0 = blk[i, 1]; bz0 = blk[i, 2]
    bx1 = blk[i, 3]; by1 = blk[i, 4]; bz1 = blk[i, 5]

    rx0 = rminx[:, 0:1]; ry0 = rminy[:, 0:1]; rz0 = rminz[:, 0:1]
    rx1 = rmaxx[:, 0:1]; ry1 = rmaxy[:, 0:1]; rz1 = rmaxz[:, 0:1]
    rd = rdyn[:, 0:1]
    rl = rlayer[:, 0:1]
    rm = rmask[:, 0:1]

    row_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, (BI, 1), 0)

    nb0 = tuple(jnp.full((BI, 1), -1, jnp.int32) for _ in range(k))
    filled = jnp.zeros((BI, 1), jnp.int32)
    total = jnp.zeros((BI, 1), jnp.int32)

    # inclusive prefix-sum as an MXU matmul (Mosaic has no cumsum):
    # csum = ov @ T with T[m, l] = 1 iff m <= l.  bf16 is exact here
    # (integer counts <= BJ=128 < 2^8) and twice the MXU rate of f32.
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (BJ, BJ), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (BJ, BJ), 1)
    ).astype(jnp.bfloat16)

    n_chunks = n // BJ

    def chunk(c, carry):
        def scan_chunk(carry):
            nb, filled, total = carry
            sl = pl.ds(c * BJ, BJ)
            cx0 = cminx[:, sl]; cy0 = cminy[:, sl]; cz0 = cminz[:, sl]
            cx1 = cmaxx[:, sl]; cy1 = cmaxy[:, sl]; cz1 = cmaxz[:, sl]
            cd = cdyn[:, sl]
            cl = clayer[:, sl]
            cm = cmask[:, sl]

            ov = (
                (rx0 <= cx1) & (cx0 <= rx1)
                & (ry0 <= cy1) & (cy0 <= ry1)
                & (rz0 <= cz1) & (cz0 <= rz1)
            )
            # rdyn/cdyn double as the 'solid' gate: -1 = not solid,
            # 0 = solid static/kinematic, 1 = solid dynamic
            ov &= (rd >= 0) & (cd >= 0)
            ov &= (rd > 0) | (cd > 0)
            ov &= ((rl & cm) != 0) & ((cl & rm) != 0)
            col_ids = c * BJ + jax.lax.broadcasted_iota(
                jnp.int32, (1, BJ), 1)
            ov &= row_ids != col_ids

            def insert(args):
                nb, filled, total = args
                # per-row stable compaction of this chunk's survivors
                # precision pinned: bf16 x bf16 is exact for these
                # integer counts, and the engine-wide HIGHEST default
                # (banggameengine_tpu.__init__) asks Mosaic for a
                # multi-pass decomposition it cannot lower for bf16
                # operands ("Bad lhs type" at compile)
                csum = jnp.dot(ov.astype(jnp.bfloat16), tri,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT
                               ).astype(jnp.int32)
                dest = filled + csum - 1
                dest = jnp.where(ov, dest, -1)
                cnt = jnp.sum(ov.astype(jnp.int32), axis=1, keepdims=True)
                # slot-select: for each output slot s, at most one
                # candidate maps
                new = []
                for s in range(k):
                    sel = dest == s
                    val = jnp.sum(jnp.where(sel, col_ids, 0), axis=1,
                                  keepdims=True)
                    hit = jnp.any(sel, axis=1, keepdims=True)
                    new.append(jnp.where(hit, val, nb[s]))
                return tuple(new), filled + cnt, total + cnt

            # chunks with overlapping block bounds but no body overlaps
            # still skip the prefix/insert
            return jax.lax.cond(
                jnp.any(ov), insert, lambda args: args, (nb, filled, total)
            )

        # block-level pruning: skip the whole BI x BJ chunk when none of its
        # BI-body sub-block union AABBs intersects this row block's (scalar
        # SMEM tests).  With spatially sorted bodies this rejects the vast
        # majority of chunks.
        hit = jnp.zeros((), bool)
        for rr in range(BJ // BI):
            cb = c * (BJ // BI) + rr
            hit |= (
                (bx0 <= blk[cb, 3]) & (blk[cb, 0] <= bx1)
                & (by0 <= blk[cb, 4]) & (blk[cb, 1] <= by1)
                & (bz0 <= blk[cb, 5]) & (blk[cb, 2] <= bz1)
            )
        return jax.lax.cond(hit, scan_chunk, lambda x: x, carry)

    nb, filled, total = jax.lax.fori_loop(
        0, n_chunks, chunk, (nb0, filled, total)
    )
    nb_ref[:, :] = jnp.concatenate(nb, axis=1)
    count_ref[:, :] = total


def morton_key_xz(pos: Array, cell: float = 0.25) -> Array:
    """Morton (z-order) key over the horizontal plane: interleaved 16-bit
    quantized x/z.  Sorting bodies by this key makes 128-body blocks
    spatially tight, which is what the kernel's block-AABB pruning feeds on
    (ground-plane worlds spread in x/z; y adds little).

    Axes clamp to 15 bits (~8 km at the default cell) so the interleaved
    key never reaches the int32 sign bit — ``spread(zi) << 1`` with a
    16-bit zi would flip the key negative and break the argsort's spatial
    ordering (perf-only: the result stays a valid permutation)."""
    mn = jnp.min(pos, axis=0)
    xi = jnp.clip(((pos[:, 0] - mn[0]) / cell).astype(jnp.int32), 0, 0x7FFF)
    zi = jnp.clip(((pos[:, 2] - mn[2]) / cell).astype(jnp.int32), 0, 0x7FFF)

    def spread(v):
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    return spread(xi) | (spread(zi) << 1)


@functools.partial(
    jax.jit, static_argnames=("max_neighbors", "aabb_margin", "interpret")
)
def neighbor_lists_pallas(
    pos: Array,            # f32[N,3]
    quat: Array,           # f32[N,4]
    shape_type: Array,     # i8[N]
    size: Array,           # f32[N,3]
    solid: Array,          # bool[N] participates in contacts
    is_dynamic: Array,     # bool[N]
    layer: Array,          # u32[N]
    mask: Array,           # u32[N]
    max_neighbors: int = 8,
    aabb_margin: float = 0.04,
    interpret: bool = False,
) -> NeighborLists:
    """All-pairs AABB broadphase as a Pallas kernel.

    Returns the same NeighborLists contract as the grid path: idx i32[N,K]
    (-1 padded, ascending per row), valid bool[N,K], overflow counters.
    """
    mn, mx = sh.shape_aabb(pos, quat, shape_type, size)
    # -1 = not solid; 0 = solid non-dynamic; 1 = solid dynamic
    dyn = jnp.where(solid, is_dynamic.astype(jnp.int32), -1)
    return neighbor_lists_pallas_aabb(
        mn, mx, dyn, layer.astype(jnp.int32), mask.astype(jnp.int32),
        max_neighbors=max_neighbors, aabb_margin=aabb_margin,
        interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("max_neighbors", "aabb_margin", "interpret")
)
def neighbor_lists_pallas_aabb(
    mn: Array,             # f32[N,3] AABB min (no margin applied yet)
    mx: Array,             # f32[N,3] AABB max
    dyn: Array,            # i32[N]: -1 not solid, 0 solid static, 1 dynamic
    layer_i: Array,        # i32[N]
    mask_i: Array,         # i32[N]
    max_neighbors: int = 8,
    aabb_margin: float = 0.04,
    interpret: bool = False,
) -> NeighborLists:
    """AABB-level entry: callers that already hold (possibly re-ordered)
    AABBs skip the shape pass.  Indices in the result refer to the order of
    the inputs."""
    n = mn.shape[0]
    pad = (-n) % BJ
    mn = mn - 0.5 * aabb_margin
    mx = mx + 0.5 * aabb_margin

    def prep(a, fill):
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)]
            )
        return a

    comps = []
    for axis in range(3):
        comps.append(prep(mn[:, axis], 1e30))
    for axis in range(3):
        comps.append(prep(mx[:, axis], -1e30))
    comps.append(prep(dyn, -1))
    comps.append(prep(layer_i, 0))
    comps.append(prep(mask_i, 0))

    npad = n + pad
    rows = [c.reshape(npad, 1) for c in comps]       # sublane orientation
    cols = [c.reshape(1, npad) for c in comps]       # lane orientation

    assert BJ % BI == 0, "chunk width must be a multiple of the row block"
    nblk = npad // BI
    # union AABB per 128-body block (pad rows are inverted-infinite and
    # never extend a block, so all-pad blocks are skipped by every test)
    blk = jnp.stack(
        [comps[0].reshape(nblk, BI).min(1),
         comps[1].reshape(nblk, BI).min(1),
         comps[2].reshape(nblk, BI).min(1),
         comps[3].reshape(nblk, BI).max(1),
         comps[4].reshape(nblk, BI).max(1),
         comps[5].reshape(nblk, BI).max(1),
         jnp.zeros(nblk, jnp.float32), jnp.zeros(nblk, jnp.float32)],
        axis=1,
    )

    grid = (npad // BI,)
    blk_spec = pl.BlockSpec(
        (nblk, 8), lambda i: (0, 0), memory_space=pltpu.SMEM
    )
    row_spec = [
        pl.BlockSpec((BI, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in rows
    ]
    col_spec = [
        pl.BlockSpec((1, npad), lambda i: (0, 0), memory_space=pltpu.VMEM)
        for _ in cols
    ]
    k = max_neighbors
    nb, counts = pl.pallas_call(
        functools.partial(_neighbor_kernel, n=npad, k=k),
        grid=grid,
        in_specs=[blk_spec] + row_spec + col_spec,
        out_specs=(
            pl.BlockSpec((BI, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BI, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npad, k), jnp.int32),
            jax.ShapeDtypeStruct((npad, 1), jnp.int32),
        ),
        interpret=interpret,
    )(blk, *rows, *cols)

    nb = nb[:n]
    counts = counts[:n, 0]
    valid = nb >= 0
    # partners beyond the k budget were dropped
    overflow = jnp.sum(jnp.maximum(counts - k, 0)).astype(jnp.int32)
    return NeighborLists(idx=nb, valid=valid,
                         cell_overflow=jnp.int32(0), nbr_overflow=overflow)
