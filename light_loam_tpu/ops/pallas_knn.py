"""Pallas TPU kernel for streamed k-NN: fused distance + running top-k.

The mapping stage's 5-NN queries (ops/knn.knn_tiled — the TPU replacement
for nearestKSearch(5), laserMapping.cpp:1882,1948) are the scan-to-map
hot loop: per outer iteration, Q stack points search N local-map points.
The XLA path materializes every (Q, tile) distance block plus two
``lax.top_k`` sorts per tile through HBM; this kernel keeps each
distance block in VMEM and maintains the running (Q, k) best set with
k masked-argmin extraction passes — HBM traffic drops from
O(Q·N·passes) floats to O(3·(Q+N) in + 2·Q·k out).

Count-aware tile skipping: both operand buffers are fixed-capacity with
live prefixes (the local map comes from _gather_local, the query stack
from voxel_downsample — both compact live entries to the front), and the
kernel's cost is VPU-bound on the per-tile top-k passes, so it takes
optional ``query_count``/``ref_count`` scalars and (a) runs the
reference loop only over ceil(ref_count/tile) tiles, (b) skips query
blocks past query_count outright (their outputs are written as
+BIG/0, which downstream masks/gates already treat as "no neighbour").
Exact by construction: a skipped tile/block contains only masked
entries, which could never win a top-k slot anyway.  Measured
(PROFILE_r04.json): the surf 5-NN ran 11.7 ms per outer iteration over
the 65k-capacity local buffer holding 10.6k live points — cost scales
with capacity, not content, without the skip.

Layout: points ride channel-major (3, ·) so the point axis fills the
128-wide lanes and the cross term is one MXU ``dot_general`` per tile.
Results are exactly knn_tiled's (ascending distances, first-index
tie-break within a tile; tiles visited in order).

Like ops/pallas_vote.py, the kernel carries a custom vmap rule: the
batch axis folds into the kernel grid (each lane has its OWN reference
cloud — a (B, Q·) grid), so batched programs keep the fused path.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _select_k(d, idx, k):
    """k ascending (value, index) pairs from (QB, M) columns by masked
    argmin passes — gather-free (take_along_axis does not lower in
    Mosaic; the select-and-sum is an elementwise reduction)."""
    QB, M = d.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (QB, M), 1)
    vals, idxs = [], []
    for _ in range(k):
        j = jnp.argmin(d, axis=1).astype(jnp.int32)
        vals.append(jnp.min(d, axis=1))
        hit = col == j[:, None]
        idxs.append(jnp.sum(jnp.where(hit, idx, 0), axis=1))
        d = jnp.where(hit, _BIG, d)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)  # (QB, k) ×2


def _knn_kernel(cnt_ref, q_ref, r_ref, m_ref, out_d_ref, out_i_ref, *,
                k, tile, n_tiles, out_pad, q_block):
    # refs: cnt (B, 2) SMEM [query_count, ref_count] — the FULL array
    #       (Mosaic's block rule rejects a (1, 2) block over (B, 2) for
    #       B > 1: sublane dim must divide 8 or equal the array's), so
    #       the kernel picks its lane's row by grid position instead
    #       q (1, 3, QB), r (1, 3, Np), m (1, 1, Np)
    #       out (1, QB, out_pad) f32 / i32
    lane = pl.program_id(0)
    q_count = cnt_ref[lane, 0]
    r_count = cnt_ref[lane, 1]
    block_live = pl.program_id(1) * q_block < q_count

    @pl.when(jnp.logical_not(block_live))
    def _dead_block():
        out_d_ref[0] = jnp.full(out_d_ref.shape[1:], _BIG, jnp.float32)
        out_i_ref[0] = jnp.zeros(out_i_ref.shape[1:], jnp.int32)

    @pl.when(block_live)
    def _live_block():
        q = q_ref[0]                         # (3, QB)
        QB = q.shape[1]
        q2 = jnp.sum(q * q, axis=0)          # (QB,)

        # elevated-precision MXU cross terms (see ops/knn.pairwise_sq_dist:
        # bf16 rounding at ~100 m coordinates exceeds the 1 m² gates);
        # Mosaic's dot lowering accepts DEFAULT/HIGHEST only, so the
        # package "high" tier clamps to HIGHEST — the contraction dim is
        # 3, the MXU cost is negligible either way.
        from light_loam_tpu import dist_precision

        prec = dist_precision()
        if prec == jax.lax.Precision.HIGH:
            prec = jax.lax.Precision.HIGHEST

        def body(t, carry):
            best_d, best_i = carry           # (QB, k) f32 / i32
            r = r_ref[0, :, pl.ds(t * tile, tile)]    # (3, T)
            m = m_ref[0, 0, pl.ds(t * tile, tile)]    # (T,)
            r2 = jnp.sum(r * r, axis=0)                # (T,)
            cross = jax.lax.dot_general(
                q, r, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )                                          # (QB, T)
            d = jnp.maximum(q2[:, None] + r2[None, :] - 2.0 * cross, 0.0)
            d = jnp.where(m[None, :] > 0, d, _BIG)

            def extract(_):
                gcol = (jax.lax.broadcasted_iota(jnp.int32, (QB, tile), 1)
                        + t * tile)
                cd, ci = _select_k(d, gcol, k)         # tile's k best
                # merge running ∪ tile candidates → new running top-k.
                # Ties resolve to the running side (earlier tile),
                # matching knn_tiled's strict-< update order.
                md = jnp.concatenate([best_d, cd], axis=1)  # (QB, 2k)
                mi = jnp.concatenate([best_i, ci], axis=1)
                return _select_k(md, mi, k)

            # Spatial prune: extraction (k argmin passes over the block
            # — the kernel's VPU cost) runs only if some row could still
            # improve.  Both operands are cell/voxel-key-sorted, so a
            # 256-query block and a 2048-point tile are usually far
            # apart and min(d) >= kth-best for every row.  Exact: an
            # element with d == kth loses the merge tie to the running
            # side anyway, so >= can never drop a winner.
            need = jnp.any(jnp.min(d, axis=1) < best_d[:, k - 1])
            return jax.lax.cond(
                need, extract, lambda _: (best_d, best_i), None)

        init = (jnp.full((QB, k), _BIG, jnp.float32),
                jnp.zeros((QB, k), jnp.int32))
        # live tiles only: entries past ref_count are all masked (live
        # prefix), so their tiles cannot contribute a top-k slot
        n_live = jnp.minimum(
            (r_count + (tile - 1)) // tile, jnp.int32(n_tiles)
        )
        best_d, best_i = jax.lax.fori_loop(0, n_live, body, init)
        out_d_ref[0] = jnp.pad(best_d, ((0, 0), (0, out_pad - k)),
                               constant_values=_BIG)
        out_i_ref[0] = jnp.pad(best_i, ((0, 0), (0, out_pad - k)))


def _knn_impl(
    query: jnp.ndarray,   # (B, Q, 3)
    ref: jnp.ndarray,     # (B, N, 3)
    mask: jnp.ndarray,    # (B, N) bool/float
    counts: jnp.ndarray,  # (B, 2) int32 [query_count, ref_count]
    *,
    k: int,
    q_block: int,
    tile: int,
    interpret: bool,
):
    B, Q, _ = query.shape
    N = ref.shape[1]
    Qp = _round_up(max(Q, q_block), q_block)
    Np = _round_up(max(N, tile), tile)
    n_tiles = Np // tile
    out_pad = 128  # minimum f32 lane tile; sliced to k by the caller

    qT = jnp.moveaxis(jnp.pad(query, ((0, 0), (0, Qp - Q), (0, 0))), -1, 1)
    rT = jnp.moveaxis(jnp.pad(ref, ((0, 0), (0, Np - N), (0, 0))), -1, 1)
    mF = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, Np - N)))[:, None, :]

    kernel = partial(_knn_kernel, k=k, tile=tile, n_tiles=n_tiles,
                     out_pad=out_pad, q_block=q_block)
    grid = (B, Qp // q_block)
    d, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 2), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, q_block), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            # full reference per lane; constant index across the Q-block
            # axis so it is fetched once per lane, not per block
            pl.BlockSpec((1, 3, Np), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, q_block, out_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block, out_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Qp, out_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, Qp, out_pad), jnp.int32),
        ],
        interpret=interpret,
    )(counts, qT, rT, mF)
    return d[:, :Q, :k], idx[:, :Q, :k]


@lru_cache(maxsize=None)
def _knn_fn(k: int, q_block: int, tile: int, interpret: bool):
    impl = partial(_knn_impl, k=k, q_block=q_block, tile=tile,
                   interpret=interpret)

    @custom_vmap
    def fn(query, ref, mask, counts):
        d, i = impl(query[None], ref[None], mask[None], counts[None])
        return d[0], i[0]

    @fn.def_vmap
    def _rule(axis_size, in_batched, query, ref, mask, counts):
        def ensure(x, b):
            return x if b else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape)

        query, ref, mask, counts = (
            ensure(a, b)
            for a, b in zip((query, ref, mask, counts), in_batched)
        )
        d, i = impl(query, ref, mask, counts)
        return (d, i), (True, True)

    return fn


@partial(jax.jit, static_argnames=("k", "q_block", "tile", "interpret"))
def knn_pallas(
    query_xyz: jnp.ndarray,  # (Q, 3)
    ref_xyz: jnp.ndarray,    # (N, 3)
    ref_mask: jnp.ndarray,   # (N,)
    k: int,
    q_block: int = 256,
    tile: int = 2048,
    interpret: bool = False,
    query_count=None,
    ref_count=None,
):
    """Drop-in for ops.knn.knn_tiled: (sq_dists (Q,k) ascending,
    indices (Q,k)), distance blocks kept in VMEM.  Under ``jax.vmap``
    the batch axis folds into the kernel grid.

    ``query_count``/``ref_count`` (dynamic scalars) assert that entries
    at index >= count are masked (live-prefix buffers); the kernel then
    skips dead query blocks and dead reference tiles.  Outputs for
    skipped query rows are (+BIG, 0) — identical to what an all-masked
    search returns.  Omit them (None) for buffers without the prefix
    guarantee."""
    Q = query_xyz.shape[0]
    N = ref_xyz.shape[0]
    qc = jnp.asarray(Q if query_count is None else query_count, jnp.int32)
    rc = jnp.asarray(N if ref_count is None else ref_count, jnp.int32)
    counts = jnp.stack([qc, rc]).reshape(2)
    fn = _knn_fn(int(k), int(q_block), int(tile), bool(interpret))
    return fn(query_xyz, ref_xyz, ref_mask, counts)
