"""Pallas TPU kernel for the graph-vote compatibility stage.

The vote's hot core (laserOdometry.cpp:228-252) is, per chunk: a (K, K)
pairwise compatibility matrix over src and tgt point sets, thresholded and
row-summed into incompatibility votes.  The XLA path (ops/graphvote.py)
materializes the (R, K, K) score tensors in HBM; this kernel fuses
distance → gap → exp → threshold → row-sum entirely in VMEM, one chunk per
grid step, with the pairwise cross terms on the MXU:

    HBM traffic:  XLA ≈ R·K·K·(2 dists + scores) floats
                  Pallas = R·(2·3·K in + K out) floats

Points are passed channel-major (R, 3, K) so the K axis rides the 128-wide
lanes.  Votes are exact f32 counts, bit-compatible with the XLA path's
semantics (pair valid-mask, no self-votes).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _vote_kernel(src_ref, tgt_ref, valid_ref, votes_ref, *, threshold,
                 inv_res_sq):
    # refs: (1, 3, K), (1, 3, K), (1, K) -> (1, K)
    K = src_ref.shape[-1]

    def dists(x):  # x: (3, K) -> (K, K) Euclidean distances
        n2 = jnp.sum(x * x, axis=0, keepdims=True)  # (1, K)
        # elevated-precision MXU passes: bf16 cross terms at ~100 m
        # coordinates are worse than the compatibility kernel's length
        # scale (see ops.knn.pairwise_sq_dist).  Mosaic's dot lowering
        # only accepts DEFAULT/HIGHEST, so the package "high" tier clamps
        # to HIGHEST here — the kernel is tiny (K x K), precision is free.
        from light_loam_tpu import dist_precision

        prec = dist_precision()
        if prec == jax.lax.Precision.HIGH:
            prec = jax.lax.Precision.HIGHEST
        cross = jax.lax.dot_general(
            x, x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (K, K)
        d2 = n2 + n2.T - 2.0 * cross
        return jnp.sqrt(jnp.maximum(d2, 0.0))

    ds = dists(src_ref[0])
    dt = dists(tgt_ref[0])
    gap = ds - dt
    score = jnp.exp(-(gap * gap) * inv_res_sq)

    v = valid_ref[0, 0]  # (K,)
    pair_ok = v[:, None] * v[None, :]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    not_self = row_ids != col_ids
    incompat = (score < threshold) & (pair_ok > 0) & not_self
    votes_ref[0, 0, :] = jnp.sum(incompat.astype(jnp.float32), axis=1)


def _votes_impl(
    src: jnp.ndarray,     # (R, K, 3) chunked source points
    tgt: jnp.ndarray,     # (R, K, 3) chunked target points
    valid: jnp.ndarray,   # (R, K) validity (float or bool)
    *,
    threshold: float,
    resolution: float,
    interpret: bool,
) -> jnp.ndarray:
    R, K, _ = src.shape
    Kp = _round_up(max(K, 128), 128)
    pad = Kp - K

    src_t = jnp.moveaxis(jnp.pad(src, ((0, 0), (0, pad), (0, 0))), -1, 1)
    tgt_t = jnp.moveaxis(jnp.pad(tgt, ((0, 0), (0, pad), (0, 0))), -1, 1)
    # (R, 1, Kp): TPU block shapes need the trailing two dims to tile the
    # array exactly, so the per-chunk row gets its own unit dimension
    valid_f = jnp.pad(valid.astype(jnp.float32), ((0, 0), (0, pad)))[:, None, :]

    kernel = partial(
        _vote_kernel,
        threshold=float(threshold),
        inv_res_sq=float(1.0 / (resolution * resolution)),
    )
    votes = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, 3, Kp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Kp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Kp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Kp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 1, Kp), jnp.float32),
        interpret=interpret,
    )(src_t, tgt_t, valid_f)
    return votes[:, 0, :K]


@lru_cache(maxsize=None)
def _batched_votes_fn(threshold: float, resolution: float, interpret: bool):
    """compat-votes with a custom vmap rule.

    ``jax.vmap`` of a ``pallas_call`` lowers pathologically on TPU (the
    batch dim is pushed into every block index map), which is why the
    batched multi-sequence model historically forced the XLA vote path
    (models/batch.py).  The chunks are independent across BOTH the region
    axis R and any batch axis, so the batch rule here flattens (B, R) into
    one (B·R,)-grid launch of the SAME kernel — vmap becomes free.
    """
    impl = partial(_votes_impl, threshold=threshold,
                   resolution=resolution, interpret=interpret)

    @custom_vmap
    def fn(src, tgt, valid):
        return impl(src, tgt, valid)

    @fn.def_vmap
    def _rule(axis_size, in_batched, src, tgt, valid):
        def ensure(x, b):  # broadcast unbatched operands to the batch
            return x if b else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape)

        src, tgt, valid = (
            ensure(a, b) for a, b in zip((src, tgt, valid), in_batched)
        )
        B, R, K = valid.shape
        out = impl(src.reshape(B * R, K, 3), tgt.reshape(B * R, K, 3),
                   valid.reshape(B * R, K))
        return out.reshape(B, R, K), True

    return fn


@partial(jax.jit, static_argnames=("threshold", "resolution", "interpret"))
def compat_votes_pallas(
    src: jnp.ndarray,     # (R, K, 3) chunked source points
    tgt: jnp.ndarray,     # (R, K, 3) chunked target points
    valid: jnp.ndarray,   # (R, K) validity (float or bool)
    threshold: float = 0.96,
    resolution: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Incompatibility votes per chunked correspondence — fused Pallas
    version of the score/vote stage in ops.graphvote.simple_vote.

    Returns (R, K) float32 vote counts.  Under ``jax.vmap`` the batch
    axis is folded into the kernel grid (see ``_batched_votes_fn``), so
    this is safe to call from batched programs.
    """
    fn = _batched_votes_fn(float(threshold), float(resolution),
                           bool(interpret))
    return fn(src, tgt, valid)
