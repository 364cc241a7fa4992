"""Pallas vote kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from light_loam_tpu.ops.graphvote import _compat_scores
from light_loam_tpu.ops.pallas_vote import compat_votes_pallas


def xla_votes(src, tgt, valid, threshold=0.96, resolution=1.0):
    K = src.shape[1]
    scores = _compat_scores(src, tgt, resolution)
    eye = jnp.eye(K, dtype=bool)[None]
    pair_ok = (valid[:, :, None] * valid[:, None, :]) > 0
    incompat = (scores < threshold) & pair_ok & ~eye
    return jnp.sum(incompat.astype(jnp.float32), axis=-1)


def test_pallas_votes_match_xla():
    rng = np.random.default_rng(0)
    R, K = 4, 96
    src = rng.uniform(-20, 20, (R, K, 3)).astype(np.float32)
    tgt = src + 0.3
    bad = rng.random((R, K)) < 0.25
    tgt = tgt + np.where(bad[..., None], rng.uniform(2, 8, (R, K, 3)), 0.0).astype(np.float32)
    valid = (rng.random((R, K)) < 0.9).astype(np.float32)
    src = src * valid[..., None]
    tgt = tgt * valid[..., None]

    v_ref = np.asarray(xla_votes(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(valid)))
    v_pl = np.asarray(compat_votes_pallas(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(valid), interpret=True
    ))
    # distance rounding can flip scores sitting exactly at the threshold;
    # require near-exact agreement
    diff = np.abs(v_pl - v_ref)
    assert (diff <= 1.0).all() and (diff > 0).mean() < 0.01, (
        f"max diff {diff.max()}, frac {np.mean(diff > 0)}"
    )


def test_pallas_votes_empty_chunks():
    R, K = 3, 64
    src = np.zeros((R, K, 3), np.float32)
    v = np.zeros((R, K), np.float32)
    out = np.asarray(compat_votes_pallas(
        jnp.asarray(src), jnp.asarray(src), jnp.asarray(v), interpret=True
    ))
    assert (out == 0).all()


def test_simple_vote_pallas_backend_matches():
    from light_loam_tpu.ops.graphvote import simple_vote

    rng = np.random.default_rng(1)
    n = 150
    src = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    tgt = src + np.float32(0.4)
    bad = np.zeros(n, bool); bad[::6] = True
    tgt[bad] += rng.uniform(3, 9, (bad.sum(), 3)).astype(np.float32)
    valid = jnp.ones(n, bool)

    a = simple_vote(jnp.asarray(src), jnp.asarray(tgt), valid,
                    n_regions=5, chunk_capacity=48, backend="xla")
    # interpret-mode pallas via monkeypatched call
    from light_loam_tpu.ops import graphvote as gv
    from light_loam_tpu.ops import pallas_vote as pv
    import functools
    orig = pv.compat_votes_pallas
    try:
        pv.compat_votes_pallas = functools.partial(orig, interpret=True)
        b = simple_vote(jnp.asarray(src), jnp.asarray(tgt), valid,
                        n_regions=5, chunk_capacity=48, backend="pallas")
    finally:
        pv.compat_votes_pallas = orig
    np.testing.assert_array_equal(np.asarray(a.selected), np.asarray(b.selected))
    np.testing.assert_allclose(np.asarray(a.votes), np.asarray(b.votes), atol=1.0)


def test_pallas_votes_custom_vmap_flattens_batch():
    """vmap of the pallas vote must equal per-lane calls — the custom
    batching rule folds (B, R) into one flattened kernel grid, which is
    what lets batched programs keep the fused kernel instead of forcing
    the XLA path (models/batch.py)."""
    import jax

    rng = np.random.default_rng(7)
    B, R, K = 3, 4, 96
    src = rng.uniform(-20, 20, (B, R, K, 3)).astype(np.float32)
    tgt = src + rng.uniform(-0.5, 0.5, (B, R, K, 3)).astype(np.float32)
    valid = (rng.random((B, R, K)) < 0.85).astype(np.float32)

    fn = lambda s, t, v: compat_votes_pallas(s, t, v, interpret=True)
    batched = np.asarray(jax.vmap(fn)(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(valid)))
    singles = np.stack([
        np.asarray(fn(jnp.asarray(src[b]), jnp.asarray(tgt[b]),
                      jnp.asarray(valid[b])))
        for b in range(B)
    ])
    np.testing.assert_allclose(batched, singles, atol=1e-5)

    # unbatched operand broadcast: same tgt/valid for every lane
    batched2 = np.asarray(jax.vmap(fn, in_axes=(0, None, None))(
        jnp.asarray(src), jnp.asarray(tgt[0]), jnp.asarray(valid[0])))
    singles2 = np.stack([
        np.asarray(fn(jnp.asarray(src[b]), jnp.asarray(tgt[0]),
                      jnp.asarray(valid[0])))
        for b in range(B)
    ])
    np.testing.assert_allclose(batched2, singles2, atol=1e-5)
