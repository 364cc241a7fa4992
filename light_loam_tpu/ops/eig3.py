"""Closed-form batched symmetric 3×3 eigendecomposition.

Replaces the reference's per-point Eigen::SelfAdjointEigenSolver calls in
the mapping corner loop (src/laserMapping.cpp:1905-1911) with a fully
vectorized trigonometric (Cardano) solve — thousands of 3×3 problems per
frame become a handful of fused elementwise ops instead of a scalar loop.

Eigenvalues are returned ASCENDING (λ0 ≤ λ1 ≤ λ2) to match Eigen's
convention, plus the unit eigenvector of the largest eigenvalue (the only
one the reference uses — the line direction).
"""

from __future__ import annotations

import jax.numpy as jnp


def eigh3x3(A: jnp.ndarray):
    """A: (..., 3, 3) symmetric.  Returns (eigvals (..., 3) ascending,
    v_max (..., 3) unit eigenvector of the largest eigenvalue)."""
    a00 = A[..., 0, 0]
    a11 = A[..., 1, 1]
    a22 = A[..., 2, 2]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a12 = A[..., 1, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (
        a01 * a01 + a02 * a02 + a12 * a12
    )
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))

    # det(B/p) / 2 with B = A - qI
    db = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = jnp.clip(db / (2.0 * p * p * p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    lam2 = q + 2.0 * p * jnp.cos(phi)                      # largest
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    lam1 = 3.0 * q - lam2 - lam0
    vals = jnp.stack([lam0, lam1, lam2], axis=-1)

    # eigenvector of lam2: the column space of (A−λ0)(A−λ1) is span(v2);
    # equivalently take the largest cross product of rows of (A − λ2 I).
    def rows_of(Ad, lam):
        d0 = jnp.stack([a00 - lam, a01, a02], axis=-1)
        d1 = jnp.stack([a01, a11 - lam, a12], axis=-1)
        d2 = jnp.stack([a02, a12, a22 - lam], axis=-1)
        return d0, d1, d2

    r0, r1, r2 = rows_of(A, lam2)
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.argmax(jnp.stack([n01, n02, n12], axis=-1), axis=-1)
    cand = jnp.stack([c01, c02, c12], axis=-2)
    v = jnp.take_along_axis(cand, best[..., None, None], axis=-2)[..., 0, :]
    norm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-30))
    # degenerate (repeated λ): fall back to e_x — callers gate such cases
    # out via the λ2 > 3 λ1 line test anyway.
    good = norm[..., 0] > 1e-12
    v = jnp.where(good[..., None], v / norm, jnp.asarray([1.0, 0.0, 0.0]))
    return vals, v
