"""Quaternion algebra on (..., 4) arrays in **(x, y, z, w)** order.

The xyzw layout mirrors the reference's Ceres parameter block
(``para_q[4] = {x, y, z, w}``, src/laserOdometry.cpp:61-64) and Eigen's
internal coefficient order, so pose states round-trip without reshuffling.

All functions broadcast over leading batch dimensions and preserve dtype.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2 (rotation q2 followed by q1)."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_inverse(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse for (approximately) unit quaternions == conjugate."""
    return quat_conjugate(q)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def quat_rotate(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Rotate points p (..., 3) by unit quaternion q (..., 4).

    Uses the expanded 15-multiply form: p' = p + 2 w (v x p) + 2 v x (v x p).
    """
    v = q[..., :3]
    w = q[..., 3:4]
    c1 = jnp.cross(v, p)
    c2 = jnp.cross(v, c1)
    return p + 2.0 * (w * c1 + c2)


def quat_slerp_identity(q: jnp.ndarray, s) -> jnp.ndarray:
    """slerp(I, q, s): interpolate from identity toward q by fraction s.

    Matches Eigen's ``Quaterniond::Identity().slerp(s, q)`` used for the
    motion-compensation hook (src/laserOdometry.cpp:86, src/lidarFactor.hpp:26).
    Falls back to lerp+normalize for tiny angles.
    """
    s = jnp.asarray(s, dtype=q.dtype)
    w = jnp.clip(q[..., 3], -1.0, 1.0)
    # Take the short arc: Eigen slerp handles sign via absolute dot with
    # identity, i.e. |w|.
    sign = jnp.where(w < 0, -1.0, 1.0).astype(q.dtype)
    w_abs = jnp.abs(w)
    theta = jnp.arccos(jnp.clip(w_abs, 0.0, 1.0))
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    safe_sin = jnp.where(small, 1.0, sin_theta)
    c_id = jnp.where(small, 1.0 - s, jnp.sin((1.0 - s) * theta) / safe_sin)
    c_q = jnp.where(small, s, jnp.sin(s * theta) / safe_sin)
    ident = jnp.zeros_like(q).at[..., 3].set(1.0)
    out = c_id[..., None] * ident + (c_q * sign)[..., None] * q
    return quat_normalize(out)


def quat_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: rotation vector phi (..., 3) -> unit quaternion.

    q = [sin(|phi|/2) * phi/|phi|, cos(|phi|/2)] — the manifold ⊞ used in
    place of Ceres's EigenQuaternionManifold (src/laserOdometry.cpp:476-477).
    """
    # sqrt(x + eps) keeps the map differentiable at phi = 0 (plain norm has
    # an undefined gradient there, which poisons jacfwd/jacrev even under
    # a `where` — the NaN rides the untaken branch's tangent).
    angle = jnp.sqrt(jnp.sum(phi * phi, axis=-1, keepdims=True) + 1e-24)
    half = 0.5 * angle
    small = angle < 1e-8
    safe = jnp.where(small, 1.0, angle)
    # sin(a/2)/a -> 1/2 as a -> 0
    k = jnp.where(small, 0.5, jnp.sin(half) / safe)
    return jnp.concatenate([k * phi, jnp.cos(half)], axis=-1)


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map: unit quaternion -> rotation vector (..., 3)."""
    qn = quat_normalize(q)
    sign = jnp.where(qn[..., 3:4] < 0, -1.0, 1.0).astype(q.dtype)
    qn = qn * sign
    v = qn[..., :3]
    w = jnp.clip(qn[..., 3:4], -1.0, 1.0)
    vnorm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vnorm, w)
    small = vnorm < 1e-8
    k = jnp.where(small, 2.0, angle / jnp.where(small, 1.0, vnorm))
    return k * v


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) xyzw.

    Branch-free Shepperd-style selection of the numerically best row.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the one with the largest pivot.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5
    w0, x1, y2, z3 = (qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3])

    cand = jnp.stack(
        [
            jnp.stack([(m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0),
                       (m10 - m01) / (4 * w0), w0], axis=-1),
            jnp.stack([x1, (m01 + m10) / (4 * x1), (m02 + m20) / (4 * x1),
                       (m21 - m12) / (4 * x1)], axis=-1),
            jnp.stack([(m01 + m10) / (4 * y2), y2, (m12 + m21) / (4 * y2),
                       (m02 - m20) / (4 * y2)], axis=-1),
            jnp.stack([(m02 + m20) / (4 * z3), (m12 + m21) / (4 * z3), z3,
                       (m10 - m01) / (4 * z3)], axis=-1),
        ],
        axis=-2,
    )
    pick = jnp.argmax(
        jnp.stack([tr, m00, m11, m22], axis=-1), axis=-1
    )
    q = jnp.take_along_axis(cand, pick[..., None, None], axis=-2)[..., 0, :]
    # Canonical sign: w >= 0.
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    return quat_normalize(q)
