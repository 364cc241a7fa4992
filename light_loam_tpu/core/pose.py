"""SE(3) pose pytree and composition rules.

Poses are (quaternion xyzw, translation) pairs.  Composition follows the
reference's world-pose integration (src/laserOdometry.cpp:830-831):

    t_w = t_w + q_w * t_delta ;  q_w = q_w * q_delta

and the odom→map association (src/laserMapping.cpp:113-123).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from light_loam_tpu.core import quaternion as quat


class Pose(NamedTuple):
    """Rigid transform: x_out = q * x + t."""

    q: jnp.ndarray  # (..., 4) xyzw
    t: jnp.ndarray  # (..., 3)

    @staticmethod
    def identity(dtype=jnp.float32) -> "Pose":
        return Pose(q=quat.quat_identity(dtype), t=jnp.zeros(3, dtype=dtype))

    def matrix(self) -> jnp.ndarray:
        """Homogeneous 4x4 matrix."""
        R = quat.quat_to_matrix(self.q)
        top = jnp.concatenate([R, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=top.dtype),
            top.shape[:-2] + (1, 4),
        )
        return jnp.concatenate([top, bottom], axis=-2)

    def normalize(self) -> "Pose":
        return Pose(q=quat.quat_normalize(self.q), t=self.t)


def compose(a: Pose, b: Pose) -> Pose:
    """a ∘ b: apply b first, then a.  (a∘b)(x) = a.q*(b.q*x + b.t) + a.t."""
    return Pose(
        q=quat.quat_multiply(a.q, b.q),
        t=quat.quat_rotate(a.q, b.t) + a.t,
    )


def inverse(p: Pose) -> Pose:
    qi = quat.quat_inverse(p.q)
    return Pose(q=qi, t=-quat.quat_rotate(qi, p.t))


def transform_points(p: Pose, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply pose to (..., 3) points."""
    return quat.quat_rotate(p.q[..., None, :], pts) + p.t[..., None, :]
