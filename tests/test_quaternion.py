import numpy as np
import jax.numpy as jnp

from light_loam_tpu.core import quaternion as q
from light_loam_tpu.core import pose as P


def rand_quat(rng, n=()):
    v = rng.normal(size=n + (4,))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return v.astype(np.float32)


def test_multiply_matches_matrix():
    rng = np.random.default_rng(0)
    q1 = rand_quat(rng, (16,))
    q2 = rand_quat(rng, (16,))
    m = q.quat_to_matrix(jnp.asarray(q1)) @ q.quat_to_matrix(jnp.asarray(q2))
    m2 = q.quat_to_matrix(q.quat_multiply(jnp.asarray(q1), jnp.asarray(q2)))
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)


def test_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    qq = rand_quat(rng, (8,))
    p = rng.normal(size=(8, 3)).astype(np.float32)
    r1 = q.quat_rotate(jnp.asarray(qq), jnp.asarray(p))
    r2 = np.einsum("nij,nj->ni", np.asarray(q.quat_to_matrix(jnp.asarray(qq))), p)
    np.testing.assert_allclose(np.asarray(r1), r2, atol=1e-5)


def test_matrix_roundtrip():
    rng = np.random.default_rng(2)
    qq = rand_quat(rng, (32,))
    qq = qq * np.where(qq[..., 3:4] < 0, -1.0, 1.0).astype(np.float32)
    back = q.matrix_to_quat(q.quat_to_matrix(jnp.asarray(qq)))
    np.testing.assert_allclose(np.asarray(back), qq, atol=1e-4)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(3)
    phi = rng.normal(scale=0.5, size=(16, 3)).astype(np.float32)
    back = q.quat_log(q.quat_exp(jnp.asarray(phi)))
    np.testing.assert_allclose(np.asarray(back), phi, atol=1e-5)


def test_slerp_identity_endpoints():
    rng = np.random.default_rng(4)
    qq = jnp.asarray(rand_quat(rng, (8,)))
    s0 = q.quat_slerp_identity(qq, 0.0)
    s1 = q.quat_slerp_identity(qq, 1.0)
    ident = np.tile([0, 0, 0, 1.0], (8, 1))
    np.testing.assert_allclose(np.asarray(s0), ident, atol=1e-5)
    # endpoint may differ by sign (short arc)
    dot = np.abs(np.sum(np.asarray(s1) * np.asarray(qq), axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_pose_compose_inverse():
    rng = np.random.default_rng(5)
    a = P.Pose(jnp.asarray(rand_quat(rng)), jnp.asarray(rng.normal(size=3).astype(np.float32)))
    b = P.Pose(jnp.asarray(rand_quat(rng)), jnp.asarray(rng.normal(size=3).astype(np.float32)))
    ab = P.compose(a, b)
    pts = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    r1 = P.transform_points(ab, pts)
    r2 = P.transform_points(a, P.transform_points(b, pts))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)

    ia = P.compose(P.inverse(a), a)
    np.testing.assert_allclose(np.asarray(ia.t), np.zeros(3), atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(ia.q)[3]), 1.0, atol=1e-5)


def test_pose_matrix_matches_reference_integration():
    # world-pose integration rule (laserOdometry.cpp:830-831):
    # t_w += q_w * t_d ; q_w *= q_d  == compose(world, delta)
    rng = np.random.default_rng(6)
    w = P.Pose(jnp.asarray(rand_quat(rng)), jnp.asarray(rng.normal(size=3).astype(np.float32)))
    d = P.Pose(jnp.asarray(rand_quat(rng)), jnp.asarray(rng.normal(size=3).astype(np.float32)))
    out = P.compose(w, d)
    t_ref = np.asarray(w.t) + np.asarray(q.quat_rotate(w.q, d.t))
    q_ref = np.asarray(q.quat_multiply(w.q, d.q))
    np.testing.assert_allclose(np.asarray(out.t), t_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.q), q_ref, atol=1e-6)
