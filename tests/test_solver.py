import numpy as np
import jax
import jax.numpy as jnp

from light_loam_tpu.core import quaternion as quat
from light_loam_tpu.solver import (
    EdgeFactors,
    PlaneNormFactors,
    make_plane_factors,
    edge_residuals,
    plane_residuals,
    plane_norm_residuals,
    lm_solve,
    FactorSet,
)


def rand_pose(rng, scale_r=0.3, scale_t=1.0):
    q = np.asarray(quat.quat_exp(jnp.asarray(rng.normal(scale=scale_r, size=3).astype(np.float32))))
    t = rng.normal(scale=scale_t, size=3).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(t)


def autodiff_jacobian(res_fn, q, t, factors):
    """Jacobian of the residual wrt the 6-dim right tangent, via jacfwd."""

    def f(delta):
        qd = quat.quat_multiply(q, quat.quat_exp(delta[:3]))
        r, _ = res_fn(qd, t + delta[3:], factors)
        return r

    return jax.jacfwd(f)(jnp.zeros(6))


def test_edge_jacobian_matches_autodiff():
    rng = np.random.default_rng(0)
    n = 32
    q, t = rand_pose(rng)
    f = EdgeFactors(
        cp=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
        a=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
        b=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
        s=jnp.ones(n),
        weight=jnp.asarray(rng.uniform(0.5, 2.0, n).astype(np.float32)),
        mask=jnp.ones(n, bool),
    )
    r, J = edge_residuals(q, t, f)
    J_ad = autodiff_jacobian(edge_residuals, q, t, f)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=1e-4)


def test_plane_jacobian_matches_autodiff():
    rng = np.random.default_rng(1)
    n = 32
    q, t = rand_pose(rng)
    f = make_plane_factors(
        cp=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
        a=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
        b=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
        c=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
        s=jnp.ones(n),
        weight=jnp.asarray(rng.uniform(0.5, 2.0, n).astype(np.float32)),
        mask=jnp.ones(n, bool),
    )
    _, J = plane_residuals(q, t, f)
    J_ad = autodiff_jacobian(plane_residuals, q, t, f)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=1e-4)


def test_plane_norm_jacobian_matches_autodiff():
    rng = np.random.default_rng(2)
    n = 16
    q, t = rand_pose(rng)
    nvec = rng.normal(size=(n, 3)).astype(np.float32)
    nvec /= np.linalg.norm(nvec, axis=1, keepdims=True)
    f = PlaneNormFactors(
        cp=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
        n=jnp.asarray(nvec),
        d=jnp.asarray(rng.normal(size=n).astype(np.float32)),
        weight=jnp.ones(n),
        mask=jnp.ones(n, bool),
    )
    _, J = plane_norm_residuals(q, t, f)
    J_ad = autodiff_jacobian(plane_norm_residuals, q, t, f)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=1e-4)


def _make_registration_problem(rng, n_edge=64, n_plane=256, noise=0.0):
    """Ground-truth pose gt maps current-frame points to target structures."""
    q_gt, t_gt = rand_pose(rng, scale_r=0.05, scale_t=0.3)

    # edge: points on random 3D lines
    centers = rng.normal(size=(n_edge, 3)).astype(np.float32) * 10
    dirs = rng.normal(size=(n_edge, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    alpha = rng.uniform(-1, 1, (n_edge, 1)).astype(np.float32)
    p_line = centers + alpha * dirs  # target-frame point on line
    # current-frame point = gt^-1 (p_line)
    qi = quat.quat_inverse(jnp.asarray(q_gt))
    cp_e = np.asarray(quat.quat_rotate(qi, jnp.asarray(p_line) - t_gt))
    a = centers + 0.5 * dirs
    b = centers - 0.5 * dirs

    # plane: points on random planes via 3 anchor points
    pa = rng.normal(size=(n_plane, 3)).astype(np.float32) * 10
    e1 = rng.normal(size=(n_plane, 3)).astype(np.float32)
    e2 = rng.normal(size=(n_plane, 3)).astype(np.float32)
    u = rng.uniform(-1, 1, (n_plane, 1)).astype(np.float32)
    v = rng.uniform(-1, 1, (n_plane, 1)).astype(np.float32)
    p_plane = pa + u * e1 + v * e2
    cp_p = np.asarray(quat.quat_rotate(qi, jnp.asarray(p_plane) - t_gt))

    if noise:
        cp_e = cp_e + rng.normal(scale=noise, size=cp_e.shape).astype(np.float32)
        cp_p = cp_p + rng.normal(scale=noise, size=cp_p.shape).astype(np.float32)

    edge = EdgeFactors(
        cp=jnp.asarray(cp_e), a=jnp.asarray(a), b=jnp.asarray(b),
        s=jnp.ones(n_edge), weight=jnp.ones(n_edge), mask=jnp.ones(n_edge, bool),
    )
    plane = make_plane_factors(
        cp=jnp.asarray(cp_p), a=jnp.asarray(pa), b=jnp.asarray(pa + e1),
        c=jnp.asarray(pa + e2), s=jnp.ones(n_plane), weight=jnp.ones(n_plane),
        mask=jnp.ones(n_plane, bool),
    )
    return q_gt, t_gt, FactorSet(edge=edge, plane=plane)


def test_lm_recovers_pose():
    rng = np.random.default_rng(3)
    q_gt, t_gt, factors = _make_registration_problem(rng)
    q0 = quat.quat_identity()
    t0 = jnp.zeros(3)
    q, t, cost = lm_solve(q0, t0, factors, n_iterations=8)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=2e-3)
    dot = abs(float(jnp.sum(q * q_gt)))
    assert dot > 0.99999, f"rotation off: |<q,q_gt>|={dot}"


def test_lm_robust_to_outliers():
    rng = np.random.default_rng(4)
    q_gt, t_gt, factors = _make_registration_problem(rng, noise=0.005)
    # corrupt 10% of plane anchors badly
    pf = factors.plane
    n = pf.cp.shape[0]
    bad = rng.random(n) < 0.1
    j = np.array(pf.j)
    j[bad] += rng.normal(scale=5.0, size=(bad.sum(), 3)).astype(np.float32)
    factors = FactorSet(edge=factors.edge, plane=pf._replace(j=jnp.asarray(j)))
    q, t, cost = lm_solve(quat.quat_identity(), jnp.zeros(3), factors, n_iterations=8)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=0.05)


def test_lm_empty_problem_is_identity():
    n = 8
    edge = EdgeFactors(
        cp=jnp.zeros((n, 3)), a=jnp.zeros((n, 3)), b=jnp.ones((n, 3)),
        s=jnp.ones(n), weight=jnp.ones(n), mask=jnp.zeros(n, bool),
    )
    q, t, cost = lm_solve(
        quat.quat_identity(), jnp.zeros(3), FactorSet(edge=edge), n_iterations=4
    )
    np.testing.assert_allclose(np.asarray(q), [0, 0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), np.zeros(3), atol=1e-6)
