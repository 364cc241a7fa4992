"""Windowed Schur-complement refinement: pose recovery + sharded parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from functools import partial

from light_loam_tpu.core import quaternion as quat
from light_loam_tpu.models.refine import (
    PlaneLandmarks,
    extract_landmarks,
    refine_window,
)
from light_loam_tpu.solver.schur import schur_solve


def make_ba_problem(rng, K=4, M=24, P=256, pose_noise=0.05, lm_noise=0.0):
    """K keyframes observing M random planes; returns (true poses,
    noisy poses, stacks in sensor frames, noisy landmarks)."""
    # planes: random normals, anchors spread out
    n = rng.normal(size=(M, 3)); n /= np.linalg.norm(n, axis=1, keepdims=True)
    anchor = rng.uniform(-15, 15, (M, 3))
    d = -np.sum(n * anchor, axis=1)

    # true poses along a path
    q_true = np.zeros((K, 4), np.float32); q_true[:, 3] = 1
    t_true = np.zeros((K, 3), np.float32)
    for k in range(K):
        phi = rng.normal(scale=0.02, size=3)
        q_true[k] = np.asarray(quat.quat_exp(jnp.asarray(phi.astype(np.float32))))
        t_true[k] = [1.0 * k, 0.1 * k, 0.0]

    # sample P points per keyframe on random planes (world), move to sensor
    stacks = np.zeros((K, P, 3), np.float32)
    for k in range(K):
        midx = rng.integers(0, M, P)
        b1 = np.cross(n[midx], [0.3, 0.7, 0.64]); b1 /= np.linalg.norm(b1, axis=1, keepdims=True)
        b2 = np.cross(n[midx], b1)
        u = rng.uniform(-3, 3, (P, 1)); v = rng.uniform(-3, 3, (P, 1))
        p_w = anchor[midx] + u * b1 + v * b2
        p_w += rng.normal(scale=0.01, size=p_w.shape)
        qi = quat.quat_inverse(jnp.asarray(q_true[k]))
        stacks[k] = np.asarray(
            quat.quat_rotate(qi, jnp.asarray((p_w - t_true[k]).astype(np.float32)))
        )

    # noisy initial poses (keyframe 0 exact: gauge)
    q0 = q_true.copy(); t0 = t_true.copy()
    for k in range(1, K):
        dq = quat.quat_exp(jnp.asarray(rng.normal(scale=pose_noise / 2, size=3).astype(np.float32)))
        q0[k] = np.asarray(quat.quat_multiply(jnp.asarray(q_true[k]), dq))
        t0[k] = t_true[k] + rng.normal(scale=pose_noise, size=3)

    lm = PlaneLandmarks(
        n=jnp.asarray((n + rng.normal(scale=lm_noise, size=n.shape)).astype(np.float32)),
        d=jnp.asarray(d.astype(np.float32)),
        anchor=jnp.asarray(anchor.astype(np.float32)),
        mask=jnp.ones(M, bool),
    )
    return (q_true, t_true), (q0, t0), stacks, lm


def test_refine_recovers_poses():
    rng = np.random.default_rng(0)
    (q_true, t_true), (q0, t0), stacks, lm = make_ba_problem(rng)
    K, P = stacks.shape[:2]
    mask = jnp.ones((K, P), bool)

    err0 = np.linalg.norm(t0 - t_true, axis=1).mean()
    q, t, lm2 = refine_window(
        jnp.asarray(q0), jnp.asarray(t0), jnp.asarray(stacks), mask, lm,
        n_iterations=6,
    )
    err1 = np.linalg.norm(np.asarray(t) - t_true, axis=1).mean()
    assert err1 < 0.25 * err0, f"refine did not converge: {err0} -> {err1}"
    assert err1 < 0.02
    # rotations close
    dots = np.abs(np.sum(np.asarray(q) * q_true, axis=1))
    assert (dots > 0.9999).all()


def test_refine_sharded_matches_single():
    n_dev = 4
    if len(jax.devices()) < n_dev:
        pytest.skip("needs 4 devices")
    from jax.sharding import Mesh, PartitionSpec as P_

    rng = np.random.default_rng(1)
    (q_true, t_true), (q0, t0), stacks, lm = make_ba_problem(rng, K=8)
    K, P = stacks.shape[:2]
    mask = np.ones((K, P), bool)

    q_s, t_s, _ = refine_window(
        jnp.asarray(q0), jnp.asarray(t0), jnp.asarray(stacks),
        jnp.asarray(mask), lm, n_iterations=4,
    )

    mesh = Mesh(jax.devices()[:n_dev], ("kf",))
    lm_spec = PlaneLandmarks(n=P_(), d=P_(), anchor=P_(), mask=P_())

    fn = jax.jit(jax.shard_map(
        partial(refine_window, n_iterations=4, axis_name="kf"),
        mesh=mesh,
        in_specs=(P_("kf"), P_("kf"), P_("kf"), P_("kf"), lm_spec),
        out_specs=(P_("kf"), P_("kf"), lm_spec),
        check_vma=False,
    ))
    q_m, t_m, _ = fn(jnp.asarray(q0), jnp.asarray(t0), jnp.asarray(stacks),
                     jnp.asarray(mask), lm)
    np.testing.assert_allclose(np.asarray(t_m), np.asarray(t_s), atol=1e-4)
    np.testing.assert_allclose(np.asarray(q_m), np.asarray(q_s), atol=1e-4)


def test_schur_matches_dense_solve():
    rng = np.random.default_rng(2)
    K, M = 3, 5
    # random SPD-structured system
    Jp = rng.normal(size=(40, K, 6)) * (rng.random((40, K, 1)) < 0.6)
    Jl = rng.normal(size=(40, M, 3)) * (rng.random((40, M, 1)) < 0.6)
    r = rng.normal(size=40)
    # build full H from per-residual rows: each residual touches one (k, m)
    Hpp = np.zeros((K, 6, 6)); g_p = np.zeros((K, 6))
    Hll = np.zeros((M, 3, 3)); g_l = np.zeros((M, 3))
    Hpl = np.zeros((K, M, 6, 3))
    H_full = np.zeros((K * 6 + M * 3, K * 6 + M * 3))
    g_full = np.zeros(K * 6 + M * 3)
    for i in range(40):
        k = rng.integers(0, K); m = rng.integers(0, M)
        jp = Jp[i, k]; jl = Jl[i, m]
        Hpp[k] += np.outer(jp, jp); g_p[k] += jp * r[i]
        Hll[m] += np.outer(jl, jl); g_l[m] += jl * r[i]
        Hpl[k, m] += np.outer(jp, jl)
        row = np.zeros(K * 6 + M * 3)
        row[k * 6:(k + 1) * 6] = jp
        row[K * 6 + m * 3: K * 6 + (m + 1) * 3] = jl
        H_full += np.outer(row, row)
        g_full += row * r[i]

    damping = 1e-3
    dp, dl = schur_solve(
        jnp.asarray(Hpp), jnp.asarray(g_p), jnp.asarray(Hpl),
        jnp.asarray(Hll), jnp.asarray(g_l), damping=damping,
        fix_first_pose=False,
    )
    # dense reference with the same damping structure
    Hd = H_full.copy()
    for k in range(K):
        blk = slice(k * 6, (k + 1) * 6)
        tr = np.trace(H_full[blk, blk])
        Hd[blk, blk] += damping * (1 + tr) * np.eye(6)
    for m in range(M):
        blk = slice(K * 6 + m * 3, K * 6 + (m + 1) * 3)
        tr = np.trace(H_full[blk, blk])
        Hd[blk, blk] += damping * (1 + tr) * np.eye(3)
    delta = np.linalg.solve(Hd, -g_full)
    np.testing.assert_allclose(np.asarray(dp).reshape(-1), delta[: K * 6],
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dl).reshape(-1), delta[K * 6:],
                               atol=1e-3, rtol=1e-3)
