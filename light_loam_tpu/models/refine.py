"""Windowed multi-keyframe refinement with Schur-complement reduction.

A capability the reference does not have (its back end refines one frame
at a time against the map): jointly re-estimate the last K keyframe poses
AND M shared plane landmarks from the keyframes' surf stacks — small-scale
bundle adjustment over the BA-structured system solved in
solver/schur.py.  This is the BASELINE north star's
"distributed bundle-adjustment-style refinement": with keyframes sharded
across a mesh, landmark blocks are psum-reduced and the pose-landmark
couplings all-gathered, and every device solves the identical reduced
6K×6K system (``refine_window(..., axis_name=...)`` under shard_map —
exercised in tests/test_refine.py's sharded-equivalence test).

Landmarks are planes parameterized as (n̂, d) with a 3-dof tangent
(2 in the normal's tangent basis + 1 offset), extracted from the map by
coarse sampling + local plane fits.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from light_loam_tpu.core import quaternion as quat
from light_loam_tpu.ops import knn
from light_loam_tpu.ops.voxel import voxel_downsample
from light_loam_tpu.solver.gauss_newton import _huber_rho
from light_loam_tpu.solver.schur import schur_solve


class PlaneLandmarks(NamedTuple):
    n: jnp.ndarray       # (M, 3) unit normals
    d: jnp.ndarray       # (M,) offsets: plane is n·x + d = 0
    anchor: jnp.ndarray  # (M, 3) representative point (association key)
    mask: jnp.ndarray    # (M,)


def extract_landmarks(
    map_xyz: jnp.ndarray,
    map_mask: jnp.ndarray,
    n_landmarks: int,
    sample_leaf: float = 4.0,
    knn_k: int = 5,
    knn_tile: int = 4096,
    fit_gate: float = 0.2,
) -> PlaneLandmarks:
    """Sample well-spaced anchors from the surf map (coarse voxel grid)
    and fit a plane to each anchor's k-NN neighbourhood."""
    anchors, _, amask, _ = voxel_downsample(
        map_xyz, jnp.zeros(map_xyz.shape[0]), map_mask, sample_leaf,
        n_landmarks,
    )
    d2, idx = knn.knn_tiled(anchors, map_xyz, map_mask, k=knn_k, tile=knn_tile)
    near = map_xyz[idx]
    AtA = jnp.einsum("qni,qnj->qij", near, near)
    Atb = -jnp.sum(near, axis=1)
    from light_loam_tpu.models.mapping import _solve3x3

    nvec, ok = _solve3x3(AtA, Atb)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(nvec * nvec, axis=-1), 1e-20))
    d = 1.0 / norm
    n_hat = nvec / norm[:, None]
    resid = jnp.abs(jnp.einsum("qni,qi->qn", near, n_hat) + d[:, None])
    good = (
        amask & ok & (d2[:, -1] < 1.0) & jnp.all(resid <= fit_gate, axis=1)
    )
    return PlaneLandmarks(n=n_hat, d=d, anchor=anchors, mask=good)


def _normal_basis(n: jnp.ndarray):
    """Per-landmark orthonormal tangent basis (b1, b2) ⊥ n."""
    # pick the axis least aligned with n
    ref = jnp.where(
        (jnp.abs(n[:, 0]) < 0.9)[:, None],
        jnp.asarray([1.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]),
    )
    b1 = jnp.cross(n, ref)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1, axis=-1, keepdims=True), 1e-12)
    b2 = jnp.cross(n, b1)
    return b1, b2


def refine_window(
    q: jnp.ndarray,          # (K, 4) keyframe rotations (world)
    t: jnp.ndarray,          # (K, 3)
    stack_xyz: jnp.ndarray,  # (K, P, 3) surf points in each keyframe's frame
    stack_mask: jnp.ndarray, # (K, P)
    landmarks: PlaneLandmarks,
    n_iterations: int = 4,
    huber_delta: float = 0.1,
    assoc_radius: float = 2.0,
    resid_gate: float = 1.0,
    damping: float = 1e-4,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, PlaneLandmarks]:
    """Jointly refine K poses and M plane landmarks.

    With ``axis_name`` set (inside shard_map, keyframes sharded), landmark
    blocks are psum-reduced and pose blocks all-gathered before the
    replicated Schur solve; each device then applies its own keyframes'
    updates.  Keyframe 0 (globally) is gauge-fixed.
    """
    Kl = q.shape[0]  # local keyframes
    M = landmarks.n.shape[0]

    def gather_poses(x):
        if axis_name is None:
            return x
        g = jax.lax.all_gather(x, axis_name)  # (D, Kl, ...)
        return g.reshape((-1,) + x.shape[1:])

    def psum(x):
        return x if axis_name is None else jax.lax.psum(x, axis_name)

    my_offset = 0
    if axis_name is not None:
        my_offset = jax.lax.axis_index(axis_name) * Kl

    lm = landmarks

    def body(carry, _):
        q, t, lm_n, lm_d = carry
        b1, b2 = _normal_basis(lm_n)

        # world-frame stack points
        R = quat.quat_to_matrix(q)  # (Kl, 3, 3)
        p_w = jnp.einsum("kij,kpj->kpi", R, stack_xyz) + t[:, None, :]

        # associate each point with the nearest landmark anchor
        d2 = (
            jnp.sum(p_w * p_w, axis=-1)[:, :, None]
            + jnp.sum(lm.anchor * lm.anchor, axis=-1)[None, None, :]
            - 2.0 * jnp.einsum("kpi,mi->kpm", p_w, lm.anchor)
        )
        d2 = jnp.where(lm.mask[None, None, :], d2, 1e30)
        m_idx = jnp.argmin(d2, axis=-1)  # (Kl, P)
        m_d2 = jnp.take_along_axis(d2, m_idx[..., None], axis=-1)[..., 0]

        n_m = lm_n[m_idx]      # (Kl, P, 3)
        d_m = lm_d[m_idx]      # (Kl, P)
        r = jnp.sum(n_m * p_w, axis=-1) + d_m  # (Kl, P)

        valid = (
            stack_mask
            & (m_d2 < assoc_radius**2)
            & (jnp.abs(r) < resid_gate)
        )
        _, w_h = _huber_rho(r * r, huber_delta)
        w = w_h * valid

        # pose Jacobian rows: [-nᵀ R [p]× , nᵀ]
        cp = stack_xyz
        zero = jnp.zeros_like(cp[..., 0])
        cx = jnp.stack(
            [
                jnp.stack([zero, -cp[..., 2], cp[..., 1]], axis=-1),
                jnp.stack([cp[..., 2], zero, -cp[..., 0]], axis=-1),
                jnp.stack([-cp[..., 1], cp[..., 0], zero], axis=-1),
            ],
            axis=-2,
        )  # (Kl, P, 3, 3)
        Jrot = -jnp.einsum("kpi,kij,kpjl->kpl", n_m, R, cx)  # (Kl, P, 3)
        Jp = jnp.concatenate([Jrot, n_m], axis=-1)  # (Kl, P, 6)

        # landmark Jacobian rows: [b1·p_w, b2·p_w, 1]
        b1_m = b1[m_idx]
        b2_m = b2[m_idx]
        Jl = jnp.stack(
            [
                jnp.sum(b1_m * p_w, axis=-1),
                jnp.sum(b2_m * p_w, axis=-1),
                jnp.ones_like(r),
            ],
            axis=-1,
        )  # (Kl, P, 3)

        # accumulate normal equations
        Hpp = jnp.einsum("kpa,kpb,kp->kab", Jp, Jp, w)
        g_p = jnp.einsum("kpa,kp,kp->ka", Jp, r, w)
        # landmark blocks scatter by m_idx (summed over keyframes too)
        Jl_w = Jl * w[..., None]
        Hll = jnp.zeros((M, 3, 3)).at[m_idx.reshape(-1)].add(
            jnp.einsum("xa,xb->xab", Jl_w.reshape(-1, 3), Jl.reshape(-1, 3))
        )
        g_l = jnp.zeros((M, 3)).at[m_idx.reshape(-1)].add(
            (Jl_w * r[..., None]).reshape(-1, 3)
        )
        # pose-landmark coupling: (Kl, M, 6, 3)
        flat_m = (
            jnp.arange(Kl)[:, None] * M + m_idx
        ).reshape(-1)
        Hpl = jnp.zeros((Kl * M, 6, 3)).at[flat_m].add(
            jnp.einsum(
                "xa,xb->xab",
                (Jp * w[..., None]).reshape(-1, 6),
                Jl.reshape(-1, 3),
            )
        ).reshape(Kl, M, 6, 3)

        # collectives: landmarks global, poses gathered for the reduced solve
        Hll = psum(Hll)
        g_l = psum(g_l)
        Hpp_g = gather_poses(Hpp)
        g_p_g = gather_poses(g_p)
        Hpl_g = gather_poses(Hpl)

        dp, dl = schur_solve(Hpp_g, g_p_g, Hpl_g, Hll, g_l, damping=damping)

        dp_local = jax.lax.dynamic_slice_in_dim(dp, my_offset, Kl, axis=0)
        q_new = quat.quat_normalize(
            quat.quat_multiply(q, quat.quat_exp(dp_local[:, :3]))
        )
        t_new = t + dp_local[:, 3:]

        n_new = lm_n + dl[:, 0:1] * b1 + dl[:, 1:2] * b2
        n_new = n_new / jnp.maximum(
            jnp.linalg.norm(n_new, axis=-1, keepdims=True), 1e-12
        )
        d_new = lm_d + dl[:, 2]
        return (q_new, t_new, n_new, d_new), None

    (q, t, n_out, d_out), _ = jax.lax.scan(
        body, (q, t, lm.n, lm.d), None, length=n_iterations
    )
    return q, t, lm._replace(n=n_out, d=d_out)
