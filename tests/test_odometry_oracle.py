"""Integrated whole-frame odometry parity: odometry_step vs the
independent float64 NumPy port of laserOdometry.cpp:439-831 in
tests/oracle.py (correspondences → vote → outer-iteration solve → pose).

The kernels are unit-gated elsewhere (test_matching, test_graphvote,
test_solver); this gates their *interaction* — compaction order × vote
chunk boundaries × re-association — at the reference 3×4 schedule.

Documented [DEV] deviations absorbed by the tolerance:
  * float32 kernels vs float64 oracle;
  * analytic Jacobians vs finite differences;
  * LM accept/reject ties under the two precisions.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from light_loam_tpu.config import OdometryConfig, ScanConfig
from light_loam_tpu.models.odometry import OdometryState, odometry_step
from light_loam_tpu.ops.features import extract_features
from light_loam_tpu.utils.synthetic import World, simulate_scan, pad_cloud

from oracle import oracle_odometry_frame

SCAN = ScanConfig(n_scans=64, minimum_range=5.0, h_max=1024, max_points=65536)
# reference live-path schedule: 3 outer × Ceres max 4 inner
# (laserOdometry.cpp:439,822); vote active from frame 2 so the test covers
# both the pre-vote and vote-gated phases in few frames
ODO = OdometryConfig(
    outer_iterations=3, inner_iterations=4, vote_start_frame=1,
)


def _compact(pc):
    m = np.asarray(pc.mask)
    xyz = np.asarray(pc.xyz, np.float64)[m]
    ring = np.floor(np.asarray(pc.rel, np.float64)[m])
    return xyz, ring


def test_whole_frame_parity_vs_oracle():
    world = World.urban(seed=3)
    true_step = np.array([0.8, 0.02, 0.0])

    feats = []
    for i in range(4):
        pts = simulate_scan(
            world, true_step * i, n_rings=SCAN.n_scans,
            lower_deg=SCAN.lower_bound_deg, upper_deg=SCAN.upper_bound_deg,
            n_azimuth=700, noise=0.005, seed=40 + i,
        )
        xyz, mask = pad_cloud(pts, SCAN.max_points)
        feats.append(
            extract_features(jnp.asarray(xyz), jnp.asarray(mask), SCAN)
        )

    state = OdometryState.init(SCAN.max_less_sharp, SCAN.max_less_flat)
    o_q = np.array([0.0, 0.0, 0.0, 1.0])
    o_t = np.zeros(3)

    for i, f in enumerate(feats):
        prev_corner, prev_surf = state.corner_last, state.surf_last
        frame_idx = int(state.frame)
        state, out = odometry_step(state, f, ODO, SCAN.scan_period)
        if i == 0:
            continue  # no previous cloud: both sides are a no-op

        cl_xyz, cl_ring = _compact(prev_corner)
        sl_xyz, sl_ring = _compact(prev_surf)
        sharp_xyz = np.asarray(f.sharp.xyz, np.float64)[np.asarray(f.sharp.mask)]
        flat_xyz = np.asarray(f.flat.xyz, np.float64)[np.asarray(f.flat.mask)]

        o_q, o_t = oracle_odometry_frame(
            cl_xyz, cl_ring, sl_xyz, sl_ring, sharp_xyz, flat_xyz,
            o_q, o_t, frame=frame_idx,
            outer_iterations=ODO.outer_iterations,
            inner_iterations=ODO.inner_iterations,
            vote_start_frame=ODO.vote_start_frame,
            plane_vote_regions=ODO.plane_vote_regions,
        )

        k_t = np.asarray(state.t_lc, np.float64)
        k_q = np.asarray(state.q_lc, np.float64)
        dt = np.linalg.norm(k_t - o_t)
        # quaternion sign-invariant angular difference
        dq = 2.0 * np.arccos(min(1.0, abs(float(np.dot(k_q, o_q)))))
        step_len = max(np.linalg.norm(o_t), 1e-9)
        assert dt < 0.02 * step_len + 2e-3, (
            f"frame {i}: increment diverged from oracle by {dt:.5f} m "
            f"(oracle step {step_len:.3f} m, kernel {k_t}, oracle {o_t})"
        )
        assert dq < 2e-3, f"frame {i}: rotation diverged by {dq:.6f} rad"
