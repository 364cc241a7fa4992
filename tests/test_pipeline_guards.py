"""Pipeline failure containment + keyframe refinement wiring."""

import numpy as np
import pytest

from light_loam_tpu.models.pipeline import Pipeline, PROFILES
from light_loam_tpu.utils.synthetic import World, simulate_scan, pad_cloud


def frames_for(cfg, world, n, step=0.5):
    out = []
    for i in range(n):
        pts = simulate_scan(world, np.array([step * i, 0, 0]), n_azimuth=500,
                            noise=0.01, seed=50 + i)
        out.append(pad_cloud(pts, cfg.scan.max_points))
    return out


def test_empty_frame_does_not_poison_pose():
    cfg = PROFILES["hdl64-small"]
    world = World.urban(seed=12)
    pipe = Pipeline(cfg)
    fs = frames_for(cfg, world, 3)
    for f in fs[:2]:
        pipe.process_frame(*f)
    pose_before = pipe.process_frame(*fs[2]).odom_t

    # an (almost) empty frame: all-masked input
    empty = (np.zeros_like(fs[0][0]), np.zeros_like(fs[0][1]))
    r = pipe.process_frame(*empty)
    assert np.isfinite(r.odom_t).all()
    # pose must not have jumped wildly
    assert np.linalg.norm(r.odom_t - pose_before) < 2.0

    # recovery: a real frame afterwards still produces finite poses
    r2 = pipe.process_frame(*fs[2])
    assert np.isfinite(r2.odom_t).all()


def test_keyframe_refinement_wiring():
    cfg = PROFILES["hdl64-small"]
    world = World.urban(seed=13)
    pipe = Pipeline(cfg)
    for f in frames_for(cfg, world, 4):
        pipe.process_frame(*f)
    out = pipe.refine_recent_keyframes(n_keyframes=4, n_iterations=2,
                                       n_landmarks=256)
    assert out is not None
    q, t = out
    assert q.shape[1] == 4 and t.shape[1] == 3
    assert np.isfinite(t).all()
    # refined poses stay near the mapping poses (no divergence)
    kf_t = np.stack([k[1] for k in pipe._keyframes[-len(t):]])
    assert np.linalg.norm(t - kf_t, axis=1).max() < 1.0


def test_refinement_apply_recovers_corrupted_keyframes():
    """Closing the refinement loop: apply=True must rewrite the stored
    trajectory with the refined poses.  Gate: keyframes corrupted after
    the fact are pulled back toward their true (uncorrupted) poses by
    refining against the map's landmarks, and the pipeline keeps running
    continuously from the re-anchored odom→map correction."""
    cfg = PROFILES["hdl64-small"]
    world = World.urban(seed=19)
    pipe = Pipeline(cfg)
    frames = frames_for(cfg, world, 7)
    for f in frames[:6]:
        pipe.process_frame(*f)
    clean_traj = pipe.mapped_positions().copy()

    K = 4
    rng = np.random.default_rng(0)
    base = len(pipe._keyframes) - (K - 1)  # window keyframe 0 stays clean
    rows = []
    for i in range(K - 1):
        kf = pipe._keyframes[base + i]
        t_bad = (kf[1] + rng.uniform(-0.12, 0.12, 3)).astype(np.float32)
        pipe._keyframes[base + i] = (kf[0], t_bad, *kf[2:])
        pipe._map_trajectory[kf[4]] = t_bad
        rows.append(kf[4])
    corrupt_traj = pipe.mapped_positions().copy()

    out = pipe.refine_recent_keyframes(n_keyframes=K, n_iterations=4,
                                       n_landmarks=256, apply=True)
    assert out is not None
    refined_traj = pipe.mapped_positions()
    err_c = np.abs(corrupt_traj[rows] - clean_traj[rows]).mean(axis=0)
    err_r = np.abs(refined_traj[rows] - clean_traj[rows]).mean(axis=0)
    # total error must shrink...
    assert err_r.sum() < 0.8 * err_c.sum(), (err_r, err_c)
    # ...with the plane-observable axis (z, through the ground-dominated
    # landmark set) recovered almost fully.  x/y are weakly observable
    # through near-horizontal plane landmarks — a real BA observability
    # property, not a wiring defect; they must at least not degrade.
    assert err_r[2] < 0.2 * err_c[2], (err_r[2], err_c[2])
    assert err_r[0] < err_c[0] * 1.3 + 0.01
    assert err_r[1] < err_c[1] * 1.3 + 0.01

    # continuity: the pipeline keeps producing sane mapped poses from the
    # re-anchored correction
    r = pipe.process_frame(*frames[6])
    assert r.mapped and np.isfinite(r.map_t).all()
    assert np.linalg.norm(r.map_t - refined_traj[-1]) < 1.5
