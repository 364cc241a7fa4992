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
