"""Back-pressure (frame-drop) path under a genuinely slow mapping step.

The reference sheds load by draining its mapping backlog
(laserMapping.cpp:1571-1575); the pipeline analog is: with
sync_mapping=False, a frame whose mapping step is still in flight is
dropped for mapping while odometry continues.  CPU tests retire mapping
instantly, so this exercises the drop logic by wrapping mapping_step's
output in a proxy whose readiness is released only after N further
frames — the drop/retire bookkeeping is the subject, not the mapping
math (which has its own tests)."""

import dataclasses

import numpy as np

import light_loam_tpu.models.pipeline as pl
from light_loam_tpu.models.pipeline import Pipeline, PROFILES
from light_loam_tpu.utils.synthetic import World, simulate_scan, pad_cloud


class _SlowLeaf:
    """Wraps the pose leaf of a mapping output; is_ready() stays False
    until release() is called (then defers to the real array)."""

    def __init__(self, arr):
        self._arr = arr
        self._released = False

    def release(self):
        self._released = True

    def is_ready(self):
        return self._released and (
            self._arr.is_ready() if hasattr(self._arr, "is_ready") else True
        )

    def __array__(self, dtype=None):
        return np.asarray(self._arr, dtype=dtype)

    def __getattr__(self, name):
        return getattr(self._arr, name)


def test_slow_mapping_drops_frames_and_keeps_trajectory_exact(monkeypatch):
    cfg = dataclasses.replace(PROFILES["hdl64-small"], sync_mapping=False)
    world = World.urban(seed=17)

    real_step = pl.mapping_step
    pending_leaves = []
    dispatched_poses = []

    def slow_mapping_step(*args, **kwargs):
        state, out = real_step(*args, **kwargs)
        leaf = _SlowLeaf(out.t_w)
        pending_leaves.append(leaf)
        dispatched_poses.append(np.asarray(out.t_w).copy())
        return state, out._replace(t_w=leaf)

    monkeypatch.setattr(pl, "mapping_step", slow_mapping_step)

    pipe = Pipeline(cfg)
    n_frames = 9
    for i in range(n_frames):
        if i > 0 and i % 3 == 0:
            # the in-flight step finishes every third frame; the two
            # frames in between arrive while mapping is busy
            for leaf in pending_leaves:
                leaf.release()
        pts = simulate_scan(world, np.array([0.5 * i, 0, 0]), n_azimuth=500,
                            noise=0.01, seed=70 + i)
        xyz, mask = pad_cloud(pts, cfg.scan.max_points)
        pipe.process_frame(xyz, mask)

    # frames arriving while mapping is busy must be dropped, not queued
    assert pipe.dropped_mapping_frames > 0
    n_mapped = len(dispatched_poses)
    assert n_mapped < n_frames
    assert pipe.dropped_mapping_frames == n_frames - n_mapped

    # the recorded mapped trajectory is exactly the retired steps' own
    # poses, in order — no off-by-one, no stale dispatch-time poses —
    # and mapped_positions() flushes the in-flight step
    for leaf in pending_leaves:
        leaf.release()
    traj = pipe.mapped_positions()
    assert traj.shape == (n_mapped, 3)
    np.testing.assert_allclose(traj, np.stack(dispatched_poses), atol=0)

    # mapped_trajectory (the RESULT_PATH source) matches row-for-row
    qs, ts = pipe.mapped_trajectory()
    assert len(qs) == n_mapped and len(ts) == n_mapped
    np.testing.assert_allclose(ts, traj, atol=0)

    # odometry kept running across the drops
    assert pipe.frame == n_frames
    assert pipe.diverged_frames == 0

    # keyframes buffer at RETIREMENT: each stored keyframe carries the
    # retired step's own mapped pose and a unique trajectory row index
    # (buffering at dispatch paired the current cloud with the previous
    # retired pose and duplicated traj indices under drops)
    assert len(pipe._keyframes) == n_mapped
    idxs = [kf[4] for kf in pipe._keyframes]
    assert idxs == list(range(n_mapped)), idxs
    for kf in pipe._keyframes:
        np.testing.assert_allclose(kf[1], traj[kf[4]], atol=0)
        assert np.isfinite(kf[5]).all() and np.isfinite(kf[6]).all()


def test_sync_mode_never_drops():
    cfg = PROFILES["hdl64-small"]  # sync_mapping=True default
    world = World.urban(seed=18)
    pipe = Pipeline(cfg)
    for i in range(4):
        pts = simulate_scan(world, np.array([0.5 * i, 0, 0]), n_azimuth=500,
                            noise=0.01, seed=80 + i)
        xyz, mask = pad_cloud(pts, cfg.scan.max_points)
        r = pipe.process_frame(xyz, mask)
        assert r.mapped
    assert pipe.dropped_mapping_frames == 0
    assert pipe.mapped_positions().shape == (4, 3)


def test_async_no_drop_waits_instead(monkeypatch):
    """drop_mapping_backlog=False turns the drop policy into wait-for-
    retirement: async dispatch, but no frame is ever shed (the reference
    without its backlog drain — every accepted frame is mapped)."""
    cfg = dataclasses.replace(
        PROFILES["hdl64-small"], sync_mapping=False,
        drop_mapping_backlog=False,
    )
    world = World.urban(seed=17)

    real_step = pl.mapping_step
    pending_leaves = []

    def slow_mapping_step(*args, **kwargs):
        state, out = real_step(*args, **kwargs)
        leaf = _SlowLeaf(out.t_w)
        pending_leaves.append(leaf)
        return state, out._replace(t_w=leaf)

    monkeypatch.setattr(pl, "mapping_step", slow_mapping_step)

    pipe = Pipeline(cfg)
    n_frames = 6
    for i in range(n_frames):
        # leaves are never released: every dispatch would look "busy"
        # under the drop policy, so this proves the wait path
        pts = simulate_scan(world, np.array([0.5 * i, 0, 0]), n_azimuth=500,
                            noise=0.01, seed=70 + i)
        xyz, mask = pad_cloud(pts, cfg.scan.max_points)
        pipe.process_frame(xyz, mask)
    pipe._retire_mapping(wait=True)

    assert pipe.dropped_mapping_frames == 0
    assert len(pending_leaves) == n_frames
    assert pipe.mapped_positions().shape == (n_frames, 3)
