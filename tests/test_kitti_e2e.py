"""End-to-end KITTI-layout integration: build a miniature dataset in the
reference's exact directory structure from synthetic scans, run the full
pipeline CLI path, and score the trajectory with the vendored metrics."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from light_loam_tpu.utils.synthetic import World, simulate_scan


@pytest.fixture(scope="module")
def mini_kitti(tmp_path_factory):
    """A 5-frame 'sequence 99' in kittiHelper layout (kittiHelper.cpp:65-130):
    sequences/99/times.txt, velodyne/sequences/99/velodyne/NNNNNN.bin,
    results/99.txt (camera-frame GT)."""
    root = tmp_path_factory.mktemp("kitti")
    seq_dir = root / "sequences" / "99"
    vel_dir = root / "velodyne" / "sequences" / "99" / "velodyne"
    res_dir = root / "results"
    for d in (seq_dir, vel_dir, res_dir):
        os.makedirs(d, exist_ok=True)

    world = World.urban(seed=7)
    n = 5
    times, gt_rows = [], []
    for i in range(n):
        pos = np.array([0.5 * i, 0.0, 0.0])
        pts = simulate_scan(world, pos, n_azimuth=700, noise=0.01, seed=i)
        rec = np.zeros((len(pts), 4), np.float32)
        rec[:, :3] = pts
        rec.tofile(vel_dir / f"{i:06d}.bin")
        times.append(0.1 * i)
        # camera-frame GT: lidar x-forward maps to camera z-forward
        H = np.eye(4)
        H[:3, 3] = [0.0, 0.0, pos[0]]  # camera z = lidar x
        gt_rows.append(H[:3].reshape(-1))
    np.savetxt(seq_dir / "times.txt", np.asarray(times), fmt="%.6f")
    np.savetxt(res_dir / "99.txt", np.asarray(gt_rows), fmt="%.6e")
    return str(root)


def test_kitti_sequence_reader(mini_kitti):
    from light_loam_tpu.io.kitti import KittiSequence

    seq = KittiSequence(mini_kitti, "99")
    assert len(seq) == 5
    assert seq.gt is not None and seq.gt.shape == (5, 3, 4)
    ts, pts = next(iter(seq))
    assert pts.shape[1] == 4 and len(pts) > 1000

    frames = list(seq.padded_frames(capacity=65536))
    assert len(frames) == 5
    _, xyz, mask = frames[0]
    assert xyz.shape == (65536, 3) and mask.sum() == len(pts)
    np.testing.assert_allclose(xyz[: len(pts)], pts[:, :3], atol=1e-6)


def test_padded_frames_surfaces_reader_errors(tmp_path):
    """A missing/unreadable .bin must raise in the consumer, not strand it
    on q.get() forever after the reader thread dies (io/kitti.py worker
    ships the exception as the queue sentinel)."""
    from light_loam_tpu.io.kitti import KittiSequence

    seq_dir = tmp_path / "sequences" / "99"
    vel_dir = tmp_path / "velodyne" / "sequences" / "99" / "velodyne"
    os.makedirs(seq_dir), os.makedirs(vel_dir)
    np.savetxt(seq_dir / "times.txt", np.array([0.0, 0.1, 0.2]), fmt="%.6f")
    for i in range(2):  # frame 2's .bin is missing
        rec = np.zeros((100, 4), np.float32)
        rec[:, 0] = np.arange(100) + 1.0
        rec.tofile(vel_dir / f"{i:06d}.bin")

    seq = KittiSequence(str(tmp_path), "99")
    got = []
    with pytest.raises(FileNotFoundError):
        for item in seq.padded_frames(capacity=256):
            got.append(item)
    assert len(got) == 2  # both real frames arrived before the error


@pytest.mark.slow
def test_run_kitti_end_to_end(mini_kitti, tmp_path):
    from light_loam_tpu.io.evaluation import ate_rmse
    from light_loam_tpu.io.kitti import gt_to_lidar_frame, read_gt_poses
    from light_loam_tpu.models.pipeline import run_kitti

    result = str(tmp_path / "traj_99.txt")
    pipe = run_kitti(mini_kitti, "99", result, profile="hdl64")
    assert os.path.exists(result)

    est = read_gt_poses(result)
    assert est.shape == (5, 3, 4)
    np.testing.assert_allclose(est[0], np.eye(4)[:3], atol=1e-6)

    # ground truth (camera frame) -> lidar frame, first-pose-relative
    gt_cam = read_gt_poses(os.path.join(mini_kitti, "results", "99.txt"))
    R, t = gt_to_lidar_frame(gt_cam)
    gt = np.concatenate([R, t[:, :, None]], axis=2)

    err = ate_rmse(est, gt)
    assert err < 0.30, f"ATE too high on mini sequence: {err}"


@pytest.mark.slow
def test_run_kitti_chunked_replay(mini_kitti, tmp_path):
    """Offline chunked replay (run_kitti(chunk_size=3) → lax.scan over 3
    frames per dispatch, models/fused.run_chunked): 5 frames = one full
    chunk + one tail chunk padded with an empty frame, whose output rows
    must be trimmed — the file gets exactly one row per input frame and
    tracks like the per-frame path."""
    from light_loam_tpu.io.evaluation import ate_rmse
    from light_loam_tpu.io.kitti import gt_to_lidar_frame, read_gt_poses
    from light_loam_tpu.models.pipeline import run_kitti

    result = str(tmp_path / "traj_99_chunked.txt")
    outs = run_kitti(mini_kitti, "99", result, profile="hdl64",
                     chunk_size=3)
    assert os.path.exists(result)
    assert not np.asarray(outs.diverged).any()

    est = read_gt_poses(result)
    assert est.shape == (5, 3, 4)
    np.testing.assert_allclose(est[0], np.eye(4)[:3], atol=1e-6)

    gt_cam = read_gt_poses(os.path.join(mini_kitti, "results", "99.txt"))
    R, t = gt_to_lidar_frame(gt_cam)
    gt = np.concatenate([R, t[:, :, None]], axis=2)
    err = ate_rmse(est, gt)
    assert err < 0.30, f"chunked replay ATE too high: {err}"


def test_checkpoint_resume_continuity(tmp_path):
    """Resuming from a snapshot must reproduce the uninterrupted run."""
    from light_loam_tpu.models.pipeline import Pipeline, PROFILES
    from light_loam_tpu.utils.synthetic import World, simulate_scan, pad_cloud

    cfg = PROFILES["hdl64-small"]
    world = World.urban(seed=8)

    def frame(i):
        pts = simulate_scan(world, np.array([0.4 * i, 0, 0]), n_azimuth=500,
                            noise=0.01, seed=i)
        return pad_cloud(pts, cfg.scan.max_points)

    a = Pipeline(cfg)
    for i in range(3):
        ra = a.process_frame(*frame(i))
    ckpt = str(tmp_path / "mid.npz")
    a.save(ckpt)
    ra3 = a.process_frame(*frame(3))

    b = Pipeline(cfg)
    b.load(ckpt)
    rb3 = b.process_frame(*frame(3))
    np.testing.assert_allclose(rb3.odom_t, ra3.odom_t, atol=1e-5)
    np.testing.assert_allclose(rb3.odom_q, ra3.odom_q, atol=1e-5)
    # mapped-pose history survives the snapshot (viz/trajectory parity)
    ta, tb = a.mapped_positions(), b.mapped_positions()
    assert len(tb) == len(ta)
    np.testing.assert_allclose(tb, ta, atol=1e-5)
