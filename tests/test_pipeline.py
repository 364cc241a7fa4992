import numpy as np
import pytest

from light_loam_tpu.models import pipeline as pl


@pytest.mark.slow
def test_pipeline_synthetic_end_to_end():
    pipe, results, truth = pl.run_synthetic(
        n_frames=6, profile="hdl64-small", n_azimuth=700, speed=0.6, seed=2
    )
    assert len(results) == 6
    # odometry should track the straight run
    err = np.linalg.norm(results[-1].odom_t - truth[-1])
    assert err < 0.35, f"odometry drift too high: {err} ({results[-1].odom_t})"
    # mapping ran and produced poses
    mapped = [r for r in results if r.mapped]
    assert len(mapped) >= 3
    err_map = np.linalg.norm(mapped[-1].map_t - truth[mapped[-1].frame])
    assert err_map < 0.5
    # timers collected all stages
    rep = pipe.timers.report()
    assert "features" in rep and "odometry" in rep


def test_kitti_pose_writer(tmp_path):
    from light_loam_tpu.io.kitti import KittiPoseWriter, read_gt_poses

    path = tmp_path / "traj.txt"
    w = KittiPoseWriter(str(path))
    rng = np.random.default_rng(0)

    def rand_R():
        A = rng.normal(size=(3, 3))
        q, _ = np.linalg.qr(A)
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        return q

    poses = [(rand_R(), rng.normal(size=3)) for _ in range(4)]
    for R, t in poses:
        w.write(R, t)

    out = read_gt_poses(str(path))
    assert out.shape == (4, 3, 4)
    # first pose must be identity (first-pose-relative)
    np.testing.assert_allclose(out[0], np.eye(4)[:3], atol=1e-5)
    # relative structure preserved: H0^-1 H1
    H0 = np.eye(4); H0[:3, :3], H0[:3, 3] = poses[0]
    H1 = np.eye(4); H1[:3, :3], H1[:3, 3] = poses[1]
    expect = (np.linalg.inv(H0) @ H1)[:3]
    np.testing.assert_allclose(out[1], expect, rtol=1e-4, atol=1e-5)


def test_kitti_bin_roundtrip(tmp_path):
    from light_loam_tpu.io.kitti import read_lidar_bin

    pts = np.random.default_rng(0).normal(size=(100, 4)).astype(np.float32)
    path = tmp_path / "000000.bin"
    pts.tofile(path)
    back = read_lidar_bin(str(path))
    np.testing.assert_array_equal(back, pts)


def test_gt_to_lidar_frame():
    from light_loam_tpu.io.kitti import gt_to_lidar_frame, R_CAM_TO_LIDAR

    gt = np.zeros((2, 3, 4))
    gt[:, :, :3] = np.eye(3)
    gt[0, :, 3] = [1.0, 2.0, 3.0]  # camera frame: x right, y down, z forward
    R, t = gt_to_lidar_frame(gt)
    # z_cam (forward) -> x_lidar; x_cam -> -y_lidar; y_cam -> -z_lidar
    np.testing.assert_allclose(t[0], [3.0, -1.0, -2.0])
    np.testing.assert_allclose(R[0], R_CAM_TO_LIDAR)


@pytest.mark.slow
def test_pipeline_tracks_through_turn():
    """Full pipeline (features -> odometry -> mapping) through a curved
    segment: straight, then a 20-degree heading change at 2.5 deg/frame,
    then straight again.  Exercises yaw tracking and scan-to-map
    refinement under rotation, which the straight-line e2e runs never do
    (cf. reference operating regime: KITTI sequences with turns)."""
    from light_loam_tpu.models.pipeline import Pipeline, PROFILES
    from light_loam_tpu.utils.synthetic import World, simulate_scan, pad_cloud

    cfg = PROFILES["hdl64-small"]
    pipe = Pipeline(cfg)
    world = World.urban(seed=11)

    step = 0.5
    pos = np.zeros(3)
    yaw = 0.0
    truth_t, truth_yaw, results = [], [], []
    for i in range(16):
        if 4 <= i < 12:
            yaw += np.radians(2.5)
        pts = simulate_scan(
            world, pos, sensor_yaw=yaw, n_rings=cfg.scan.n_scans,
            lower_deg=cfg.scan.lower_bound_deg,
            upper_deg=cfg.scan.upper_bound_deg,
            n_azimuth=600, noise=0.01, seed=300 + i,
        )
        xyz, mask = pad_cloud(pts, cfg.scan.max_points)
        results.append(pipe.process_frame(xyz, mask))
        truth_t.append(pos.copy())
        truth_yaw.append(yaw)
        pos = pos + step * np.array([np.cos(yaw), np.sin(yaw), 0.0])
    pipe._retire_mapping(wait=True)

    mapped = [r for r in results if r.mapped]
    assert len(mapped) >= 8
    last = mapped[-1]
    err_t = np.linalg.norm(last.map_t - truth_t[last.frame])
    assert err_t < 0.30, f"turn position err {err_t}: {last.map_t}"
    # mapped yaw: q = [x, y, z, w], rotation about z
    qz, qw = float(last.map_q[2]), float(last.map_q[3])
    yaw_est = 2.0 * np.arctan2(qz, qw)
    yaw_err = np.degrees(abs(yaw_est - truth_yaw[last.frame]))
    assert yaw_err < 1.5, f"turn yaw err {yaw_err} deg"


@pytest.mark.slow
def test_skip_frame_decimation():
    """OdometryConfig.skip_frame_num (the reference's mapping_skip_frame
    decimation, laserOdometry.cpp:898-919 + launch profiles): with skip=2
    mapping must run on every other frame only while odometry still
    tracks every frame."""
    import dataclasses

    from light_loam_tpu.models.pipeline import PROFILES, Pipeline
    from light_loam_tpu.utils.synthetic import World, simulate_scan, pad_cloud

    base = PROFILES["hdl64-small"]
    cfg = dataclasses.replace(
        base, odometry=dataclasses.replace(base.odometry, skip_frame_num=2)
    )
    pipe = Pipeline(cfg)
    world = World.urban(seed=2)
    results = []
    truth = []
    for i in range(6):
        pos = np.array([0.6 * i, 0.0, 0.0])
        pts = simulate_scan(
            world, pos, n_rings=cfg.scan.n_scans,
            lower_deg=cfg.scan.lower_bound_deg,
            upper_deg=cfg.scan.upper_bound_deg,
            n_azimuth=700, noise=0.01, seed=100 + i,
        )
        xyz, mask = pad_cloud(pts, cfg.scan.max_points)
        results.append(pipe.process_frame(xyz, mask))
        truth.append(pos)
    pipe._retire_mapping(wait=True)
    assert [r.frame for r in results if r.mapped] == [0, 2, 4]
    err = np.linalg.norm(results[-1].odom_t - truth[-1])
    assert err < 0.5, err
    # the trajectory writer sees one mapped pose per retired step
    _, mapped_t = pipe.mapped_trajectory()
    assert len(mapped_t) == 3
