import numpy as np
import jax
import jax.numpy as jnp
import pytest

from light_loam_tpu.config import ScanConfig, OdometryConfig
from light_loam_tpu.models.odometry import OdometryState, odometry_step
from light_loam_tpu.ops.features import extract_features
from light_loam_tpu.utils.synthetic import World, simulate_scan, pad_cloud

CFG = ScanConfig(n_scans=64, h_max=1024, max_points=65536)
# reference solve schedule (3x4) keeps CPU test time down; the deeper
# default schedule is covered by the e2e/pipeline tests
OCFG = OdometryConfig(outer_iterations=3, inner_iterations=4)


def make_feats(world, pos, yaw=0.0, seed=0):
    pts = simulate_scan(world, np.asarray(pos, float), sensor_yaw=yaw,
                        n_azimuth=900, noise=0.005, seed=seed)
    xyz, mask = pad_cloud(pts, CFG.max_points)
    return extract_features(jnp.asarray(xyz), jnp.asarray(mask), CFG)


@pytest.fixture(scope="module")
def odo_world():
    return World.urban(seed=5)


def test_odometry_recovers_translation(odo_world):
    state = OdometryState.init(CFG.max_less_sharp, CFG.max_less_flat)
    f0 = make_feats(odo_world, [0.0, 0.0, 0.0], seed=1)
    f1 = make_feats(odo_world, [0.6, 0.0, 0.0], seed=2)

    state, out0 = odometry_step(state, f0, OCFG)
    np.testing.assert_allclose(np.asarray(out0.t_w), np.zeros(3), atol=1e-6)

    state, out1 = odometry_step(state, f1, OCFG)
    t = np.asarray(out1.t_w)
    assert int(out1.corner_count) > 50
    assert int(out1.plane_count) > 200
    np.testing.assert_allclose(t, [0.6, 0.0, 0.0], atol=0.08)
    # rotation should stay near identity
    qw = abs(float(out1.q_w[3]))
    assert qw > 0.9999


def test_odometry_tracks_multi_frame(odo_world):
    state = OdometryState.init(CFG.max_less_sharp, CFG.max_less_flat)
    poses = [
        ([0.0, 0.0, 0.0], 0.00),
        ([0.7, 0.0, 0.0], 0.00),
        ([1.4, 0.05, 0.0], 0.01),
        ([2.1, 0.15, 0.0], 0.02),
    ]
    outs = []
    for i, (pos, yaw) in enumerate(poses):
        f = make_feats(odo_world, pos, yaw=yaw, seed=10 + i)
        state, out = odometry_step(state, f, OCFG)
        outs.append(out)

    t_final = np.asarray(outs[-1].t_w)
    expect = np.asarray(poses[-1][0])
    err = np.linalg.norm(t_final - expect)
    assert err < 0.15, f"trajectory error {err}: {t_final} vs {expect}"
    # yaw estimate: q_w ≈ rotation about z by 0.02
    qz = float(outs[-1].q_w[2])
    assert abs(2 * qz - 0.02) < 0.02


def test_odometry_warm_start_persists(odo_world):
    state = OdometryState.init(CFG.max_less_sharp, CFG.max_less_flat)
    f0 = make_feats(odo_world, [0.0, 0.0, 0.0], seed=20)
    f1 = make_feats(odo_world, [0.5, 0.0, 0.0], seed=21)
    state, _ = odometry_step(state, f0, OCFG)
    state, _ = odometry_step(state, f1, OCFG)
    # warm start should carry the last increment
    t_lc = np.asarray(state.t_lc)
    np.testing.assert_allclose(t_lc, [0.5, 0, 0], atol=0.08)
    assert int(state.frame) == 2
