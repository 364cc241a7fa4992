"""Sparse-sensor profiles (VLP-16 / HDL-32) end-to-end — the reference's
alternate launch configurations (launch/aloam_velodyne_VLP_16.launch,
launch/aloam_velodyne_HDL_32.launch)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from light_loam_tpu.config import VLP16, HDL32, ScanConfig
from light_loam_tpu.models.odometry import OdometryState, odometry_step
from light_loam_tpu.ops.features import extract_features
from light_loam_tpu.utils.synthetic import World, simulate_scan, pad_cloud


@pytest.mark.parametrize(
    "profile,n_rings,lo,hi",
    [(VLP16, 16, -15.0, 15.0), (HDL32, 32, -30.0, 10.0)],
)
def test_sparse_profile_tracks(profile, n_rings, lo, hi):
    # smaller shapes keep CPU compile cheap; semantics identical
    scan_cfg = dataclasses.replace(
        profile.scan, h_max=512, max_points=32768
    )
    ocfg = dataclasses.replace(
        profile.odometry, outer_iterations=3, inner_iterations=4
    )
    world = World.urban(seed=6)
    state = OdometryState.init(scan_cfg.max_less_sharp, scan_cfg.max_less_flat)
    for i in range(3):
        pts = simulate_scan(
            world, np.array([0.5 * i, 0.0, 0.0]), n_rings=n_rings,
            lower_deg=lo, upper_deg=hi, n_azimuth=500, noise=0.01,
            seed=40 + i,
        )
        xyz, mask = pad_cloud(pts, scan_cfg.max_points)
        feats = extract_features(jnp.asarray(xyz), jnp.asarray(mask), scan_cfg)
        state, out = odometry_step(state, feats, ocfg)
    t = np.asarray(out.t_w)
    err = np.linalg.norm(t - [1.0, 0, 0])
    assert err < 0.25, f"{n_rings}-ring drift too high: {t}"
    assert int(out.corner_count) > 20
    assert int(out.plane_count) > 80


def test_m2dgr_ring_formula():
    """M2DGR VLP-32C recipe: linear bound formula over [-25, 15] replaces
    the hardcoded 32-beam one (paramter_configuration_for_benchmarks.txt:
    30-37)."""
    from light_loam_tpu.config import M2DGR_VLP32C
    from light_loam_tpu.ops.features import compute_ring_ids

    cfg = M2DGR_VLP32C.scan
    assert cfg.ring_formula == "bounds"

    # Points at exact beam elevations land on their ring index.
    angles = np.linspace(-25.0, 15.0, 32)
    r = 10.0
    xyz = np.stack(
        [
            r * np.cos(np.radians(angles)),
            np.zeros_like(angles),
            r * np.sin(np.radians(angles)),
        ],
        axis=1,
    ).astype(np.float32)
    mask = np.ones(len(angles), bool)
    ring, ok = compute_ring_ids(jnp.asarray(xyz), jnp.asarray(mask), cfg)
    np.testing.assert_array_equal(np.asarray(ring), np.arange(32))
    assert np.asarray(ok).all()

    # Same geometry through the plain HDL32 profile gives the hardcoded
    # formula (different binning at the extremes — out-of-range culled).
    ring32, ok32 = compute_ring_ids(jnp.asarray(xyz), jnp.asarray(mask),
                                    HDL32.scan)
    assert not np.array_equal(np.asarray(ring32), np.arange(32))


def test_m2dgr_profile_tracks():
    """M2DGR profile end-to-end feature extraction + odometry."""
    from light_loam_tpu.config import M2DGR_VLP32C

    scan_cfg = dataclasses.replace(
        M2DGR_VLP32C.scan, h_max=512, max_points=32768
    )
    ocfg = dataclasses.replace(
        M2DGR_VLP32C.odometry, outer_iterations=3, inner_iterations=4
    )
    world = World.urban(seed=6)
    state = OdometryState.init(scan_cfg.max_less_sharp, scan_cfg.max_less_flat)
    for i in range(3):
        pts = simulate_scan(
            world, np.array([0.5 * i, 0.0, 0.0]), n_rings=32,
            lower_deg=-25.0, upper_deg=15.0, n_azimuth=500, noise=0.01,
            seed=70 + i,
        )
        xyz, mask = pad_cloud(pts, scan_cfg.max_points)
        feats = extract_features(jnp.asarray(xyz), jnp.asarray(mask), scan_cfg)
        state, out = odometry_step(state, feats, ocfg)
    t = np.asarray(out.t_w)
    err = np.linalg.norm(t - [1.0, 0, 0])
    assert err < 0.25, f"M2DGR drift too high: {t}"
    assert int(out.corner_count) > 20
    assert int(out.plane_count) > 80


def test_ring_formula_validated():
    with pytest.raises(ValueError, match="ring_formula"):
        ScanConfig(ring_formula="bound")
