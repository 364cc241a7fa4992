"""Aux subsystems: latent factors, checkpointing, evaluation, exports,
vote modes, TransformToEnd, map output accessors."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from light_loam_tpu.config import MappingConfig, OdometryConfig, ScanConfig
from light_loam_tpu.core import quaternion as quat
from light_loam_tpu.core.frame import PointCloud
from light_loam_tpu.solver import (
    DistanceFactors,
    EdgeScalarFactors,
    PlaneComponentFactors,
    distance_residuals,
    edge_scalar_residuals,
    plane_component_residuals,
)

from test_solver import autodiff_jacobian, rand_pose


def test_edge_scalar_jacobian():
    rng = np.random.default_rng(0)
    n = 16
    q, t = rand_pose(rng)
    f = EdgeScalarFactors(
        cp=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
        a=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
        b=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
        s=jnp.ones(n), weight=jnp.ones(n), mask=jnp.ones(n, bool),
    )
    _, J = edge_scalar_residuals(q, t, f)
    J_ad = autodiff_jacobian(edge_scalar_residuals, q, t, f)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=2e-4)


def test_plane_component_jacobian():
    rng = np.random.default_rng(1)
    n = 16
    q, t = rand_pose(rng)
    nv = rng.normal(size=(n, 3)).astype(np.float32)
    nv /= np.linalg.norm(nv, axis=1, keepdims=True)
    f = PlaneComponentFactors(
        cp=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
        j=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
        n=jnp.asarray(nv),
        s=jnp.ones(n), weight=jnp.ones(n), mask=jnp.ones(n, bool),
    )
    _, J = plane_component_residuals(q, t, f)
    J_ad = autodiff_jacobian(plane_component_residuals, q, t, f)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=2e-4)


def test_distance_jacobian():
    rng = np.random.default_rng(2)
    n = 8
    q, t = rand_pose(rng)
    f = DistanceFactors(
        cp=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
        target=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
        weight=jnp.ones(n), mask=jnp.ones(n, bool),
    )
    _, J = distance_residuals(q, t, f)
    J_ad = autodiff_jacobian(distance_residuals, q, t, f)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=2e-4)


def test_transform_to_end_roundtrip():
    from light_loam_tpu.models.odometry import transform_to_end

    rng = np.random.default_rng(3)
    q, t = rand_pose(rng, scale_r=0.1, scale_t=0.5)
    pc = PointCloud(
        xyz=jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32) * 10),
        rel=jnp.asarray((rng.integers(0, 16, 32) + 0.05).astype(np.float32)),
        mask=jnp.ones(32, bool),
    )
    out = transform_to_end(q, t, pc)
    # with s=1: end = q^-1((q p + t) - t) = p
    np.testing.assert_allclose(np.asarray(out.xyz), np.asarray(pc.xyz), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.rel), np.floor(np.asarray(pc.rel)))


def test_checkpoint_roundtrip(tmp_path):
    from light_loam_tpu.models.mapping import MappingState
    from light_loam_tpu.models.odometry import OdometryState
    from light_loam_tpu.utils.checkpoint import load_state, save_state

    mc = MappingConfig(map_corner_capacity=1024, map_surf_capacity=2048)
    odo = OdometryState.init(256, 512)
    odo = odo._replace(t_w=jnp.asarray([1.0, 2.0, 3.0]), frame=jnp.int32(7))
    mp = MappingState.init(mc)
    mp = mp._replace(t_wm=jnp.asarray([0.1, 0.2, 0.3]))

    path = str(tmp_path / "ckpt.npz")
    save_state(path, odo, mp, frame=7, extra={"note": 42})
    odo2, mp2, frame, extra = load_state(
        path, OdometryState.init(256, 512), MappingState.init(mc)
    )
    assert frame == 7
    assert int(extra["note"]) == 42
    np.testing.assert_allclose(np.asarray(odo2.t_w), [1, 2, 3])
    np.testing.assert_allclose(np.asarray(mp2.t_wm), [0.1, 0.2, 0.3])
    assert int(odo2.frame) == 7

    # shape mismatch must be detected
    import pytest
    with pytest.raises(ValueError):
        load_state(path, OdometryState.init(128, 512), MappingState.init(mc))


def test_kitti_relative_errors_perfect_and_scaled():
    from light_loam_tpu.io.evaluation import kitti_relative_errors

    # straight 1000 m trajectory, 1 m per frame
    n = 1000
    gt = np.tile(np.eye(4)[:3], (n, 1, 1))
    gt[:, 0, 3] = np.arange(n, dtype=float)
    est = gt.copy()
    e = kitti_relative_errors(est, gt)
    assert e.n_segments > 0
    assert e.t_err_percent < 1e-9

    # 2% scale error -> 2% translational drift
    est2 = gt.copy()
    est2[:, 0, 3] *= 0.98
    e2 = kitti_relative_errors(est2, gt)
    np.testing.assert_allclose(e2.t_err_percent, 2.0, atol=0.05)
    assert e2.r_err_deg_per_m < 1e-9


def test_ply_export(tmp_path):
    from light_loam_tpu.utils.export import write_ply, write_trajectory_ply

    xyz = np.random.default_rng(0).normal(size=(50, 3))
    mask = np.ones(50, bool); mask[40:] = False
    n = write_ply(str(tmp_path / "c.ply"), xyz, mask)
    assert n == 40
    head = open(tmp_path / "c.ply").read().splitlines()
    assert head[0] == "ply" and "element vertex 40" in head[2]

    n = write_trajectory_ply(str(tmp_path / "t.ply"), xyz[:10])
    assert n == 10


def test_rslidar_quat_remap_is_unit():
    from light_loam_tpu.models.mapping import rslidar_quat_remap

    rng = np.random.default_rng(4)
    q = rng.normal(size=(16, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    out = np.asarray(rslidar_quat_remap(jnp.asarray(q)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_map_output_accessors():
    from light_loam_tpu.models.mapping import (
        MappingState, full_map_cloud, mapping_step, register_cloud,
        surround_cloud,
    )
    from light_loam_tpu.utils.synthetic import World, simulate_scan

    mc = MappingConfig(
        map_corner_capacity=4096, map_surf_capacity=8192,
        local_corner_capacity=4096, local_surf_capacity=8192,
        stack_corner_capacity=512, stack_surf_capacity=2048, knn_tile=1024,
    )
    world = World.urban(seed=2)
    pts = simulate_scan(world, np.zeros(3), n_azimuth=400, seed=0)
    rng = np.random.default_rng(0)
    idx = rng.permutation(len(pts))

    def cloud(p, cap):
        xyz = np.zeros((cap, 3), np.float32); m = np.zeros(cap, bool)
        k = min(len(p), cap); xyz[:k] = p[:k]; m[:k] = True
        return PointCloud(jnp.asarray(xyz), jnp.zeros(cap), jnp.asarray(m))

    st = MappingState.init(mc)
    st, out = mapping_step(
        st, cloud(pts[idx[:300]], 512), cloud(pts[idx[300:1500]], 2048),
        quat.quat_identity(), jnp.zeros(3), mc,
    )
    sx, sm = surround_cloud(st, out.t_w, mc, capacity=8192)
    assert int(np.asarray(sm).sum()) > 100
    (cx, cm), (ux, um) = full_map_cloud(st)
    assert int(np.asarray(um).sum()) == int(out.map_surf_points)
    reg = register_cloud(out.q_w, out.t_w, jnp.asarray(pts[:10]))
    assert np.isfinite(np.asarray(reg)).all()


def test_vote_modes_run():
    from light_loam_tpu.models.odometry import OdometryState, odometry_step
    from light_loam_tpu.ops.features import extract_features
    from light_loam_tpu.utils.synthetic import World, simulate_scan, pad_cloud
    import dataclasses

    scfg = ScanConfig(n_scans=16, h_max=512, max_points=16384)
    world = World.urban(seed=3)

    def feats(x, seed):
        pts = simulate_scan(world, np.array([x, 0.0, 0.0]), n_rings=16,
                            lower_deg=-15, upper_deg=15, n_azimuth=450,
                            noise=0.01, seed=seed)
        xyz, mask = pad_cloud(pts, scfg.max_points)
        return extract_features(jnp.asarray(xyz), jnp.asarray(mask), scfg)

    for plane_mode, corner_mode in [("full", "off"), ("simple", "simple"),
                                    ("off", "full")]:
        ocfg = dataclasses.replace(
            OdometryConfig(outer_iterations=2, inner_iterations=3),
            plane_vote_mode=plane_mode, corner_vote_mode=corner_mode,
            vote_start_frame=1,
        )
        st = OdometryState.init(scfg.max_less_sharp, scfg.max_less_flat)
        for i in range(3):
            st, out = odometry_step(st, feats(0.3 * i, 10 + i), ocfg)
        t = np.asarray(out.t_w)
        assert np.isfinite(t).all()
        assert abs(t[0] - 0.6) < 0.3, f"{plane_mode}/{corner_mode}: {t}"


def test_html_viewer_roundtrip(tmp_path):
    """utils/html_viewer: the embedded base64 payload must decode back to
    the (masked, possibly subsampled) input points."""
    import base64
    import json
    import re

    from light_loam_tpu.utils.html_viewer import export_html

    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(500, 3)).astype(np.float32)
    mask = np.ones(500, bool)
    mask[400:] = False
    traj = np.cumsum(rng.normal(size=(20, 3)).astype(np.float32), axis=0)
    path = export_html(
        str(tmp_path / "v.html"),
        [("surf", xyz, mask)],
        [("trajectory", traj)],
        max_points=1000,
    )
    text = open(path).read()
    m = re.search(r"const P = (\{.*?\});\n", text, re.S)
    assert m, "payload not found in html"
    payload = json.loads(m.group(1))
    [cloud] = payload["clouds"]
    pts = np.frombuffer(base64.b64decode(cloud["b64"]), np.float32)
    np.testing.assert_array_equal(pts.reshape(-1, 3), xyz[:400])
    [p] = payload["paths"]
    back = np.frombuffer(base64.b64decode(p["b64"]), np.float32)
    np.testing.assert_array_equal(back.reshape(-1, 3), traj)
    # subsampling cap respected
    path2 = export_html(str(tmp_path / "v2.html"), [("surf", xyz, None)],
                        max_points=100)
    text2 = open(path2).read()
    payload2 = json.loads(re.search(r"const P = (\{.*?\});\n", text2,
                                    re.S).group(1))
    assert payload2["clouds"][0]["n"] == 100


def test_viz_renders(tmp_path):
    """utils/viz: PNG quick-looks render without a display (rviz parity)."""
    pytest.importorskip("matplotlib")
    from light_loam_tpu.models import pipeline as pl
    from light_loam_tpu.utils import viz

    pipe, results, truth = pl.run_synthetic(
        n_frames=4, profile="hdl64-small", n_azimuth=500, speed=0.5, seed=3
    )
    out = viz.render_pipeline(pipe, str(tmp_path / "viz"), gt=truth)
    assert (tmp_path / "viz_map.png").exists()
    # interactive HTML view exported alongside the PNGs
    assert (tmp_path / "viz_view.html").exists()
    # full-length mapped trajectory is exposed publicly
    mapped = pipe.mapped_positions()
    assert len(mapped) == sum(r.mapped for r in results)
    p = viz.plot_trajectories(
        str(tmp_path / "tr.png"),
        [("gt", truth), ("est", np.stack([r.odom_t for r in results]))],
    )
    assert (tmp_path / "tr.png").stat().st_size > 0


def test_live_viz_refreshes(tmp_path, monkeypatch):
    """--viz-every: the dashboard is re-rendered in place DURING the run
    (the live-view analog of an rviz session), not just at the end."""
    pytest.importorskip("matplotlib")
    from light_loam_tpu.models import pipeline as pl
    from light_loam_tpu.utils import viz

    calls = []
    real = viz.render_pipeline
    monkeypatch.setattr(
        viz, "render_pipeline",
        lambda pipe, prefix, gt=None: calls.append(prefix) or real(
            pipe, prefix, gt=gt),
    )
    pl.run_synthetic(
        n_frames=4, profile="hdl64-small", n_azimuth=500, speed=0.5,
        seed=3, viz_prefix=str(tmp_path / "live"), viz_every=2,
    )
    assert len(calls) == 2  # frames 2 and 4
    assert (tmp_path / "live_view.html").exists()
    assert (tmp_path / "live_map.png").exists()
