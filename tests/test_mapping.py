import numpy as np
import jax.numpy as jnp
import pytest

from light_loam_tpu.config import MappingConfig
from light_loam_tpu.core.frame import PointCloud
from light_loam_tpu.core import quaternion as quat
from light_loam_tpu.models.mapping import (
    MappingState,
    mapping_step,
    _recenter,
    MapStore,
    _cube_of,
    _cell_linear,
)
from light_loam_tpu.utils.synthetic import World, simulate_scan

# small capacities keep the CPU test fast
CFG = MappingConfig(
    map_corner_capacity=16384,
    map_surf_capacity=32768,
    local_corner_capacity=8192,
    local_surf_capacity=16384,
    stack_corner_capacity=1024,
    stack_surf_capacity=4096,
    knn_tile=2048,
)


def features_from_scan(pts, rng, n_corner=900, n_surf=4000):
    """Crude stand-in feature split: poles/edges vs ground/walls is not
    needed — mapping only needs geometrically consistent clouds, so sample
    random subsets as 'corner' and 'surf'."""
    idx = rng.permutation(len(pts))
    corner = pts[idx[:n_corner]]
    surf = pts[idx[n_corner : n_corner + n_surf]]

    def as_cloud(p, cap):
        xyz = np.zeros((cap, 3), np.float32)
        mask = np.zeros(cap, bool)
        n = min(len(p), cap)
        xyz[:n] = p[:n]
        mask[:n] = True
        return PointCloud(xyz=jnp.asarray(xyz), rel=jnp.zeros(cap),
                          mask=jnp.asarray(mask))

    return as_cloud(corner, 1024), as_cloud(surf, 4096)


@pytest.fixture(scope="module")
def map_world():
    from light_loam_tpu.utils.synthetic import Box

    w = World.urban(seed=9)
    # a few close-in structures so one frame's map constrains all 6 dof
    w.boxes.append(Box(center=np.array([8.0, 8.0, 1.0]),
                       half=np.array([2.0, 2.0, 3.0]), yaw=0.3))
    w.boxes.append(Box(center=np.array([-6.0, -8.0, 0.0]),
                       half=np.array([1.5, 3.0, 2.5]), yaw=-0.4))
    w.boxes.append(Box(center=np.array([12.0, -7.0, 2.0]),
                       half=np.array([3.0, 1.5, 4.0]), yaw=0.1))
    return w


def test_mapping_accumulates_and_refines(map_world):
    rng = np.random.default_rng(0)
    state = MappingState.init(CFG)

    # frame 0 at origin, odometry exact
    pts0 = simulate_scan(map_world, np.zeros(3), n_azimuth=1100, noise=0.005, seed=1)
    c0, s0 = features_from_scan(pts0, rng)
    state, out0 = mapping_step(state, c0, s0, quat.quat_identity(), jnp.zeros(3), CFG)
    assert int(out0.map_surf_points) > 1000
    np.testing.assert_allclose(np.asarray(out0.t_w), np.zeros(3), atol=1e-5)

    # frame 1: sensor at x=0.5 but odometry reports a slightly wrong pose;
    # scan-to-map should pull it back toward truth
    true_t = np.array([0.5, 0.0, 0.0], np.float32)
    pts1 = simulate_scan(map_world, true_t.astype(float), n_azimuth=1100,
                         noise=0.005, seed=2)
    c1, s1 = features_from_scan(pts1, rng)
    bad_odom_t = jnp.asarray(true_t + np.array([0.15, -0.1, 0.05], np.float32))
    state, out1 = mapping_step(state, c1, s1, quat.quat_identity(), bad_odom_t, CFG)

    t1 = np.asarray(out1.t_w)
    err_refined = np.linalg.norm(t1 - true_t)
    err_odom = np.linalg.norm(np.asarray(bad_odom_t) - true_t)
    assert int(out1.surf_factors) > 150
    assert err_refined < 0.6 * err_odom, (
        f"refinement did not improve: {err_refined} vs odom {err_odom}"
    )
    # wmap_wodom correction should now be non-trivial
    assert np.linalg.norm(np.asarray(state.t_wm)) > 0.01


def test_mapping_map_grows_and_dedups(map_world):
    rng = np.random.default_rng(3)
    state = MappingState.init(CFG)
    counts = []
    for k in range(3):
        pts = simulate_scan(map_world, np.array([0.4 * k, 0.0, 0.0]),
                            n_azimuth=500, noise=0.005, seed=10 + k)
        c, s = features_from_scan(pts, rng)
        state, out = mapping_step(
            state, c, s, quat.quat_identity(),
            jnp.asarray(np.array([0.4 * k, 0, 0], np.float32)), CFG,
        )
        counts.append(int(out.map_surf_points))
    assert counts[1] > counts[0]
    # dedup keeps growth sublinear vs naive concat
    assert counts[2] < counts[0] * 3


def _wall_outlier_points(world, n, rng, snap=1.8):
    """Points floating ``snap`` m off the faces of the close-in boxes:
    they pass the (widened) 5-NN gate and the plane-fit gate — the gates
    check the *neighbours*' planarity, not the query point — but their
    matched 5-NN centroid sits on the wall, a horizontal multi-metre
    association snap the vote's pairwise-distance test can see."""
    pts = []
    boxes = world.boxes[-3:]
    normals = [np.array([1.0, 0, 0]), np.array([-1.0, 0, 0]),
               np.array([0, 1.0, 0]), np.array([0, -1.0, 0])]
    for _ in range(n):
        b = boxes[rng.integers(0, 3)]
        c, s = np.cos(b.yaw), np.sin(b.yaw)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        nrm = normals[rng.integers(0, 4)]
        p_local = b.half * nrm + nrm * snap
        tang = rng.uniform(-0.8, 0.8, 2)
        if abs(nrm[0]) > 0:
            p_local += np.array([0, tang[0] * b.half[1], tang[1] * b.half[2]])
        else:
            p_local += np.array([tang[0] * b.half[0], 0, tang[1] * b.half[2]])
        pts.append(b.center + R @ p_local)
    return np.asarray(pts, np.float32)


def test_mapping_vote_filters_association_outliers(map_world):
    """Scan-to-map graph vote (the latent laserMapping.cpp:2057-2072 path):
    injected points whose nearest-map association snaps ~2 m sideways must
    be rejected at a much higher rate than true surface points, and the
    wired mapping_step must show the reduced factor count."""
    import dataclasses

    from light_loam_tpu.models.mapping import (
        _gather_local, _recenter, plane_fit_factors,
    )
    from light_loam_tpu.ops import graphvote, knn
    from light_loam_tpu.ops.voxel import voxel_downsample

    # widened 5-NN gate lets the snapped associations through (the default
    # 1 m² gate would mask the outliers before the vote can see them);
    # finer map leaf keeps the inlier centroids tight
    cfg = dataclasses.replace(
        CFG, knn_sq_gate=9.0, plane_resolution=0.4,
        vote_mode="simple", vote_start_frame=0,
    )
    cfg_off = dataclasses.replace(cfg, vote_mode="off")

    def build(cfg):
        state = MappingState.init(cfg)
        pts0 = simulate_scan(map_world, np.zeros(3), n_azimuth=1100,
                             noise=0.005, seed=21)
        c0, s0 = features_from_scan(pts0, np.random.default_rng(7))
        state, _ = mapping_step(state, c0, s0, quat.quat_identity(),
                                jnp.zeros(3), cfg)
        true_t = np.array([0.4, 0.0, 0.0], np.float32)
        pts1 = simulate_scan(map_world, true_t.astype(float), n_azimuth=1100,
                             noise=0.005, seed=22)
        c1, s1 = features_from_scan(pts1, np.random.default_rng(8))
        xyz = np.asarray(s1.xyz).copy()
        n_valid = int(np.asarray(s1.mask).sum())
        rng = np.random.default_rng(9)
        slots = rng.choice(n_valid, size=n_valid // 12, replace=False)
        xyz[slots] = _wall_outlier_points(map_world, len(slots), rng) - true_t
        s1 = PointCloud(xyz=jnp.asarray(xyz), rel=s1.rel, mask=s1.mask)
        return state, c1, s1, true_t, xyz[slots]

    # wiring check through mapping_step itself: vote mode must shrink the
    # factor count used by the solve
    state, c1, s1, true_t, out_pts = build(cfg_off)
    _, out_off = mapping_step(state, c1, s1, quat.quat_identity(),
                              jnp.asarray(true_t), cfg_off)
    state, c1, s1, true_t, out_pts = build(cfg)
    _, out_vote = mapping_step(state, c1, s1, quat.quat_identity(),
                               jnp.asarray(true_t), cfg)
    assert int(out_vote.surf_factors) < int(out_off.surf_factors) - 20

    # per-point discrimination: replicate the step's association to label
    # each factor as injected-outlier vs true surface point
    q_w, t_w = quat.quat_identity(), jnp.asarray(true_t)
    _, surf_store, cen, center = _recenter(state, t_w, cfg)
    ls_xyz, ls_mask, _ = _gather_local(
        surf_store, center, cfg, cfg.local_surf_capacity
    )
    st_xyz, _, st_mask, _ = voxel_downsample(
        s1.xyz, s1.rel, s1.mask, cfg.plane_resolution,
        cfg.stack_surf_capacity,
    )
    st = np.asarray(st_xyz)
    d2out = np.min(
        np.sum((st[:, None, :] - out_pts[None, :, :]) ** 2, axis=-1), axis=1
    )
    is_out = (d2out < 0.09) & np.asarray(st_mask)
    p_sel = quat.quat_rotate(q_w[None, :], st_xyz) + t_w[None, :]
    d, idx = knn.knn_tiled(p_sel, ls_xyz, ls_mask, k=cfg.knn_k,
                           tile=cfg.knn_tile)
    near = ls_xyz[idx]
    pf = plane_fit_factors(st_xyz, st_mask, d, near, cfg)
    pm = np.asarray(pf.mask)
    chunk_cap = cfg.stack_surf_capacity // cfg.vote_regions + cfg.vote_regions
    sel, _w = graphvote.run_vote(
        "simple", st_xyz, jnp.mean(near, axis=1), pf.mask,
        n_regions=cfg.vote_regions, chunk_capacity=chunk_cap,
    )
    sel = np.asarray(sel)
    n_out, n_in = (pm & is_out).sum(), (pm & ~is_out).sum()
    assert n_out > 50, "scenario failed to produce outlier factors"
    kept_out = (sel & pm & is_out).sum() / n_out
    kept_in = (sel & pm & ~is_out).sum() / n_in
    # outliers must be rejected at a clearly higher rate than inliers
    assert kept_in > 0.85, kept_in
    assert kept_out < kept_in - 0.15, (kept_out, kept_in)

    # vote_apply_weights extension (opt-in; the latent reference code is
    # selection-only): the weighted solve must run, keep the same factor
    # population as selection-only, and still register near the truth
    cfg_w = dataclasses.replace(cfg, vote_apply_weights=True)
    _, out_w = mapping_step(state, c1, s1, quat.quat_identity(),
                            jnp.asarray(true_t), cfg_w)
    # same selection; re-association from the re-weighted intermediate
    # pose may flip a handful of borderline gates between outer iterations
    assert abs(int(out_w.surf_factors) - int(out_vote.surf_factors)) <= 10
    t_err = float(np.linalg.norm(np.asarray(out_w.t_w) - true_t))
    assert np.isfinite(np.asarray(out_w.t_w)).all()
    assert t_err < 0.2, t_err


def test_mapping_vote_start_frame_gates():
    """Before vote_start_frame the vote must be inert: identical factor
    counts and pose to vote_mode='off'."""
    import dataclasses

    w = World.urban(seed=9)
    gated = dataclasses.replace(CFG, vote_mode="simple", vote_start_frame=10)

    def run(cfg):
        state = MappingState.init(cfg)
        outs = []
        for k in range(2):
            pts = simulate_scan(w, np.array([0.3 * k, 0.0, 0.0]),
                                n_azimuth=700, noise=0.005, seed=31 + k)
            c, s = features_from_scan(pts, np.random.default_rng(4))
            state, out = mapping_step(
                state, c, s, quat.quat_identity(),
                jnp.asarray(np.array([0.3 * k, 0, 0], np.float32)), cfg,
            )
            outs.append(out)
        return outs

    outs_off = run(CFG)
    outs_gated = run(gated)
    for a, b in zip(outs_off, outs_gated):
        assert int(a.surf_factors) == int(b.surf_factors)
        np.testing.assert_allclose(
            np.asarray(a.t_w), np.asarray(b.t_w), atol=1e-7
        )


def test_recenter_shifts_cells():
    cfg = CFG
    state = MappingState.init(cfg)
    # put one point in the cell of the origin
    xyz = jnp.asarray(np.array([[1.0, 1.0, 1.0]], np.float32))
    ijk = _cube_of(xyz, state.cen, cfg)
    cell = _cell_linear(ijk, cfg)
    store = MapStore(
        xyz=jnp.zeros((8, 3)).at[0].set(xyz[0]),
        cell=jnp.zeros(8, jnp.int32).at[0].set(cell[0]),
        mask=jnp.zeros(8, bool).at[0].set(True),
    )
    state = state._replace(corner=store, surf=store)

    # pose far in +x forces recentering
    t_w = jnp.asarray(np.array([cfg.cube_size * 8.4, 0.0, 0.0], np.float32))
    corner, surf, cen, center = _recenter(state, t_w, cfg)
    # margin respected
    assert int(center[0]) <= cfg.cube_width - cfg.recenter_margin - 1
    assert int(center[0]) >= cfg.recenter_margin
    # the stored point's cell shifted by the same delta, still inside
    assert bool(corner.mask[0])
    # world->cell mapping consistent under the new cen
    ijk_new = _cube_of(xyz, cen, cfg)
    assert int(corner.cell[0]) == int(_cell_linear(ijk_new, cfg)[0])


def test_recenter_drops_rolled_out_points():
    cfg = CFG
    state = MappingState.init(cfg)
    # point behind the sensor at the -x edge of the grid
    far_neg = -cfg.cube_size * (state.cen[0] - 0.5)
    xyz = jnp.asarray(np.array([[float(far_neg), 0.0, 0.0]], np.float32))
    ijk = _cube_of(xyz, state.cen, cfg)
    cell = _cell_linear(ijk, cfg)
    store = MapStore(
        xyz=jnp.zeros((8, 3)).at[0].set(xyz[0]),
        cell=jnp.zeros(8, jnp.int32).at[0].set(cell[0]),
        mask=jnp.zeros(8, bool).at[0].set(True),
    )
    state = state._replace(corner=store, surf=store)
    t_w = jnp.asarray(np.array([cfg.cube_size * 9.0, 0.0, 0.0], np.float32))
    corner, _, _, _ = _recenter(state, t_w, cfg)
    assert not bool(corner.mask[0])
