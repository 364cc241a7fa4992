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
