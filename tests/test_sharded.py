"""Sharded mapping must match the single-chip step on a virtual 8-device
CPU mesh — the TPU-world 'fake backend' for distributed tests
(SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from light_loam_tpu.config import MappingConfig
from light_loam_tpu.core import quaternion as quat
from light_loam_tpu.core.frame import PointCloud
from light_loam_tpu.models.mapping import MappingState, mapping_step
from light_loam_tpu.parallel import (
    make_mesh,
    shard_mapping_state,
    sharded_mapping_step,
)
from light_loam_tpu.utils.synthetic import World, simulate_scan

CFG = MappingConfig(
    map_corner_capacity=8192,
    map_surf_capacity=16384,
    local_corner_capacity=8192,
    local_surf_capacity=16384,
    stack_corner_capacity=512,
    stack_surf_capacity=2048,
    knn_tile=1024,
)


def clouds_for_frame(world, pos, rng, seed):
    pts = simulate_scan(world, pos, n_azimuth=500, noise=0.005, seed=seed)
    idx = rng.permutation(len(pts))

    def as_cloud(p, cap):
        xyz = np.zeros((cap, 3), np.float32)
        mask = np.zeros(cap, bool)
        m = min(len(p), cap)
        xyz[:m] = p[:m]
        mask[:m] = True
        return PointCloud(xyz=jnp.asarray(xyz), rel=jnp.zeros(cap),
                          mask=jnp.asarray(mask))

    return as_cloud(pts[idx[:400]], 512), as_cloud(pts[idx[400:2400]], 2048)


@pytest.mark.parametrize("n_devices", [1, 4, 8])
def test_sharded_matches_single_chip(n_devices):
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    world = World.urban(seed=11)
    rng = np.random.default_rng(0)
    mesh = make_mesh(n_devices)

    single = MappingState.init(CFG)
    sharded = shard_mapping_state(MappingState.init(CFG), mesh)

    for k in range(3):
        pos = np.array([0.5 * k, 0.0, 0.0])
        c, s = clouds_for_frame(world, pos, rng, seed=30 + k)
        # odometry slightly off on purpose
        t_odom = jnp.asarray(pos.astype(np.float32) + np.float32(0.05))
        q_odom = quat.quat_identity()
        single, out_s = mapping_step(single, c, s, q_odom, t_odom, CFG)
        sharded, out_m = sharded_mapping_step(
            sharded, c, s, q_odom, t_odom, CFG, mesh
        )

        t_single = np.asarray(out_s.t_w)
        t_multi = np.asarray(out_m.t_w)
        # identical algorithm, but f32 reduction order differs between the
        # tiled single-chip knn and the shard+merge path; borderline
        # 1.0 m^2 gate flips compound through the map feedback loop, so
        # the gate is trajectory-level, not bitwise
        np.testing.assert_allclose(t_multi, t_single, atol=3e-2)
        assert abs(int(out_m.surf_factors) - int(out_s.surf_factors)) <= max(
            5, 0.05 * int(out_s.surf_factors)
        )
        # map point totals agree approximately (dedup slot ties)
        n_s, n_m = int(out_s.map_surf_points), int(out_m.map_surf_points)
        assert abs(n_m - n_s) <= max(10, 0.02 * n_s)


def test_sharded_state_is_actually_sharded():
    mesh = make_mesh(8)
    state = shard_mapping_state(MappingState.init(CFG), mesh)
    sh = state.surf.xyz.sharding
    assert sh.is_fully_replicated is False


def test_cell_ownership_partition():
    mesh = make_mesh(4)
    st = MappingState.init(CFG)
    # craft a store with points in known cells
    n = 64
    xyz = np.random.default_rng(1).normal(size=(n, 3)).astype(np.float32)
    cell = np.arange(n, dtype=np.int32) % 100
    store = st.corner._replace(
        xyz=st.corner.xyz.at[:n].set(jnp.asarray(xyz)),
        cell=st.corner.cell.at[:n].set(jnp.asarray(cell)),
        mask=st.corner.mask.at[:n].set(True),
    )
    st = st._replace(corner=store)
    sharded = shard_mapping_state(st, mesh)
    cap = CFG.map_corner_capacity
    cells = np.asarray(sharded.corner.cell)
    mask = np.asarray(sharded.corner.mask)
    shard_size = cap // 4
    for dev in range(4):
        seg = slice(dev * shard_size, (dev + 1) * shard_size)
        owned = cells[seg][mask[seg]]
        assert (owned % 4 == dev).all()
    assert mask.sum() == n
