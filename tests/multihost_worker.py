"""Worker process for the multi-host (2-process) sharded-mapping test.

Usage: python multihost_worker.py <process_id> <num_processes> <port> \
          <local_devices>

Every process builds IDENTICAL host-side inputs (deterministic seeds),
assembles them into global arrays over the cross-process mesh, runs two
sharded mapping steps, and process 0 prints the (replicated) results as
one JSON line.  With num_processes=1 this doubles as the single-process
reference — same mesh size, same partitioned program.
"""

import json
import os
import sys

pid, nproc, port, local_devs = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={local_devs}"
).strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )

import jax.numpy as jnp  # noqa: E402

from light_loam_tpu.config import MappingConfig  # noqa: E402
from light_loam_tpu.core import quaternion as quat  # noqa: E402
from light_loam_tpu.core.frame import PointCloud  # noqa: E402
from light_loam_tpu.models.mapping import MappingState  # noqa: E402
from light_loam_tpu.parallel.multihost import (  # noqa: E402
    global_mesh,
    place_cloud_global,
    place_state_global,
    to_global,
)
from light_loam_tpu.parallel.sharded import sharded_mapping_step  # noqa: E402
from light_loam_tpu.utils.synthetic import World, simulate_scan  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402


def cloud(world, n_pts, cap, seed):
    rng = np.random.default_rng(seed)
    pts = simulate_scan(world, np.zeros(3), n_rings=16, lower_deg=-15.0,
                        upper_deg=15.0, n_azimuth=400, noise=0.01, seed=seed)
    idx = rng.permutation(len(pts))[:n_pts]
    xyz = np.zeros((cap, 3), np.float32)
    m = np.zeros(cap, bool)
    xyz[: len(idx)] = pts[idx]
    m[: len(idx)] = True
    return PointCloud(xyz=xyz, rel=np.zeros(cap, np.float32), mask=m)


def main():
    mesh = global_mesh()
    n = mesh.shape["map"]
    cfg = MappingConfig(
        map_corner_capacity=512 * n,
        map_surf_capacity=1024 * n,
        local_corner_capacity=512 * n,
        local_surf_capacity=1024 * n,
        stack_corner_capacity=256 * n,
        stack_surf_capacity=512 * n,
        knn_tile=256,
        # sparse test clouds: widen the 5-NN gate so plane/line fits engage
        knn_sq_gate=4.0,
    )
    world = World.urban(seed=6, n_boxes=6, n_poles=4)
    corner = place_cloud_global(cloud(world, 800, 1024, 11), mesh)
    surf = place_cloud_global(cloud(world, 1800, 2048, 12), mesh)

    state = place_state_global(MappingState.init(cfg), mesh, cfg)
    q0 = to_global(np.array([0, 0, 0, 1], np.float32), P(), mesh)
    t0 = to_global(np.zeros(3, np.float32), P(), mesh)
    state, out0 = sharded_mapping_step(state, corner, surf, q0, t0, cfg, mesh)

    t1 = to_global(np.array([0.3, 0.05, 0.0], np.float32), P(), mesh)
    state, out1 = sharded_mapping_step(state, corner, surf, q0, t1, cfg, mesh)

    result = {
        "n_global_devices": len(jax.devices()),
        "q_w": np.asarray(out1.q_w).tolist(),
        "t_w": np.asarray(out1.t_w).tolist(),
        "corner_factors": int(out1.corner_factors),
        "surf_factors": int(out1.surf_factors),
        "map_surf_points": int(out1.map_surf_points),
    }
    if pid == 0:
        print("RESULT " + json.dumps(result), flush=True)


main()
