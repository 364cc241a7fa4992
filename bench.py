"""End-to-end benchmark: SLAM frames/s on the flagship HDL-64 profile.

Runs feature extraction + scan-to-scan odometry + scan-to-map refinement
synchronously per frame on synthetic HDL-64 scans (KITTI-like density,
~110k pts/frame) and reports steady-state frames/s.

Baseline: the reference is a real-time 10 Hz system with a 100 ms/frame
budget per stage (src/scanRegistration.cpp:426-427,
src/laserOdometry.cpp:922-923); vs_baseline = frames_per_s / 10.

Prints ONE JSON line to stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from light_loam_tpu.config import HDL64_KITTI
from light_loam_tpu.models.mapping import MappingState, mapping_step
from light_loam_tpu.models.odometry import OdometryState, odometry_step
from light_loam_tpu.ops.features import extract_features
from light_loam_tpu.utils.synthetic import World, simulate_scan, pad_cloud


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cfg = HDL64_KITTI
    log(f"devices: {jax.devices()}")

    world = World.urban(seed=0)
    n_warmup, n_bench = 3, 10
    frames = []
    for i in range(n_warmup + n_bench):
        pos = np.array([0.8 * i, 0.0, 0.0])
        pts = simulate_scan(world, pos, n_azimuth=1800, noise=0.01, seed=i)
        frames.append(pad_cloud(pts, cfg.scan.max_points))
    log(f"synthetic frames: {len(frames)}, ~{len(pts)} pts each")

    odo_state = OdometryState.init(cfg.scan.max_less_sharp, cfg.scan.max_less_flat)
    map_state = MappingState.init(cfg.mapping)

    def step(odo_state, map_state, xyz, mask):
        feats = extract_features(xyz, mask, cfg.scan)
        odo_state, odo = odometry_step(odo_state, feats, cfg.odometry,
                                       cfg.scan.scan_period)
        map_state, mout = mapping_step(
            map_state, odo_state.corner_last, odo_state.surf_last,
            odo.q_w, odo.t_w, cfg.mapping,
        )
        return odo_state, map_state, odo, mout

    t0 = time.time()
    for i in range(n_warmup):
        xyz, mask = frames[i]
        odo_state, map_state, odo, mout = step(
            odo_state, map_state, jnp.asarray(xyz), jnp.asarray(mask)
        )
    jax.block_until_ready((odo_state, map_state))
    log(f"warmup (incl. compile): {time.time() - t0:.1f}s")

    t0 = time.time()
    for i in range(n_warmup, n_warmup + n_bench):
        xyz, mask = frames[i]
        odo_state, map_state, odo, mout = step(
            odo_state, map_state, jnp.asarray(xyz), jnp.asarray(mask)
        )
    jax.block_until_ready((odo_state, map_state, mout))
    dt = time.time() - t0
    fps = n_bench / dt

    log(f"steady state: {dt*1000/n_bench:.2f} ms/frame, pose "
        f"{np.asarray(mout.t_w)}")
    print(json.dumps({
        "metric": "slam_frames_per_s_hdl64_e2e",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
