"""Per-op device-time attribution for the three pipeline stages.

Why this exists: the axon platform has a ~1.5-3 ms per-program dispatch
floor AND `block_until_ready` returns at enqueue, so neither per-call
microbenchmarks nor profilers resolve sub-op costs.  This harness times
each candidate sub-op with IN-GRAPH repetition — the op runs `iters`
times inside one `lax.fori_loop` whose carry feeds a zero-scaled
perturbation into the op's input (exact identity, but a real data
dependency, so XLA cannot parallelize or elide the iterations) — and one
D2H read at the end.  Device time per iteration = (call time − floor) /
iters.

State is real: the flagship pipeline runs `--warm-frames` frames first
(on the host platform if `--state cpu`, faster through the tunnel) and
the resulting odometry/mapping state is shipped to the bench device.

Run:  timeout 1200 python bench_profile.py [--stage mapping|features|odometry|all]
Prints one JSON line per op as it lands; full table to the --out path.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("LLT_MATMUL_PRECISION", "high")

import numpy as np
import jax

from light_loam_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax.numpy as jnp
from jax import lax

from light_loam_tpu.config import HDL64_KITTI
from light_loam_tpu.models import mapping as M
from light_loam_tpu.models.odometry import OdometryState, odometry_step
from light_loam_tpu.models.mapping import MappingState, mapping_step
from light_loam_tpu.ops import features as F
from light_loam_tpu.ops import knn, graphvote
from light_loam_tpu.ops.voxel import voxel_downsample, voxel_downsample_rings
from light_loam_tpu.core import quaternion as quat
from light_loam_tpu.solver import FactorSet, lm_solve
from light_loam_tpu.utils.synthetic import World, simulate_scan, pad_cloud


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def d2h(x):
    return np.asarray(x)


RESULTS = []


def dev_time(name, step_fn, iters=4, reps=3):
    """step_fn(s: f32 scalar) -> f32 scalar, runs the op once with a
    zero-scaled `s` perturbation on an input and collapses the output to
    a scalar.

    Self-calibrating against the (unstable, 1.5-35 ms) per-call
    dispatch+sync floor: times the op at `iters` and `3*iters` in-graph
    repetitions and reports the slope (t_hi - t_lo) / (2*iters) — the
    additive floor cancels.  min-of-reps on each point rejects tunnel
    latency spikes."""

    def make(n):
        def run(_):
            return lax.fori_loop(0, n, lambda i, s: step_fn(s),
                                 jnp.float32(0.0))

        return jax.jit(run)

    f_lo, f_hi = make(iters), make(3 * iters)
    t0 = time.perf_counter()
    d2h(f_lo(0))
    d2h(f_hi(0))
    compile_s = time.perf_counter() - t0
    lo = hi = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        d2h(f_lo(0))
        lo = min(lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        d2h(f_hi(0))
        hi = min(hi, time.perf_counter() - t0)
    ms = max(hi - lo, 0.0) * 1000 / (2 * iters)
    rec = {"name": name, "ms_per_iter": round(ms, 4), "iters": iters,
           "lo_ms": round(lo * 1000, 2), "hi_ms": round(hi * 1000, 2),
           "compile_s": round(compile_s, 1)}
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)
    return ms


FLOOR_MS = 3.0


def measure_floor():
    global FLOOR_MS
    tiny = jnp.ones((8,), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    d2h(f(tiny))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        d2h(f(tiny))
        best = min(best, time.perf_counter() - t0)
    FLOOR_MS = best * 1000
    log(f"dispatch+sync floor: {FLOOR_MS:.2f} ms")


def build_state(cfg, n_frames, platform):
    """Run the real pipeline for n_frames and return device-put state."""
    if platform == "cpu":
        import subprocess
        import pickle
        import tempfile

        # build state in a CPU subprocess (this process may be TPU-pinned)
        code = f"""
import os, pickle, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("LLT_MATMUL_PRECISION", "high")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from light_loam_tpu.config import HDL64_KITTI
from light_loam_tpu.models.odometry import OdometryState, odometry_step
from light_loam_tpu.models.mapping import MappingState, mapping_step
from light_loam_tpu.ops.features import extract_features
from light_loam_tpu.utils.synthetic import World, simulate_scan, pad_cloud
cfg = HDL64_KITTI
world = World.urban(seed=0)
odo = OdometryState.init(cfg.scan.max_less_sharp, cfg.scan.max_less_flat)
mst = MappingState.init(cfg.mapping)
for i in range({n_frames}):
    pts = simulate_scan(world, np.array([0.8 * i, 0.0, 0.0]), n_azimuth=1800,
                        noise=0.01, seed=i)
    x, m = pad_cloud(pts, cfg.scan.max_points)
    feats = extract_features(x, m, cfg.scan)
    odo, oout = odometry_step(odo, feats, cfg.odometry, cfg.scan.scan_period)
    mst, mout = mapping_step(mst, odo.corner_last, odo.surf_last,
                             oout.q_w, oout.t_w, cfg.mapping)
state = dict(
    odo=jax.tree.map(np.asarray, odo),
    mst=jax.tree.map(np.asarray, mst),
    feats=jax.tree.map(np.asarray, feats),
    oout=jax.tree.map(np.asarray, oout),
    x=np.asarray(x), m=np.asarray(m),
)
with open(sys.argv[1], "wb") as f:
    pickle.dump(state, f)
print("state built", flush=True)
"""
        with tempfile.NamedTemporaryFile(suffix=".pkl") as tf:
            subprocess.run([sys.executable, "-c", code, tf.name], check=True)
            import pickle

            with open(tf.name, "rb") as fh:
                state = pickle.load(fh)
        put = lambda t: jax.tree.map(jax.device_put, t)
        odo = put(state["odo"])
        mst = put(state["mst"])
        feats = put(state["feats"])
        oout = put(state["oout"])
        x, m = jax.device_put(state["x"]), jax.device_put(state["m"])
        d2h(m)
        return odo, mst, feats, oout, x, m
    raise ValueError(platform)


def profile_mapping(cfg, odo, mst, feats, oout):
    mcfg = cfg.mapping
    q_odom, t_odom = oout.q_w, oout.t_w
    corner_last, surf_last = odo.corner_last, odo.surf_last

    # reproduce the step's intermediates once (same code path as
    # mapping_step) so each sub-op gets its real input shapes/values
    q_w = quat.quat_normalize(quat.quat_multiply(mst.q_wm, q_odom))
    t_w = quat.quat_rotate(mst.q_wm, t_odom) + mst.t_wm
    corner_store, surf_store, cen, center = M._recenter(mst, t_w, mcfg)
    local_c_xyz, local_c_mask, _ = M._gather_local(
        corner_store, center, mcfg, mcfg.local_corner_capacity)
    local_s_xyz, local_s_mask, _ = M._gather_local(
        surf_store, center, mcfg, mcfg.local_surf_capacity)
    stack_c_xyz, _, stack_c_mask, _ = voxel_downsample(
        corner_last.xyz, corner_last.rel, corner_last.mask,
        mcfg.line_resolution, mcfg.stack_corner_capacity)
    stack_s_xyz, _, stack_s_mask, _ = voxel_downsample(
        surf_last.xyz, surf_last.rel, surf_last.mask,
        mcfg.plane_resolution, mcfg.stack_surf_capacity)
    log(f"map live: corner {int(jnp.sum(corner_store.mask))} "
        f"surf {int(jnp.sum(surf_store.mask))}; local "
        f"{int(jnp.sum(local_c_mask))}/{int(jnp.sum(local_s_mask))}; "
        f"stack {int(jnp.sum(stack_c_mask))}/{int(jnp.sum(stack_s_mask))}")

    z = lambda s: 1.0 + 0.0 * s  # exact-identity dependency injector

    dev_time("map.recenter", lambda s: M._recenter(
        mst._replace(t_wm=mst.t_wm * z(s)), t_w, mcfg)[2].sum().astype(jnp.float32))

    dev_time("map.gather_local_corner", lambda s: M._gather_local(
        corner_store._replace(xyz=corner_store.xyz * z(s)), center, mcfg,
        mcfg.local_corner_capacity)[0].sum())
    dev_time("map.gather_local_surf", lambda s: M._gather_local(
        surf_store._replace(xyz=surf_store.xyz * z(s)), center, mcfg,
        mcfg.local_surf_capacity)[0].sum())
    # the argsort fallback, for the compaction-variant A/B
    dev_time("map.gather_local_surf_argsort", lambda s: M._gather_local(
        surf_store._replace(xyz=surf_store.xyz * z(s)), center, mcfg,
        mcfg.local_surf_capacity, cell_ordered=False)[0].sum())

    dev_time("map.stack_voxel_corner", lambda s: voxel_downsample(
        corner_last.xyz * z(s), corner_last.rel, corner_last.mask,
        mcfg.line_resolution, mcfg.stack_corner_capacity)[0].sum())
    dev_time("map.stack_voxel_surf", lambda s: voxel_downsample(
        surf_last.xyz * z(s), surf_last.rel, surf_last.mask,
        mcfg.plane_resolution, mcfg.stack_surf_capacity)[0].sum())

    # 5-NN backends at both call shapes
    def knn_call(backend, qx, rx, rm, k):
        if backend == "pallas":
            from light_loam_tpu.ops.pallas_knn import knn_pallas

            d, i = knn_pallas(qx, rx, rm, k=k,
                              interpret=jax.default_backend() != "tpu")
        else:
            d, i = knn.knn_tiled(qx, rx, rm, k=k, tile=mcfg.knn_tile)
        return d.sum()

    p_sel_c = quat.quat_rotate(q_w[None, :], stack_c_xyz) + t_w[None, :]
    p_sel_s = quat.quat_rotate(q_w[None, :], stack_s_xyz) + t_w[None, :]
    for backend in ("pallas", "xla"):
        dev_time(f"map.knn_corner_{backend}", lambda s, b=backend: knn_call(
            b, p_sel_c * z(s), local_c_xyz, local_c_mask, mcfg.knn_k), iters=4)
        dev_time(f"map.knn_surf_{backend}", lambda s, b=backend: knn_call(
            b, p_sel_s * z(s), local_s_xyz, local_s_mask, mcfg.knn_k), iters=4)

    # count-aware skip — the path mapping_step actually runs (the
    # entries above measure the no-skip worst case: cost scales with
    # buffer capacity, not live content)
    def knn_skip(backend, qx, qm, rx, rm, k):
        nq = jnp.sum(qm.astype(jnp.int32))
        nr = jnp.sum(rm.astype(jnp.int32))
        if backend == "pallas":
            from light_loam_tpu.ops.pallas_knn import knn_pallas

            d, i = knn_pallas(qx, rx, rm, k=k,
                              interpret=jax.default_backend() != "tpu",
                              query_count=nq, ref_count=nr)
        else:
            d, i = knn.knn_tiled(qx, rx, rm, k=k, tile=mcfg.knn_tile,
                                 ref_count=nr)
        return d.sum()

    for backend in ("pallas", "xla"):
        dev_time(f"map.knn_surf_{backend}_skip", lambda s, b=backend:
                 knn_skip(b, p_sel_s * z(s), stack_s_mask, local_s_xyz,
                          local_s_mask, mcfg.knn_k), iters=4)

    # fits + solve with real neighbour sets
    from light_loam_tpu.ops.pallas_knn import knn_pallas

    interp = jax.default_backend() != "tpu"
    d_c, i_c = knn_pallas(p_sel_c, local_c_xyz, local_c_mask, k=mcfg.knn_k,
                          interpret=interp)
    d_s, i_s = knn_pallas(p_sel_s, local_s_xyz, local_s_mask, k=mcfg.knn_k,
                          interpret=interp)
    near_c, near_s = local_c_xyz[i_c], local_s_xyz[i_s]

    dev_time("map.line_fit", lambda s: M.line_fit_factors(
        stack_c_xyz * z(s), stack_c_mask, d_c, near_c, mcfg).a.sum())
    dev_time("map.plane_fit", lambda s: M.plane_fit_factors(
        stack_s_xyz * z(s), stack_s_mask, d_s, near_s, mcfg).n.sum())

    ef = M.line_fit_factors(stack_c_xyz, stack_c_mask, d_c, near_c, mcfg)
    pf = M.plane_fit_factors(stack_s_xyz, stack_s_mask, d_s, near_s, mcfg)

    # latent mapping-stage vote (models/mapping.py _outer) — previously
    # unprofiled; runs once per outer iteration on the surf stack
    from light_loam_tpu.ops import graphvote

    v_chunk = mcfg.stack_surf_capacity // mcfg.vote_regions + mcfg.vote_regions

    def map_vote(s):
        sel, w = graphvote.run_vote(
            mcfg.vote_mode, stack_s_xyz * z(s), jnp.mean(near_s, axis=1),
            pf.mask, n_regions=mcfg.vote_regions, chunk_capacity=v_chunk,
            score_threshold=mcfg.vote_score_threshold,
            resolution=mcfg.vote_resolution,
            selected_ratio=mcfg.vote_selected_ratio,
            low_vote_count=mcfg.vote_low_vote_count,
            low_vote_weight=mcfg.vote_low_vote_weight,
            high_vote_weight=mcfg.vote_high_vote_weight,
            backend=mcfg.vote_backend,
        )
        return w.sum()

    if mcfg.vote_mode != "off":
        dev_time("map.graph_vote", map_vote, iters=4)

    def solve(s):
        q2, t2, _ = lm_solve(q_w, t_w * z(s), FactorSet(edge=ef, plane_norm=pf),
                             n_iterations=mcfg.inner_iterations,
                             huber_delta=mcfg.huber_delta)
        return t2.sum()

    dev_time("map.lm_solve_4it", solve, iters=4)

    reg_c = quat.quat_rotate(q_w[None, :], stack_c_xyz) + t_w[None, :]
    reg_s = quat.quat_rotate(q_w[None, :], stack_s_xyz) + t_w[None, :]
    dev_time("map.merge_full_corner", lambda s: M._merge_into_store(
        corner_store._replace(xyz=corner_store.xyz * z(s)), reg_c,
        stack_c_mask, cen, mcfg, mcfg.line_resolution,
        mcfg.map_corner_capacity).xyz.sum())
    dev_time("map.merge_full_surf", lambda s: M._merge_into_store(
        surf_store._replace(xyz=surf_store.xyz * z(s)), reg_s,
        stack_s_mask, cen, mcfg, mcfg.plane_resolution,
        mcfg.map_surf_capacity).xyz.sum())
    # the sorted fast path (non-recenter frames, ops/sorted_store.py)
    notrec = jnp.asarray(False)
    dev_time("map.merge_sorted_corner", lambda s: M._merge_into_store(
        corner_store._replace(xyz=corner_store.xyz * z(s)), reg_c,
        stack_c_mask, cen, mcfg, mcfg.line_resolution,
        mcfg.map_corner_capacity, recentered=notrec).xyz.sum())
    dev_time("map.merge_sorted_surf", lambda s: M._merge_into_store(
        surf_store._replace(xyz=surf_store.xyz * z(s)), reg_s,
        stack_s_mask, cen, mcfg, mcfg.plane_resolution,
        mcfg.map_surf_capacity, recentered=notrec).xyz.sum())

    # merge_sorted internals — attribute the ~8 ms surf fast path to its
    # three passes (small segment-reduce sort, lex binary search, O(N)
    # shift gather) so the next optimization targets the real cost
    from light_loam_tpu.ops import sorted_store as SS
    from light_loam_tpu.ops.voxel import voxel_keys as _vkeys

    ijk_s = M._cube_of(reg_s, cen, mcfg)
    dims_s = jnp.asarray(
        [mcfg.cube_width, mcfg.cube_height, mcfg.cube_depth], jnp.int32)
    inside_s = jnp.all((ijk_s >= 0) & (ijk_s < dims_s[None, :]), axis=-1)
    cell_new_s = jnp.where(
        inside_s, M._cell_linear(ijk_s, mcfg), 0).astype(jnp.int32)
    nm_s = stack_s_mask & inside_s
    leaf_srf = mcfg.plane_resolution
    smaj, smin = _vkeys(surf_store.xyz, surf_store.mask, leaf_srf,
                        extra_key=surf_store.cell)

    def ms_reduce(s):
        _, _, usum, _, _ = SS.voxel_segment_reduce(
            reg_s * z(s), nm_s, leaf_srf, cell_new_s)
        return usum.sum()

    dev_time("map.ms_segment_reduce", ms_reduce)

    def ms_reduce_search(s):
        ukmaj, ukmin, usum, _, _ = SS.voxel_segment_reduce(
            reg_s * z(s), nm_s, leaf_srf, cell_new_s)
        p = SS.searchsorted2(smaj, smin, ukmaj, ukmin)
        return usum.sum() + p.sum().astype(jnp.float32)

    dev_time("map.ms_reduce_plus_search", ms_reduce_search)

    n_srf = surf_store.xyz.shape[0]
    o_srf = jnp.arange(n_srf, dtype=jnp.int32)

    def ms_shift_gather(s):
        # data-dependent (always-zero) cumsum keeps the monotone gather
        # dynamic, like the real fresh-insert shift
        x = surf_store.xyz * z(s)
        cumf = jnp.cumsum((jnp.abs(x[:, 0]) > 1e30).astype(jnp.int32))
        src = jnp.clip(o_srf - 7 - cumf, 0, n_srf - 1)
        return x[src].sum()

    dev_time("map.ms_shift_gather", ms_shift_gather)

    # whole mapping step: floor-free device time of the full program —
    # the gap vs the sum of the sub-ops above is unattributed cost
    dev_time("stage.mapping_whole", lambda s: mapping_step(
        mst._replace(t_wm=mst.t_wm * z(s)), corner_last, surf_last,
        q_odom, t_odom, mcfg)[1].t_w.sum(), iters=2)

    # 1-outer-iteration variant (fixed-vs-per-iteration split, see the
    # odometry twin entry)
    import dataclasses as _dc

    mcfg1 = _dc.replace(mcfg, outer_iterations=1)
    dev_time("stage.mapping_whole_1it", lambda s: mapping_step(
        mst._replace(t_wm=mst.t_wm * z(s)), corner_last, surf_last,
        q_odom, t_odom, mcfg1)[1].t_w.sum(), iters=2)


def profile_features(cfg, x, m):
    scfg = cfg.scan
    z = lambda s: 1.0 + 0.0 * s

    finite = jnp.all(jnp.isfinite(x), axis=-1)
    r2 = jnp.sum(x * x, axis=-1)
    in_mask = m & finite & (r2 >= scfg.minimum_range**2)
    ring, ring_ok = F.compute_ring_ids(x, in_mask, scfg)
    rel_time = F.compute_rel_time(x, in_mask, ring_ok)
    rel = ring.astype(x.dtype) + scfg.scan_period * rel_time
    grid = F.build_range_image(x, rel, ring, ring_ok, scfg)
    curv = F.compute_curvature(grid.xyz)
    label, okey = F.select_features(grid, curv, scfg)

    dev_time("feat.ring_and_reltime", lambda s: (
        F.compute_rel_time(x * z(s), in_mask, ring_ok).sum()))
    dev_time("feat.build_range_image", lambda s: F.build_range_image(
        x * z(s), rel, ring, ring_ok, scfg).xyz.sum())
    dev_time("feat.curvature", lambda s: F.compute_curvature(
        grid.xyz * z(s)).sum())
    dev_time("feat.select_features", lambda s: F.select_features(
        grid._replace(xyz=grid.xyz * z(s)), curv, scfg)[0].sum()
        .astype(jnp.float32), iters=4)
    dev_time("feat.compact_selected_x3", lambda s: (
        F._compact_selected(grid._replace(xyz=grid.xyz * z(s)),
                            label == 2, okey, scfg.max_sharp).xyz.sum()
        + F._compact_selected(grid, label >= 1, okey,
                              scfg.max_less_sharp).xyz.sum()
        + F._compact_selected(grid, label == -1, okey,
                              scfg.max_flat).xyz.sum()))

    R, H = label.shape
    col_ids = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None, :], (R, H))
    seg_len = grid.counts - 11
    band = ((seg_len >= scfg.n_sectors)[:, None]
            & (col_ids >= 5) & (col_ids <= (grid.counts - 7)[:, None]))
    lf_sel = band & (label <= 0) & grid.mask
    dev_time("feat.lessflat_voxel_rings", lambda s: voxel_downsample_rings(
        grid.xyz * z(s), grid.rel, lf_sel, scfg.less_flat_leaf,
        scfg.max_less_flat // scfg.n_scans)[0].sum())
    # sort-free runs variant — the direct per-op A/B for the
    # LLT_LESSFLAT_MODE default decision (VERDICT r4 #3)
    from light_loam_tpu.ops.voxel import voxel_downsample_rings_runs

    dev_time("feat.lessflat_voxel_runs", lambda s: (
        voxel_downsample_rings_runs(
            grid.xyz * z(s), grid.rel, lf_sel, scfg.less_flat_leaf,
            scfg.max_less_flat // scfg.n_scans)[0].sum()))

    dev_time("stage.features_whole", lambda s: F.extract_features(
        x * z(s), m, scfg).less_flat.xyz.sum(), iters=2)


def profile_odometry(cfg, odo, feats):
    ocfg = cfg.odometry
    z = lambda s: 1.0 + 0.0 * s
    sharp, flat = feats.sharp, feats.flat
    from light_loam_tpu.models.odometry import _transform_to_start

    q, t = odo.q_lc, odo.t_lc
    sharp_sel, s_sharp = _transform_to_start(q, t, sharp, ocfg.distortion, 0.1)
    flat_sel, s_flat = _transform_to_start(q, t, flat, ocfg.distortion, 0.1)

    dev_time("odo.transform_to_start", lambda s: _transform_to_start(
        q, t * z(s), flat, ocfg.distortion, 0.1)[0].sum())
    dev_time("odo.corner_corr", lambda s: knn.corner_correspondences(
        sharp_sel * z(s), sharp.mask, odo.corner_last,
        ocfg.distance_sq_threshold, ocfg.nearby_scan).a_idx.sum()
        .astype(jnp.float32))
    R = feats.full.xyz.shape[0]
    dev_time("odo.surf_corr_grid", lambda s: knn.surf_correspondences_grid(
        flat_sel * z(s), flat.mask, odo.surf_last, R,
        ocfg.distance_sq_threshold, ocfg.nearby_scan).a_idx.sum()
        .astype(jnp.float32))
    dev_time("odo.surf_corr_tiled", lambda s: knn.surf_correspondences(
        flat_sel * z(s), flat.mask, odo.surf_last,
        ocfg.distance_sq_threshold, ocfg.nearby_scan).a_idx.sum()
        .astype(jnp.float32))

    sm = knn.surf_correspondences_grid(flat_sel, flat.mask, odo.surf_last, R,
                                       ocfg.distance_sq_threshold,
                                       ocfg.nearby_scan)
    n_flat_cap = flat.capacity
    chunk_cap = n_flat_cap // ocfg.plane_vote_regions + ocfg.plane_vote_regions

    def vote(s, backend):
        sel, w = graphvote.run_vote(
            ocfg.plane_vote_mode, flat.xyz * z(s),
            odo.surf_last.xyz[sm.a_idx], sm.valid,
            n_regions=ocfg.plane_vote_regions, chunk_capacity=chunk_cap,
            score_threshold=ocfg.vote_score_threshold,
            resolution=ocfg.vote_resolution,
            selected_ratio=ocfg.vote_selected_ratio,
            low_vote_count=ocfg.vote_low_vote_count,
            low_vote_weight=ocfg.vote_low_vote_weight,
            high_vote_weight=ocfg.vote_high_vote_weight,
            backend=backend)
        return w.sum()

    on_tpu = jax.default_backend() == "tpu"
    dev_time("odo.plane_vote_pallas" if on_tpu else "odo.plane_vote_auto",
             lambda s: vote(s, "pallas" if on_tpu else "xla"))
    dev_time("odo.plane_vote_xla", lambda s: vote(s, "xla"))

    from light_loam_tpu.solver import EdgeFactors, make_plane_factors

    edge = EdgeFactors(
        cp=sharp.xyz,
        a=odo.corner_last.xyz[jnp.zeros(sharp.capacity, jnp.int32)],
        b=odo.corner_last.xyz[jnp.zeros(sharp.capacity, jnp.int32)],
        s=s_sharp, weight=jnp.ones_like(s_sharp), mask=sharp.mask)
    plane = make_plane_factors(
        cp=flat.xyz, a=odo.surf_last.xyz[sm.a_idx],
        b=odo.surf_last.xyz[sm.b_idx], c=odo.surf_last.xyz[sm.c_idx],
        s=s_flat, weight=jnp.ones_like(s_flat), mask=sm.valid)

    def solve(s):
        q2, t2, _ = lm_solve(q, t * z(s), FactorSet(edge=edge, plane=plane),
                             n_iterations=ocfg.inner_iterations,
                             huber_delta=ocfg.huber_delta)
        return t2.sum()

    dev_time("odo.lm_solve_8it", solve, iters=4)

    # --- gather-inclusive entries (r05 ledger) -------------------------
    # The vote/solve entries above hold their index operands loop-
    # invariant, so the (cap, 3) row gathers out of corner_last/surf_last
    # — five per outer iteration in the real body — get hoisted out of
    # the repetition loop and never counted.  These entries vary the
    # indices with the dependency-chain value s (cheap int add + mod vs
    # a row gather), forcing a real gather every rep.
    Nc = odo.corner_last.xyz.shape[0]
    Ns = odo.surf_last.xyz.shape[0]
    cm = knn.corner_correspondences(sharp_sel, sharp.mask, odo.corner_last,
                                    ocfg.distance_sq_threshold,
                                    ocfg.nearby_scan)

    def vary(idx, n, s):
        return jnp.remainder(idx + s.astype(jnp.int32), n)

    def gather5(s):
        sv = jnp.asarray(s)
        rows = (odo.corner_last.xyz[vary(cm.a_idx, Nc, sv)].sum()
                + odo.corner_last.xyz[vary(cm.b_idx, Nc, sv)].sum()
                + odo.surf_last.xyz[vary(sm.a_idx, Ns, sv)].sum()
                + odo.surf_last.xyz[vary(sm.b_idx, Ns, sv)].sum()
                + odo.surf_last.xyz[vary(sm.c_idx, Ns, sv)].sum())
        return rows

    dev_time("odo.gather5_rows", gather5, iters=4)

    def factor_tail(s):
        sv = jnp.asarray(s)
        e = EdgeFactors(
            cp=sharp.xyz,
            a=odo.corner_last.xyz[vary(cm.a_idx, Nc, sv)],
            b=odo.corner_last.xyz[vary(cm.b_idx, Nc, sv)],
            s=s_sharp, weight=jnp.ones_like(s_sharp), mask=cm.valid)
        p = make_plane_factors(
            cp=flat.xyz,
            a=odo.surf_last.xyz[vary(sm.a_idx, Ns, sv)],
            b=odo.surf_last.xyz[vary(sm.b_idx, Ns, sv)],
            c=odo.surf_last.xyz[vary(sm.c_idx, Ns, sv)],
            s=s_flat, weight=jnp.ones_like(s_flat), mask=sm.valid)
        q2, t2, _ = lm_solve(q, t, FactorSet(edge=e, plane=p),
                             n_iterations=ocfg.inner_iterations,
                             huber_delta=ocfg.huber_delta)
        return t2.sum()

    dev_time("odo.factor_tail_gathers_build_solve", factor_tail, iters=4)

    # whole odometry step: floor-free device time of the full program
    # (6 outer iterations + state hand-off) — the gap vs 6×(corr + vote
    # + solve) above is unattributed cost
    dev_time("stage.odometry_whole", lambda s: odometry_step(
        odo._replace(t_lc=odo.t_lc * z(s)), feats, ocfg, 0.1
    )[1].t_w.sum(), iters=2)

    # same step at 1 outer iteration: whole − (whole₁ · 1) separates the
    # per-iteration body cost from the fixed prologue/epilogue, which
    # the isolated entries above cannot attribute
    import dataclasses as _dc

    ocfg1 = _dc.replace(ocfg, outer_iterations=1)
    dev_time("stage.odometry_whole_1it", lambda s: odometry_step(
        odo._replace(t_lc=odo.t_lc * z(s)), feats, ocfg1, 0.1
    )[1].t_w.sum(), iters=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all",
                    choices=["all", "mapping", "features", "odometry"])
    ap.add_argument("--warm-frames", type=int, default=8)
    ap.add_argument("--state", default="cpu")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cfg = HDL64_KITTI
    log(f"devices: {jax.devices()}")
    measure_floor()
    t0 = time.time()
    odo, mst, feats, oout, x, m = build_state(cfg, args.warm_frames,
                                              args.state)
    log(f"state built in {time.time()-t0:.0f}s")

    if args.stage in ("all", "features"):
        profile_features(cfg, x, m)
    if args.stage in ("all", "odometry"):
        profile_odometry(cfg, odo, feats)
    if args.stage in ("all", "mapping"):
        profile_mapping(cfg, odo, mst, feats, oout)

    out = {"device": str(jax.devices()[0]), "floor_ms": round(FLOOR_MS, 3),
           "warm_frames": args.warm_frames, "results": RESULTS}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({"done": True, "n": len(RESULTS)}), flush=True)


if __name__ == "__main__":
    main()
