"""Fused whole-frame program (models/fused.py) vs the staged pipeline.

The fused step is the latency mode: one XLA program per frame instead of
three, with divergence containment in-graph.  Its contract is exact
semantic equivalence with the staged path (models/pipeline.py) on every
mapping frame — these tests gate that, plus the in-graph containment
policy itself.
"""

import dataclasses

import numpy as np

from light_loam_tpu.models.pipeline import PROFILES, Pipeline
from light_loam_tpu.utils.synthetic import World, pad_cloud, simulate_scan


def _frames(cfg, world, n, step=0.5):
    out = []
    for i in range(n):
        pts = simulate_scan(world, np.array([step * i, 0.0, 0.0]),
                            n_azimuth=500, noise=0.01, seed=100 + i)
        out.append(pad_cloud(pts, cfg.scan.max_points))
    return out


def test_fused_matches_staged_pipeline():
    base = PROFILES["hdl64-small"]
    world = World.urban(seed=21)
    frames = _frames(base, world, 6)

    staged = Pipeline(base)
    fused = Pipeline(dataclasses.replace(base, fused_step=True))

    for xyz, mask in frames:
        rs = staged.process_frame(xyz, mask)
        rf = fused.process_frame(xyz, mask)
        assert rf.mapped == rs.mapped
        # Same composition of the same jitted stage functions — the only
        # difference is program boundaries, so poses agree to float32
        # reassociation noise.
        np.testing.assert_allclose(rf.odom_t, rs.odom_t, atol=1e-4)
        np.testing.assert_allclose(rf.odom_q, rs.odom_q, atol=1e-5)
        np.testing.assert_allclose(rf.map_t, rs.map_t, atol=1e-4)
        np.testing.assert_allclose(rf.map_q, rs.map_q, atol=1e-5)

    # shared bookkeeping: trajectory history and keyframe buffers match
    assert len(fused._map_trajectory) == len(staged._map_trajectory)
    np.testing.assert_allclose(
        np.stack(fused._map_trajectory), np.stack(staged._map_trajectory),
        atol=1e-4,
    )
    assert len(fused._keyframes) == len(staged._keyframes)
    assert fused.diverged_frames == staged.diverged_frames == 0


def test_chunked_scan_matches_per_frame_fused():
    """fused_chunk_step (lax.scan over K frames in ONE program, the
    offline single-sequence throughput mode) must reproduce the
    per-frame fused path.

    Tolerance note: the scan body is a *different XLA compilation* of
    the same trace, so float reassociation differs bitwise; through the
    solver's discrete gates (1 m² correspondence gates, vote cutoffs)
    that grows as a few-mm/frame random walk — the same mechanism as
    the sharded-vs-single divergence documented in CLAUDE.md (frame 1
    agrees to 3e-5 m, frame 6 to ~1 cm).  Gate at 3 cm over 6 frames:
    tight enough to catch any real state-threading bug (which would be
    metres), loose enough not to gate compiler noise."""
    import jax.numpy as jnp

    from light_loam_tpu.models.fused import fused_chunk_step, fused_frame_step
    from light_loam_tpu.models.mapping import MappingState
    from light_loam_tpu.models.odometry import OdometryState

    cfg = PROFILES["hdl64-small"]
    world = World.urban(seed=24)
    frames = _frames(cfg, world, 6)

    odo = OdometryState.init(cfg.scan.max_less_sharp, cfg.scan.max_less_flat)
    mp = MappingState.init(cfg.mapping)
    per_frame_t = []
    for xyz, mask in frames:
        odo, mp, o, mout, div = fused_frame_step(
            odo, mp, jnp.asarray(xyz), jnp.asarray(mask), cfg)
        per_frame_t.append(np.asarray(mout.t_w))
        assert not bool(div)

    odo2 = OdometryState.init(cfg.scan.max_less_sharp, cfg.scan.max_less_flat)
    mp2 = MappingState.init(cfg.mapping)
    xs = jnp.asarray(np.stack([f[0] for f in frames]))
    ms = jnp.asarray(np.stack([f[1] for f in frames]))
    odo2, mp2, outs = fused_chunk_step(odo2, mp2, xs, ms, cfg)

    assert not np.asarray(outs.diverged).any()
    np.testing.assert_allclose(
        np.asarray(outs.map_t), np.stack(per_frame_t), rtol=0, atol=3e-2)
    # final states agree too (the chunk threads state through the scan)
    np.testing.assert_allclose(np.asarray(odo2.t_w), np.asarray(odo.t_w),
                               rtol=0, atol=3e-2)
    np.testing.assert_allclose(np.asarray(mp2.t_wm), np.asarray(mp.t_wm),
                               rtol=0, atol=3e-2)
    # and the first frame — before any gate-flip accumulation — is tight
    np.testing.assert_allclose(np.asarray(outs.map_t)[1], per_frame_t[1],
                               rtol=0, atol=1e-3)


def test_fused_interleaves_with_staged_on_skip_frames():
    """With skip_frame_num=2, only every other frame maps: those run
    fused, the rest fall back to staged features+odometry.  The two
    paths share OdometryState/MappingState — this gates that the
    interleaved run matches a pure-staged run with the same skip."""
    base = PROFILES["hdl64-small"]
    cfg_skip = dataclasses.replace(
        base,
        odometry=dataclasses.replace(base.odometry, skip_frame_num=2),
    )
    world = World.urban(seed=23)
    frames = _frames(cfg_skip, world, 5)

    staged = Pipeline(cfg_skip)
    mixed = Pipeline(dataclasses.replace(cfg_skip, fused_step=True))

    for i, (xyz, mask) in enumerate(frames):
        rs = staged.process_frame(xyz, mask)
        rm = mixed.process_frame(xyz, mask)
        assert rm.mapped == rs.mapped == (i % 2 == 0)
        np.testing.assert_allclose(rm.odom_t, rs.odom_t, atol=1e-4)
        if rs.mapped:
            np.testing.assert_allclose(rm.map_t, rs.map_t, atol=1e-4)
    assert len(mixed._map_trajectory) == len(staged._map_trajectory) == 3


def test_fused_in_graph_divergence_containment(monkeypatch):
    """A non-finite odometry pose must not poison the world pose: the
    fused step keeps the previous pose, resets the warm start, and
    reports the divergence flag (pipeline.py:152-168 policy, in-graph).

    An empty scan degrades *gracefully* (damped solve, finite pose), so
    the failure is injected: the odometry step the fused program traces
    is wrapped to emit NaN t_w whenever the scan has no sharp points —
    a data-dependent corruption baked into the trace, exercising the
    containment `where` on device."""
    import jax.numpy as jnp

    import light_loam_tpu.models.fused as fused_mod

    base = PROFILES["hdl64-small"]
    # distinct static cfg → fresh trace with the wrapper in place
    cfg = dataclasses.replace(base, fused_step=True, frame_budget_ms=42.0)
    world = World.urban(seed=22)
    frames = _frames(cfg, world, 3)

    real_step = fused_mod.odometry_step

    def nan_on_empty(state, feats, ocfg, period):
        state2, odo = real_step(state, feats, ocfg, period)
        poison = jnp.where(feats.sharp.mask.any(), 0.0, jnp.nan)
        state2 = state2._replace(t_w=state2.t_w + poison)
        return state2, odo._replace(t_w=odo.t_w + poison)

    monkeypatch.setattr(fused_mod, "odometry_step", nan_on_empty)

    pipe = Pipeline(cfg)
    for xyz, mask in frames[:2]:
        res = pipe.process_frame(xyz, mask)
        assert np.isfinite(res.odom_t).all()
    pose_before = np.asarray(pipe._last_odo_pose[1]).copy()
    assert pipe.diverged_frames == 0

    # empty scan → injected NaN pose → containment must engage
    xyz, mask = frames[2]
    res = pipe.process_frame(xyz, np.zeros_like(mask))
    assert pipe.diverged_frames == 1
    assert np.isfinite(res.odom_t).all()
    np.testing.assert_allclose(res.odom_t, pose_before, atol=1e-5)

    # and the pipeline keeps tracking on the next good frame
    res2 = pipe.process_frame(xyz, mask)
    assert np.isfinite(res2.odom_t).all()
    assert pipe.diverged_frames == 1


def test_chunk_internal_divergence_containment(monkeypatch):
    """A diverging frame in the MIDDLE of a fused_chunk_step chunk must
    not poison the rest of the chunk: the contained frame holds the
    previous pose, adds nothing to the map, and the frames after it
    keep tracking — exactly like the per-frame fused path fed the same
    corrupted stream (models/fused.py:134-154).

    Same injection as the per-frame containment test: odometry emits
    NaN t_w whenever the scan has no sharp points, and frame 3 of 6 is
    fed an all-masked scan."""
    import jax.numpy as jnp

    import light_loam_tpu.models.fused as fused_mod
    from light_loam_tpu.models.fused import fused_chunk_step, fused_frame_step
    from light_loam_tpu.models.mapping import MappingState
    from light_loam_tpu.models.odometry import OdometryState

    base = PROFILES["hdl64-small"]
    # distinct static cfg → fresh traces with the wrapper in place
    cfg = dataclasses.replace(base, frame_budget_ms=43.0)
    world = World.urban(seed=25)
    frames = _frames(cfg, world, 6)
    # frame 3 diverges: empty scan → injected NaN odometry pose
    frames[3] = (frames[3][0], np.zeros_like(frames[3][1]))

    real_step = fused_mod.odometry_step

    def nan_on_empty(state, feats, ocfg, period):
        state2, odo = real_step(state, feats, ocfg, period)
        poison = jnp.where(feats.sharp.mask.any(), 0.0, jnp.nan)
        state2 = state2._replace(t_w=state2.t_w + poison)
        return state2, odo._replace(t_w=odo.t_w + poison)

    monkeypatch.setattr(fused_mod, "odometry_step", nan_on_empty)

    # per-frame fused reference over the same corrupted stream
    odo = OdometryState.init(cfg.scan.max_less_sharp, cfg.scan.max_less_flat)
    mp = MappingState.init(cfg.mapping)
    ref_map_t, ref_counts = [], []
    for xyz, mask in frames:
        odo, mp, o, mout, div = fused_frame_step(
            odo, mp, jnp.asarray(xyz), jnp.asarray(mask), cfg)
        ref_map_t.append(np.asarray(mout.t_w))
        ref_counts.append(int(mout.map_corner_points))

    # the whole corrupted stream as ONE chunk program
    odo2 = OdometryState.init(cfg.scan.max_less_sharp, cfg.scan.max_less_flat)
    mp2 = MappingState.init(cfg.mapping)
    xs = jnp.asarray(np.stack([f[0] for f in frames]))
    ms = jnp.asarray(np.stack([f[1] for f in frames]))
    odo2, mp2, outs = fused_chunk_step(odo2, mp2, xs, ms, cfg)

    # exactly the injected frame is flagged, nothing leaks NaN
    np.testing.assert_array_equal(
        np.asarray(outs.diverged),
        [False, False, False, True, False, False])
    assert np.isfinite(np.asarray(outs.map_t)).all()
    assert np.isfinite(np.asarray(outs.odom_t)).all()

    # contained frame holds the previous odometry pose and adds no map
    # points (empty stack: counts frozen at the previous frame's value)
    np.testing.assert_allclose(np.asarray(outs.odom_t)[3],
                               np.asarray(outs.odom_t)[2], atol=1e-5)
    counts = np.asarray(outs.map_corner_points)
    assert counts[3] == counts[2]
    assert ref_counts[3] == ref_counts[2]

    # later frames in the SAME chunk recover and keep tracking — they
    # match the per-frame fused path frame for frame (3 cm tolerance:
    # chunk-vs-per-frame compilation noise through discrete gates, same
    # mechanism as test_chunked_scan_matches_per_frame_fused)
    np.testing.assert_allclose(np.asarray(outs.map_t),
                               np.stack(ref_map_t), rtol=0, atol=3e-2)
    # counts match up to borderline voxel-dedup flips between the two
    # compilations (same gate-flip mechanism; observed off-by-one)
    np.testing.assert_allclose(counts, np.asarray(ref_counts),
                               rtol=0, atol=3)
    # NOTE: recovery *quality* after the empty frame is bounded by the
    # policy itself (the bad frame swapped an empty cloud into
    # corner_last/surf_last, so scan-to-scan has nothing to match until
    # the next swap) — that is identical in the per-frame path, which is
    # exactly what the allclose above gates.  Sanity: the chunk keeps
    # producing *new* map points after the divergence (map still alive).
    assert counts[5] > counts[3]
