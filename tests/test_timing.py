"""StageTimers — the TicToc replacement (utils/timing.py, SURVEY §5 A1).

The reference's observability contract: per-stage wall timers plus a
warning when a frame exceeds the 100 ms real-time budget
(tic_toc.h; scanRegistration.cpp:426-427).  Gates the structured
equivalents: stage stats accumulation, budget-overrun counting, report
rendering, and the profiler_trace hook producing an on-disk trace.
"""

import time

from light_loam_tpu.utils.timing import StageStats, StageTimers


def test_stage_stats_accumulate_and_report():
    t = StageTimers(budget_ms=15.0)
    for _ in range(3):
        with t.stage("features"):
            time.sleep(0.002)
        with t.stage("odometry"):
            time.sleep(0.001)
        t.frame_done()
    assert t.frames == 3
    st = t.stages["features"]
    assert st.count == 3
    assert st.mean_ms >= 2.0
    assert st.max_ms >= st.mean_ms
    # frame timer spans first stage() to frame_done
    assert t.stages["frame"].count == 3
    rep = t.report()
    assert "features: mean" in rep and "frames: 3" in rep


def test_budget_overrun_counts_slow_frames_only():
    t = StageTimers(budget_ms=5.0)
    with t.stage("fast"):
        pass
    t.frame_done()
    with t.stage("slow"):
        time.sleep(0.012)
    t.frame_done()
    assert t.overruns == 1
    assert "over 5 ms budget: 1" in t.report()


def test_frame_done_without_stage_counts_frame():
    t = StageTimers()
    t.frame_done()  # no stage ran — no frame stats, but the counter moves
    assert t.frames == 1
    assert "frame" not in t.stages


def test_stage_block_waits_on_device_value():
    import jax.numpy as jnp

    t = StageTimers()
    x = jnp.ones((64, 64))
    with t.stage("matmul", block=x @ x):
        pass
    assert t.stages["matmul"].count == 1


def test_profiler_trace_writes_artifacts(tmp_path):
    import jax.numpy as jnp

    t = StageTimers()
    d = tmp_path / "trace"
    with t.profiler_trace(str(d)):
        jnp.ones((8, 8)).sum().block_until_ready()
    # jax writes plugins/profile/<ts>/*; existence of any file is the gate
    produced = list(d.rglob("*"))
    assert any(p.is_file() for p in produced)
