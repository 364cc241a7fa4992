#!/bin/bash
# Round-5 TPU measurement session.  Ordered by value-per-minute so a
# tunnel death partway still leaves the round's key artifacts:
#   1. bench   — r05 standing (validates the d6cb763 sweep reorder:
#                single AND chunked must land in one sweep)
#   2. ledger  — odometry per-op ledger incl. the 1-outer-iteration
#                stage variant (VERDICT r4 weak #5: ~12 ms unattributed)
#   3. lessflat— runs-mode device perf A/B (decides the default flip)
#   4. acc     — ACCURACY_TPU refresh on r04/r05 code (+ sparse + 3-rev)
#   5. ab      — batched vote xla-vs-pallas, bchunk honest, surf grid
#   6. micro   — primitive table
# Run from /root/repo when the tunnel is healthy AND bench_scaling is
# NOT running (host load poisons pinned timings — CLAUDE.md):
#   bash scripts/tpu_session_r05.sh [stage]
# stage: bench | ledger | lessflat | acc | ab | micro | all (default all)
set -u
cd /root/repo
STAGE="${1:-all}"
LOG=/tmp/tpu_r05_session.log
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

health() {
  timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
print('devices', jax.devices())
print('ok', float(np.asarray(jnp.ones((128,128))@jnp.ones((128,128)))[0,0]))
" >> "$LOG" 2>&1
}

if ! health; then log "tunnel DOWN — aborting"; exit 1; fi
log "tunnel healthy"

if [ "$STAGE" = all ] || [ "$STAGE" = bench ]; then
  log "full driver-style sweep (single -> chunked -> fused -> lanes)"
  timeout 700 python bench.py > /tmp/bench_r05_sweep.json 2>>"$LOG"
  log "bench rc=$? headline: $(cat /tmp/bench_r05_sweep.json)"
fi

if [ "$STAGE" = all ] || [ "$STAGE" = ledger ]; then
  log "odometry ledger profile (whole + whole_1it + per-op)"
  timeout 1500 python bench_profile.py --stage odometry \
    --out PROFILE_r05_odo.json >> "$LOG" 2>&1
  log "odometry profile rc=$?"
fi

if [ "$STAGE" = all ] || [ "$STAGE" = lessflat ]; then
  log "A/B lessflat exact vs runs (single mode, decides default)"
  LLT_LESSFLAT_MODE=runs timeout 500 python bench.py single \
    > /tmp/bench_r05_lessflat_runs.json 2>>"$LOG"
  log "lessflat=runs rc=$? -> $(cat /tmp/bench_r05_lessflat_runs.json)"
fi

if [ "$STAGE" = all ] || [ "$STAGE" = acc ]; then
  log "accuracy refresh: loop48 flagship (bench tier high)"
  LLT_MATMUL_PRECISION=high timeout 590 python bench_accuracy.py \
    > /tmp/acc_r05_loop48.json 2>>"$LOG"
  log "acc loop48 rc=$? -> $(cat /tmp/acc_r05_loop48.json)"
  log "accuracy: vlp16 sparse profile"
  LLT_ACC_PROFILE=vlp16 LLT_MATMUL_PRECISION=high timeout 590 \
    python bench_accuracy.py > /tmp/acc_r05_vlp16.json 2>>"$LOG"
  log "acc vlp16 rc=$? -> $(cat /tmp/acc_r05_vlp16.json)"
  log "accuracy: 3-revolution long-horizon (144 frames)"
  LLT_ACC_REVS=3 LLT_MATMUL_PRECISION=high timeout 1200 \
    python bench_accuracy.py > /tmp/acc_r05_rev3.json 2>>"$LOG"
  log "acc rev3 rc=$? -> $(cat /tmp/acc_r05_rev3.json)"
fi

if [ "$STAGE" = all ] || [ "$STAGE" = ab ]; then
  log "A/B batched vote backend (xla vs pallas), D2H-synced"
  for BK in xla pallas; do
    LLT_BATCH_VOTE_BACKEND=$BK timeout 900 python bench.py batched \
      > /tmp/bench_r05_batched_$BK.json 2>>"$LOG"
    log "batched vote=$BK rc=$? -> $(cat /tmp/bench_r05_batched_$BK.json)"
  done
  log "bchunk honest run"
  timeout 900 python bench.py bchunk > /tmp/bench_r05_bchunk.json 2>>"$LOG"
  log "bchunk rc=$? -> $(cat /tmp/bench_r05_bchunk.json)"
  log "surf_knn=grid stage-level confirmation"
  LLT_SURF_KNN=grid timeout 500 python bench.py single \
    > /tmp/bench_r05_surfgrid.json 2>>"$LOG"
  log "surf_knn=grid rc=$? -> $(cat /tmp/bench_r05_surfgrid.json)"
fi

if [ "$STAGE" = all ] || [ "$STAGE" = micro ]; then
  log "primitive microbench table"
  timeout 900 python bench_micro.py MICRO_r05.json >> "$LOG" 2>&1
  log "micro rc=$?"
fi
log "session done"
