#!/bin/bash
# Round-4 TPU measurement session: run when the tunnel is healthy.
# Each step is independently timeout-guarded and appends to the log;
# artifacts land in the repo root.  Run from /root/repo:
#   bash scripts/tpu_session_r04.sh [stage]
# stage: profile | ab | bench | all (default all)
set -u
cd /root/repo
STAGE="${1:-all}"
LOG=/tmp/tpu_r04_session.log
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

if [ "$STAGE" = all ] || [ "$STAGE" = profile ]; then
  # per-op attribution with the new sorted-merge + whole-stage entries
  log "bench_profile (mapping+features+odometry, ~20-40 min)"
  timeout 3000 python bench_profile.py --out PROFILE_r04b.json \
    >> "$LOG" 2>&1
  log "profile rc=$?"
fi

if [ "$STAGE" = all ] || [ "$STAGE" = ab ]; then
  # VERDICT r3 #4a: batched vote backend, D2H-synced, in one process
  log "A/B batched vote backend (xla vs pallas)"
  for BK in xla pallas; do
    LLT_BATCH_VOTE_BACKEND=$BK timeout 900 python bench.py batched \
      >> "$LOG" 2>&1
    log "batched vote=$BK rc=$?"
  done
  # VERDICT r3 #4b: bchunk honest slot
  log "bchunk honest run"
  timeout 900 python bench.py bchunk >> "$LOG" 2>&1
  log "bchunk rc=$?"
fi

if [ "$STAGE" = all ] || [ "$STAGE" = bench ]; then
  log "full bench sweep (driver-equivalent)"
  timeout 700 python bench.py >> "$LOG" 2>&1
  log "bench rc=$?"
fi
log "session done"
