#!/bin/bash
# Round-4 TPU measurement session B: pending A/Bs + re-profile after the
# compaction/merge work.  Run when the tunnel is healthy, from /root/repo:
#   bash scripts/tpu_session_r04b.sh [stage]
# stage: bench | lessflat | ab | micro | profile | all (default all)
set -u
cd /root/repo
STAGE="${1:-all}"
LOG=/tmp/tpu_r04b_session.log
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
  log "single+chunked bench (validates compaction changes)"
  timeout 700 python bench.py >> "$LOG" 2>&1
  log "bench rc=$?"
fi

if [ "$STAGE" = all ] || [ "$STAGE" = lessflat ]; then
  log "A/B lessflat exact vs runs (single mode)"
  LLT_LESSFLAT_MODE=runs timeout 500 python bench.py single \
    >> "$LOG" 2>&1
  log "lessflat=runs rc=$?"
  log "A/B surf_knn grid vs tiled-default (single mode)"
  LLT_SURF_KNN=grid timeout 500 python bench.py single >> "$LOG" 2>&1
  log "surf_knn=grid rc=$?"
fi

if [ "$STAGE" = all ] || [ "$STAGE" = ab ]; then
  log "A/B batched vote backend (xla vs pallas), D2H-synced"
  for BK in xla pallas; do
    LLT_BATCH_VOTE_BACKEND=$BK timeout 900 python bench.py batched \
      >> "$LOG" 2>&1
    log "batched vote=$BK rc=$?"
  done
  log "bchunk honest run"
  timeout 900 python bench.py bchunk >> "$LOG" 2>&1
  log "bchunk rc=$?"
fi

if [ "$STAGE" = all ] || [ "$STAGE" = micro ]; then
  log "primitive microbench table"
  timeout 900 python bench_micro.py MICRO_r04.json >> "$LOG" 2>&1
  log "micro rc=$?"
fi

if [ "$STAGE" = all ] || [ "$STAGE" = profile ]; then
  log "mapping re-profile (gather variants, knn skip entries)"
  timeout 1800 python bench_profile.py --stage mapping \
    --out PROFILE_r04c.json >> "$LOG" 2>&1
  log "profile rc=$?"
fi
log "session done"
