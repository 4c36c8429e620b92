#!/bin/bash
# Stage 4 of the official chain: once all measurement stages are done,
# run the opt-in 10x-scale parity suite (evidence, not a gate — the
# sf0.01 mirror already passed this round).
set -u
cd /root/repo
LOG=scripts/official_runs.log
log() { echo "$(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }
while pgrep -f 'bash scripts/run_when_healthy.sh|bash scripts/targets_after_official.sh|bash scripts/cluster_after_targets.sh' > /dev/null 2>&1; do
  sleep 120
done
log "parity-sf01: starting"
SPARK_GRAFT_PARITY_SF01=1 python -m pytest tests/test_parity_sf01.py -q > scripts/parity_sf01.out 2>&1
log "parity-sf01: done rc=$? ($(tail -1 scripts/parity_sf01.out | tr -d '\n'))"
