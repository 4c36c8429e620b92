#!/bin/bash
# Round-4 continuation guardian. The 17:20 flagged official suite
# (BENCH_HEALTHY.json, degraded_memory_window=true) predates the
# post-flag structural fixes (assign_cells argmax, max_by argmax,
# curation stage persists — BASELINE.md "Post-flag structural fixes"),
# so if scripts/round_tail_chain.sh has not produced a HEALTHY suite
# by the deadline, re-take the flagged measurement on CURRENT code:
# still an honest upper bound (flag + probes embedded), but one that
# reflects the engine as shipped. Scaling/cluster artifacts are NOT
# re-run degraded: they report the latest trial as their top-level
# numbers, and a degraded trial would displace the healthy r3 legs
# with host noise (same policy as deadline_guardian.sh).
set -u
cd /root/repo
LOG=scripts/official_runs.log
log() { echo "$(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

DEADLINE_EPOCH=$(date -u -d "2026-08-19 03:00" +%s)

healthy_done() {
  python3 - <<'EOF'
import json, sys
try:
    d = json.load(open("BENCH_HEALTHY.json"))
except Exception:
    sys.exit(1)
sys.exit(0 if d.get("degraded_memory_window") is False else 1)
EOF
}

while [ "$(date -u +%s)" -lt "$DEADLINE_EPOCH" ]; do
  healthy_done && { log "guardian-r4b: healthy suite present — standing down"; exit 0; }
  sleep 120
done
healthy_done && exit 0

log "guardian-r4b: deadline hit, no healthy window — FLAGGED re-run on current code"
pkill -f 'bash scripts/round_tail_chain.sh' 2>/dev/null
pkill -f 'scripts/health_watch.py' 2>/dev/null
sleep 2
while pgrep -f 'java.*org.apache.spark' > /dev/null 2>&1; do
  log "guardian-r4b: waiting for Spark quiescence"; sleep 30
done
python bench.py > BENCH_HEALTHY.json 2> scripts/bench_healthy.stderr
log "guardian-r4b: flagged suite rc=$? ($(head -c 160 BENCH_HEALTHY.json | tr -d '\n'))"
