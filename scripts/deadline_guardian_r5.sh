#!/bin/bash
# Round-5 guardian. If scripts/round_tail_chain.sh has not produced a
# HEALTHY full-suite bench (BENCH_HEALTHY.json with
# degraded_memory_window=false) by the deadline, re-take the flagged
# measurement on CURRENT (end-of-round-5) code: an honest upper bound
# (flag + probes embedded) that at least reflects the engine as
# shipped. Scaling/cluster artifacts are NOT re-run degraded — their
# top-level numbers report the latest trial, and a degraded trial
# would displace the healthy r3/r4 legs with host noise (same policy
# as deadline_guardian.sh / deadline_guardian_r4b.sh).
set -u
cd /root/repo
LOG=scripts/official_runs.log
log() { echo "$(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

DEADLINE_EPOCH=$(date -u -d "2026-08-19 16:40" +%s)

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
  healthy_done && { log "guardian-r5: healthy suite present — standing down"; exit 0; }
  sleep 120
done
healthy_done && exit 0

log "guardian-r5: deadline hit, no healthy window — FLAGGED re-run on current code"
pkill -f 'bash scripts/round_tail_chain.sh' 2>/dev/null
pkill -f 'scripts/health_watch.py' 2>/dev/null
sleep 2
while pgrep -f 'java.*org.apache.spark' > /dev/null 2>&1; do
  log "guardian-r5: waiting for Spark quiescence"; sleep 30
done
python bench.py > BENCH_HEALTHY.json 2> scripts/bench_healthy.stderr
log "guardian-r5: flagged suite rc=$? ($(head -c 160 BENCH_HEALTHY.json | tr -d '\n'))"
