#!/bin/bash
# Follow-up to last_chance_healthy.sh: if the last-chance watcher
# lands a healthy headline suite (BENCH_HEALTHY.json with
# degraded_memory_window:false), refresh BENCH_TARGETS.json and the
# real-cluster scaling legs in the same still-healthy window and
# commit the artifacts. Separate file because the watcher is already
# running (bash reads scripts incrementally — never edit a live one).
set -u
cd /root/repo
LOG=scripts/official_runs.log
log() { echo "$(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }
probe() { python3 -c "import time,numpy as np; t0=time.perf_counter(); a=np.ones(2**27,dtype=np.uint8); print(round(0.128/(time.perf_counter()-t0),2))"; }
healthy() { python3 -c "import sys; sys.exit(0 if float('$1') >= 50 else 1)"; }

log "=== after_lastchance armed (pid $$) ==="
while pgrep -f 'bash /root/repo/scripts/last_chance_healthy.sh' > /dev/null 2>&1 \
   || pgrep -f 'bash scripts/last_chance_healthy.sh' > /dev/null 2>&1; do
  sleep 60
done
if ! python3 -c "import json,sys; d=json.load(open('BENCH_HEALTHY.json')); sys.exit(0 if d.get('degraded_memory_window') is False else 1)"; then
  log "after_lastchance: watcher exited without a healthy suite — nothing to follow up"
  exit 0
fi

P=$(probe)
if ! healthy "$P"; then
  log "after_lastchance: healthy suite landed but window closed (${P} GB/s) — skipping follow-ups"
  exit 0
fi
log "after_lastchance: window still healthy (${P} GB/s) — targets + cluster legs"
while pgrep -f 'java.*org.apache.spark' > /dev/null 2>&1; do sleep 20; done
python bench.py --targets > scripts/targets_lastchance.out 2>&1
log "after_lastchance: targets rc=$? ($(head -c 200 BENCH_TARGETS.json | tr -d '\n'))"
for FMT in html mixed; do
  P=$(probe)
  healthy "$P" || { log "after_lastchance: window closed before cluster($FMT) (${P} GB/s)"; break; }
  while pgrep -f 'java.*org.apache.spark' > /dev/null 2>&1; do sleep 20; done
  SPARK_GRAFT_SCALE_FMT=$FMT python scripts/cluster_bench.py /root/testdata/sf0.1 \
    > scripts/cluster_bench_${FMT}_lastchance.out 2>&1
  log "after_lastchance: cluster($FMT) rc=$? ($(tail -c 200 scripts/cluster_bench_${FMT}_lastchance.out | tr -d '\n'))"
done
git add BENCH_TARGETS.json BENCH_CLUSTER.json BENCH_CLUSTER_mixed.json 2>/dev/null
git commit -q -m "Healthy-window follow-up measurements (targets + cluster scaling legs)

No-Verification-Needed: measurement artifacts only" || log "after_lastchance: nothing to commit"
log "after_lastchance: done"
