#!/bin/bash
# Final stage of the official healthy-window chain: after the targets
# refresh finishes, run the REAL-cluster scaling legs (N=2 vs 4N=8
# one-core executor JVMs) at sf0.1 x400 in a still-healthy window.
set -u
cd /root/repo
LOG=scripts/official_runs.log
log() { echo "$(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

while pgrep -f 'bash scripts/run_when_healthy.sh|bash scripts/targets_after_official.sh' > /dev/null 2>&1; do
  sleep 60
done

P=$(python3 -c "import time,numpy as np; t0=time.perf_counter(); a=np.ones(2**27,dtype=np.uint8); print(round(0.128/(time.perf_counter()-t0),2))")
if ! python3 -c "import sys; sys.exit(0 if float('$P') >= 50 else 1)"; then
  log "cluster: probe ${P} GB/s — window closed, waiting"
  python3 scripts/health_watch.py >> "$LOG" 2>&1 || { log "cluster: TIMEOUT waiting"; exit 1; }
fi
for FMT in html mixed; do
  while pgrep -f 'java.*org.apache.spark' > /dev/null 2>&1; do sleep 30; done
  log "cluster($FMT): running real-cluster scaling legs"
  SPARK_GRAFT_SCALE_FMT=$FMT python scripts/cluster_bench.py /root/testdata/sf0.1 \
    > scripts/cluster_bench_${FMT}.out 2>&1
  log "cluster($FMT): done rc=$? ($(tail -c 250 scripts/cluster_bench_${FMT}.out | tr -d '\n'))"
done
