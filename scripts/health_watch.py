"""Poll fresh-page fault-in bandwidth; exit 0 on the first healthy probe.

The box has documented degraded-memory windows (BASELINE.md:290-317)
where first-touch collapses to 0.01-1 GB/s vs 200+ healthy. Bench
measurements taken inside a window are host artifacts (VERDICT r3 #2),
so measurement tasks wait for this watcher.
"""
import sys, time
import numpy as np

THRESHOLD_GBPS = 50.0
INTERVAL_S = 60
MAX_WAIT_S = 4 * 3600

start = time.time()
while time.time() - start < MAX_WAIT_S:
    t0 = time.perf_counter()
    a = np.ones(2**27, dtype=np.uint8)
    gbps = 0.128 / (time.perf_counter() - t0)
    del a
    print(f"{time.strftime('%H:%M:%S')} fresh-touch {gbps:.2f} GB/s", flush=True)
    if gbps >= THRESHOLD_GBPS:
        # confirm with a second probe to avoid a single lucky page burst
        t0 = time.perf_counter()
        a = np.ones(2**27, dtype=np.uint8)
        gbps2 = 0.128 / (time.perf_counter() - t0)
        del a
        print(f"confirm {gbps2:.2f} GB/s", flush=True)
        if gbps2 >= THRESHOLD_GBPS:
            print("HEALTHY", flush=True)
            sys.exit(0)
    time.sleep(INTERVAL_S)
print("TIMEOUT still degraded", flush=True)
sys.exit(1)
