"""Memory-bandwidth control for the scaling criterion (round 5).

The zero-shuffle CPU control (BENCH/control.py) proves the box gives
4x of COMPUTE to 4 pinned procs (~1.0-1.04). This control measures the
other shared resource: DRAM bandwidth. Each worker runs a STREAM-triad
-like loop (a = b + s*c over ~256 MB numpy arrays — far beyond LLC) on
its own pinned core; the harness reports per-proc and AGGREGATE GB/s
at 1 and 4 procs and their ratio.

Why it matters: the round-5 task-time decomposition (BENCH/BASELINE.md)
shows the KG job's 1-vs-4 efficiency deficit is ~20% TASK-TIME
INFLATION at 4 procs concentrated in shuffle/sort/write stages (the
bandwidth-bound ops), with driver-serial gaps only ~4% of the wall.
If aggregate triad bandwidth at 4 procs is well under 4x the 1-proc
number, the inflation is a single-box memory-system ceiling — a real
N-vs-4N EXECUTOR cluster adds a full memory system per node and does
not share this ceiling, so the single-box ratio understates real
cluster scaling.

Two access patterns: "triad" (pure sequential stream — parquet scan /
shuffle write analogue) and "gather" (random-permutation gather —
the latency-bound access shape of sort-based aggregation and shuffle
reads, which is where the KG job's task-time inflation concentrates).

Usage: python BENCH/membw_control.py [mb_per_worker] [seconds] [mode]
Prints one JSON line.
"""

from __future__ import annotations

import json
import subprocess
import sys

WORKER = r"""
import sys, time
import numpy as np
mb = int(sys.argv[1]); secs = float(sys.argv[2]); mode = sys.argv[3]
n = mb * 1024 * 1024 // 8
rng = np.random.default_rng(0)
b = rng.random(n); a = np.empty_like(b)
if mode == "gather":
    idx = rng.permutation(n)
    np.take(b, idx, out=a)                     # warm
    t0 = time.time(); it = 0
    while time.time() - t0 < secs:
        np.take(b, idx, out=a)                 # random-read b, write a
        it += 1
    dt = time.time() - t0
    # traffic floor: idx read + a write + b cacheline-granular reads
    # (counted as n*8 — an UNDERestimate of real DRAM traffic, but the
    # same formula at both sizes so the RATIO is unaffected)
    gb = it * 3 * n * 8 / 1e9
else:
    c = rng.random(n); s = 1.1
    np.multiply(c, s, out=a); a += b           # warm
    t0 = time.time(); it = 0
    while time.time() - t0 < secs:
        np.multiply(c, s, out=a)               # a = s*c (read c, write a)
        a += b                                 # a += b  (read a+b, write a)
        it += 1
    dt = time.time() - t0
    # triad moves ~5 arrays of traffic per iteration (2 reads + write,
    # then read+read+write with write-allocate ~ kept simple at 5n*8)
    gb = it * 5 * n * 8 / 1e9
print(gb / dt)
"""


def run(nproc: int, mb: int, secs: float, mode: str) -> dict:
    procs = []
    for i in range(nproc):
        cmd = ["taskset", "-c", str(i), sys.executable, "-c", WORKER,
               str(mb), str(secs), mode]
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True))
    rates = [float(p.communicate()[0].strip()) for p in procs]
    return {"nproc": nproc, "per_proc_gbps": [round(r, 2) for r in rates],
            "aggregate_gbps": round(sum(rates), 2)}


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
    mode = sys.argv[3] if len(sys.argv) > 3 else "triad"
    one = run(1, mb, secs, mode)
    four = run(4, mb, secs, mode)
    ratio = four["aggregate_gbps"] / one["aggregate_gbps"]
    print(json.dumps({"mb_per_worker": mb, "seconds": secs, "mode": mode,
                      "one": one, "four": four,
                      "bw_scaling_4x": round(ratio, 3),
                      "bw_efficiency": round(ratio / 4, 3)}))


if __name__ == "__main__":
    main()
