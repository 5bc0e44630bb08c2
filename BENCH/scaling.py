"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8
between N and 4N executors).

No real cluster exists in this sandbox, so per the driver's
instruction the criterion is evidenced by running the IDENTICAL job at
two local parallelism levels on the SAME input with partition counts
scaled with cores, in separate CPU-pinned JVM processes (one
spark-submit-equivalent process per size). Efficiency =
(throughput_4N / throughput_N) / 4.

Protocol (round 3): the shared VM's per-core capacity drifts ~1.6x
over minutes, so a single N-then-4N sequence measures weather as much
as the job. This runner therefore executes PAIRED, INTERLEAVED reps —
pair i runs the two sizes back-to-back, alternating order (N,4N /
4N,N / N,4N ...) so linear capacity drift cancels across pairs — and
reports the MEDIAN of per-pair efficiencies, which is the number the
criterion gates on.

Usage: python BENCH/scaling.py [n_pages]  ->  one JSON line + appends
a row to BENCH/BASELINE.md.

Env knobs:
  SPARK_GRAFT_SCALING_SIZES   "2,8" (default; see hardware note in main)
  SPARK_GRAFT_SCALING_PAIRS   number of interleaved pairs (default 3)
  SPARK_GRAFT_SCALING_NPARTS_MULT  parse partitions per core (default 4,
      applied identically at both sizes: straggler smoothing, same
      plan shape)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time, shutil
sys.path.insert(0, %(repo)r)
from pywdcollections_spark.session import get_spark
from pywdcollections_spark.config import demo_config
from pywdcollections_spark.plans.pipeline import build_kg
from pywdcollections_spark.testkit import spark_tables as TK
import bench

cores = int(sys.argv[1]); n_pages = int(sys.argv[2])
spark = get_spark("scaling-%%d" %% cores, cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
# warmup run (JIT / codegen / python-daemon pool), then the timed run —
# a long-lived cluster is warm; cold-start is not what the scaling
# criterion measures
bench.run_kg(spark, max(50_000, n_pages // 10), out_dir="/tmp/pywdc_scaling_warm_%%d" %% cores)
reps = []
for r in range(int(os.environ.get('SPARK_GRAFT_SCALING_REPS', '1'))):
    reps.append(bench.run_kg(spark, n_pages, out_dir="/tmp/pywdc_scaling_out_%%d" %% cores))
best = min(reps, key=lambda x: x["wall_s"])
best["all_walls"] = [x["wall_s"] for x in reps]
print("RESULT " + json.dumps(best))
"""


def run_size(cores: int, n_pages: int) -> dict:
    """One child process per cluster size, CPU-pinned: local[N] alone
    does not bound Python UDF workers (they are separate processes), so
    taskset caps the whole process tree at N physical cores — the
    faithful N-core-cluster proxy on one box."""
    code = CHILD % {"repo": REPO}
    cmd = [sys.executable, "-c", code, str(cores), str(n_pages)]
    if cores < os.cpu_count():
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    mult = os.environ.get("SPARK_GRAFT_SCALING_NPARTS_MULT", "4")
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, timeout=3600,
        # heap scales with cluster size: a 4N cluster has 4N aggregate memory
        env={**os.environ,
             "SPARK_GRAFT_DRIVER_MEM": f"{max(8, int(cores * 1.5))}g",
             "SPARK_GRAFT_BENCH_NPARTS": str(int(mult) * cores)})
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    # N and 4N: default 2 vs 8 cores. Measured hardware note: this VM
    # exposes 32 vCPUs but sustains only ~16 cores of throughput (SMT /
    # hypervisor cap: 32-proc burn = 162M iters/s burst, 92M sustained),
    # so 8-vs-32 can never exhibit 4x; 2-vs-8 sits fully inside the
    # physical capacity (measured 13.5 vs 55.9M iters/s = 4.1x).
    sizes = [int(x) for x in os.environ.get("SPARK_GRAFT_SCALING_SIZES", "2,8").split(",")]
    n_small, n_big = sizes[0], sizes[1]
    n_pairs = int(os.environ.get("SPARK_GRAFT_SCALING_PAIRS", "3"))
    factor = n_big / n_small

    pairs = []
    for i in range(n_pairs):
        order = [n_small, n_big] if i % 2 == 0 else [n_big, n_small]
        res = {}
        for c in order:
            res[c] = run_size(c, n_pages)
        eff = (res[n_big]["triples_per_sec"] /
               res[n_small]["triples_per_sec"]) / factor
        pairs.append({"order": order, "small": res[n_small], "big": res[n_big],
                      "efficiency": round(eff, 3)})
        print(json.dumps({"pair": i + 1, "of": n_pairs,
                          "wall_small": res[n_small]["wall_s"],
                          "wall_big": res[n_big]["wall_s"],
                          "efficiency": round(eff, 3)}), flush=True)

    effs = [p["efficiency"] for p in pairs]
    med_eff = statistics.median(effs)
    med_wall_s = statistics.median(p["small"]["wall_s"] for p in pairs)
    med_wall_b = statistics.median(p["big"]["wall_s"] for p in pairs)
    med_tps_s = statistics.median(p["small"]["triples_per_sec"] for p in pairs)
    med_tps_b = statistics.median(p["big"]["triples_per_sec"] for p in pairs)
    result = {
        "n_pages": n_pages,
        "sizes": [n_small, n_big],
        "pairs": pairs,
        "per_pair_efficiency": effs,
        "median_wall_small": med_wall_s, "median_wall_big": med_wall_b,
        "throughput_small_triples_per_sec": med_tps_s,
        "throughput_big_triples_per_sec": med_tps_b,
        "scaling_efficiency": round(med_eff, 3),
    }
    print(json.dumps(result))
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write(f"\n| {n_pages} | {n_small}->{n_big} | {med_wall_s} | {med_wall_b} | "
                f"{med_tps_s} | {med_tps_b} | "
                f"**{round(med_eff, 3)}** (median of {len(effs)} interleaved "
                f"pairs: {effs}) |\n")


if __name__ == "__main__":
    main()
