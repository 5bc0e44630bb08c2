"""A/B: two-phase salted canonicalize (salt_buckets=16) vs single-phase
unsalted (salt_buckets=1, max_by map-side partial combine as the skew
taming) on the full KG job.

Same protocol as the round-5 hash-aggregate experiment: pinned 4-core
child JVMs, 1.5M pages, interleaved ABBA legs so linear VM drift
cancels, warmup run per child before the timed run.

Usage: python BENCH/ab_salt.py [n_pages] [n_pairs] [cores]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys
sys.path.insert(0, %(repo)r)
from pywdcollections_spark.session import get_spark
import bench

cores = int(sys.argv[1]); n_pages = int(sys.argv[2])
spark = get_spark("absalt", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
bench.run_kg(spark, max(50_000, n_pages // 10), out_dir="/tmp/pywdc_absalt_warm")
r = bench.run_kg(spark, n_pages, out_dir="/tmp/pywdc_absalt_out")
print("RESULT " + json.dumps(r))
"""


def run_leg(cores: int, n_pages: int, salt_buckets: int) -> dict:
    code = CHILD % {"repo": REPO}
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code,
           str(cores), str(n_pages)]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, timeout=3600,
        env={**os.environ,
             "SPARK_GRAFT_DRIVER_MEM": f"{max(8, int(cores * 1.5))}g",
             "SPARK_GRAFT_BENCH_NPARTS": str(4 * cores),
             "SPARK_GRAFT_SALT_BUCKETS": str(salt_buckets)})
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT salt={salt_buckets}:\n"
                       f"{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    A, B = 16, 1          # A = salted two-phase, B = single-phase
    walls = {A: [], B: []}
    triples = set()
    for i in range(n_pairs):
        order = [A, B] if i % 2 == 0 else [B, A]
        for s in order:
            r = run_leg(cores, n_pages, s)
            walls[s].append(r["wall_s"])
            triples.add(r["n_triples"])
            print(json.dumps({"pair": i + 1, "salt_buckets": s,
                              "wall_s": r["wall_s"],
                              "n_triples": r["n_triples"]}), flush=True)
    assert len(triples) == 1, f"triple counts diverged: {triples}"
    print(json.dumps({
        "n_pages": n_pages, "cores": cores,
        "salted16_walls": walls[A], "single_walls": walls[B],
        "salted16_median": statistics.median(walls[A]),
        "single_median": statistics.median(walls[B]),
        "n_triples": triples.pop(),
    }))


if __name__ == "__main__":
    main()
