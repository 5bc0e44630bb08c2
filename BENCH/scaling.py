"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8
between N and 4N executors).

No real cluster exists in this sandbox, so per the driver's
instruction the criterion is evidenced by running the IDENTICAL job at
two local parallelism levels (local[8] vs local[32]) on the SAME input
with partition counts scaled with cores, in separate JVMs (one
spark-submit-equivalent process per size). Efficiency =
(throughput_32 / throughput_8) / 4.

Usage: python BENCH/scaling.py [n_pages]  ->  one JSON line + appends
a row to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
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
res = bench.run_kg(spark, n_pages, out_dir="/tmp/pywdc_scaling_out_%%d" %% cores)
print("RESULT " + json.dumps(res))
"""


def run_size(cores: int, n_pages: int) -> dict:
    code = CHILD % {"repo": REPO}
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_pages)],
        capture_output=True, text=True, cwd=REPO, timeout=1800,
        env={**os.environ, "SPARK_GRAFT_DRIVER_MEM": "6g"})
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    # warm the shared pages parquet cache once (generation excluded from timing)
    r8 = run_size(8, n_pages)
    r32 = run_size(32, n_pages)
    eff = (r32["triples_per_sec"] / r8["triples_per_sec"]) / 4
    result = {
        "n_pages": n_pages,
        "local8": r8, "local32": r32,
        "throughput_8_triples_per_sec": r8["triples_per_sec"],
        "throughput_32_triples_per_sec": r32["triples_per_sec"],
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    print(json.dumps(result))
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write(f"\n| {n_pages} | {r8['wall_s']} | {r32['wall_s']} | "
                f"{r8['triples_per_sec']} | {r32['triples_per_sec']} | "
                f"{round(eff, 3)} |\n")


if __name__ == "__main__":
    main()
