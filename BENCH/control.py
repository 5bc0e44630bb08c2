"""Zero-shuffle control job: this box's measured parallel-scaling
CEILING for ANY Spark job (round-3 conclusion, now a repo file).

The job reads the SAME pages parquet the scaling pipeline reads and
computes sha256 over each page's html via mapInPandas -> count: same
scan, same Arrow crossing shape, ZERO shuffles/joins/barriers. Run
through the identical taskset-pinned two-size harness as
BENCH/scaling.py, its efficiency is the hardware term (shared
memory-bandwidth CPU inflation at higher proc counts) that a real
multi-executor cluster does not share; pipeline_efficiency /
control_efficiency cancels exactly that term while keeping every
plan-level inefficiency visible.

Usage: python BENCH/control.py [n_pages]   (env: SPARK_GRAFT_SCALING_SIZES)
Appends its result to BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pywdcollections_spark.session import get_spark
import bench

cores = int(sys.argv[1]); n_pages = int(sys.argv[2])
spark = get_spark("control-%%d" %% cores, cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
path = bench.pages_parquet(spark, n_pages, 42,
                           bench.os.environ.get("SPARK_GRAFT_BENCH_CACHE",
                                                "/tmp/pywdc_bench"))

def run():
    import pandas as pd, hashlib
    df = spark.read.parquet(path)
    def h(batches):
        for pdf in batches:
            yield pd.DataFrame({"d": [hashlib.sha256(bytes(x)).hexdigest()
                                      for x in pdf["html"]]})
    t0 = time.time()
    n = df.mapInPandas(h, schema="d string").count()
    return time.time() - t0, n

run()                      # warmup (JIT / python daemons)
walls = [run()[0] for _ in range(2)]
print("RESULT " + json.dumps({"wall_s": round(min(walls), 2),
                              "all_walls": [round(w, 2) for w in walls]}))
"""


def run_size(cores: int, n_pages: int) -> dict:
    code = CHILD % {"repo": REPO}
    cmd = [sys.executable, "-c", code, str(cores), str(n_pages)]
    if cores < os.cpu_count():
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, timeout=3600,
        env={**os.environ,
             "SPARK_GRAFT_DRIVER_MEM": f"{max(8, int(cores * 1.5))}g"})
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}:\n{out.stdout[-2000:]}"
                       f"\n{out.stderr[-3000:]}")


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    sizes = [int(x) for x in
             os.environ.get("SPARK_GRAFT_SCALING_SIZES", "2,8").split(",")]
    n_small, n_big = sizes[0], sizes[1]
    small = run_size(n_small, n_pages)
    big = run_size(n_big, n_pages)
    eff = (small["wall_s"] / big["wall_s"]) / (n_big / n_small)
    result = {"control": "sha256-mapInPandas-count", "n_pages": n_pages,
              "sizes": sizes, "wall_small": small["wall_s"],
              "wall_big": big["wall_s"], "control_efficiency": round(eff, 3)}
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(f"\ncontrol ceiling ({n_small}->{n_big} cores, {n_pages} pages): "
                f"{small['wall_s']} s -> {big['wall_s']} s = "
                f"**{round(eff, 3)}** (walls {small['all_walls']} / "
                f"{big['all_walls']})\n")


if __name__ == "__main__":
    main()
