"""Round-7 measurement harness (guide §1): per-query noop-sink timing
plus .explain("formatted") capture for every declared query, WITHOUT
touching the frozen bench.py.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        [--tag before] [--queries a,b,c] [--repeats 2] [--no-plans]

Writes plans to plans/r07/<query>_<tag>.txt and prints one JSON line
with the per-query median wall seconds (min also recorded). The timing
methodology matches bench.py exactly (noop sink over the same QUERIES
registry at $SPARK_GRAFT_SF_DIR) so numbers are comparable, but runs
each query `repeats` times for a tighter signal on a noisy shared VM.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pywdcollections_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None,
                    help="plan-file suffix (e.g. before/after); omit to skip")
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset (default: bench HEADLINE)")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--plans-dir", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "plans", "r07"))
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("pywdc-bench-extra", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pywdcollections_spark.queries import QUERIES
    import bench as B
    names = (args.queries.split(",") if args.queries else list(B.HEADLINE))

    if args.tag and not args.no_plans:
        os.makedirs(args.plans_dir, exist_ok=True)

    out: dict[str, float] = {}
    mins: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        if args.tag and not args.no_plans:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans_dir,
                                   f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
        walls = []
        for _ in range(max(1, args.repeats)):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 2))
        spark.sparkContext.setJobDescription(None)
        out[name] = round(statistics.median(walls), 2)
        mins[name] = min(walls)
        print(f"# {name}: median={out[name]} samples={walls}",
              file=sys.stderr, flush=True)

    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "repeats": args.repeats,
                      "queries": out, "queries_min": mins}))


if __name__ == "__main__":
    main()
