"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship KG-construction pipeline; ``queries`` /
``oracle_sql`` expose the SURVEY.md §2 operator registry with DuckDB
oracles (pywdcollections_spark.queries).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ship(spark: SparkSession) -> None:
    from pywdcollections_spark.session import _ship_package
    _ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end KG construction (extract -> parse -> map ->
    link -> canonicalize -> validate) over the deterministic fixture
    pages table, scaled by the sf0.001 documents row count."""
    _ship(spark)
    from pywdcollections_spark.config import demo_config
    from pywdcollections_spark.plans.pipeline import build_kg
    from pywdcollections_spark.testkit import spark_tables as TK

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = max(100, docs.count())
    pages = TK.pages_df(spark, n, seed=42, head_templates=25)
    dims = TK.dim_dfs(spark, n, seed=42)
    return build_kg(spark, pages, demo_config(), dims)["triples"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pywdcollections_spark.queries import QUERIES

    def wrap(fn):
        def run(spark, sf_dir):
            _ship(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from pywdcollections_spark.queries import ORACLES, ensure_golden_harvest_parquet
    # the kg_harvest_fixture oracle reads a pre-written golden parquet
    # (independent generator); make sure it exists before DuckDB runs
    ensure_golden_harvest_parquet()
    return dict(ORACLES)
