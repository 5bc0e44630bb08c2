"""Spark builders for the fixture tables — distributed generation.

Page generation fans out over ``spark.range(n_pages)`` with
``mapInPandas`` (each page derives from seed+page_id alone), so the
bench-scale table (~2M pages) renders in parallel without a driver
loop. Dim tables are driver-built (config-sized) and broadcast at join
time.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pywdcollections_spark.testkit import generate as G

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])

HARVESTED_SCHEMA = T.StructType([
    T.StructField("subj", T.StringType()),
    T.StructField("pred", T.StringType()),
    T.StructField("obj_raw", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("url", T.StringType()),
])

ENTITIES_SEED_SCHEMA = T.StructType(
    [T.StructField("qid", T.StringType()),
     T.StructField("last_modified", T.TimestampType())]
    + [T.StructField(p, T.StringType(), True)
       for p in ("P17", "P18", "P131", "P154", "P281", "P373",
                 "P571", "P625", "P856", "P1866", "P2971")]
)


def pages_df(spark: SparkSession, n_pages: int, seed: int = 42,
             head_templates: int = 200, partitions: int | None = None) -> DataFrame:
    parts = partitions or max(8, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = [G.page_row(seed, int(i), n_pages, head_templates)
                    for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in PAGES_SCHEMA])

    return (spark.range(n_pages).repartition(parts)
            .mapInPandas(gen, schema=PAGES_SCHEMA))


def expected_harvested_df(spark: SparkSession, n_pages: int, seed: int = 42,
                          head_templates: int = 200) -> DataFrame:
    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rows.extend(G.expected_harvested_rows(seed, int(i), n_pages, head_templates))
            yield pd.DataFrame(rows, columns=[f.name for f in HARVESTED_SCHEMA])

    return (spark.range(n_pages)
            .repartition(max(8, spark.sparkContext.defaultParallelism))
            .mapInPandas(gen, schema=HARVESTED_SCHEMA))


def expected_text_df(spark: SparkSession, n_pages: int, seed: int = 42,
                     head_templates: int = 200) -> DataFrame:
    schema = T.StructType([T.StructField("url", T.StringType()),
                           T.StructField("text_sha256", T.StringType())])

    def gen(batches):
        for pdf in batches:
            rows = [G.expected_text_rows(seed, int(i), n_pages, head_templates)
                    for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["url", "text_sha256"])

    return (spark.range(n_pages)
            .repartition(max(8, spark.sparkContext.defaultParallelism))
            .mapInPandas(gen, schema=schema))


def dim_dfs(spark: SparkSession, n_pages: int, seed: int = 42) -> dict[str, DataFrame]:
    d = G.dim_rows(n_pages, seed)
    out = {}
    out["sitelinks"] = spark.createDataFrame(d["sitelinks"], "site string, title string, qid string")
    out["redirects"] = spark.createDataFrame(d["redirects"], "site string, from_title string, to_title string")
    out["template_redirects"] = spark.createDataFrame(
        d["template_redirects"], "site string, alias_lc string, canonical_lc string")
    out["target_p31"] = spark.createDataFrame(d["target_p31"], "qid string, p31 long")
    out["class_p279"] = spark.createDataFrame(d["class_p279"], "class_qid long, super_qid long")
    out["items"] = spark.createDataFrame(d["items"], "qid string")
    out["entities_seed"] = spark.createDataFrame(
        [tuple(r[f.name] for f in ENTITIES_SEED_SCHEMA) for r in d["entities_seed"]],
        ENTITIES_SEED_SCHEMA)
    out["commons_categories"] = spark.createDataFrame(d["commons_categories"], "title string")
    out["sources"] = spark.createDataFrame(d["sources"], "site string, site_qid long")
    return out
