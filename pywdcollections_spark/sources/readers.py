"""Pages-table readers: one schema (BASELINE.json input_hint), several
wire formats.

A web corpus arrives as parquet (the fast path: columnar, predicate
pushdown) or as JSON-lines dumps (the common crawl-style interchange
shape). Binary html cannot ride raw JSON, so the JSONL profile carries
it base64-encoded in ``html_b64`` and the reader unbase64s it back to
binary JVM-side — the downstream pipeline sees the identical schema
either way. CSV is deliberately NOT offered: multiline wikitext +
binary payloads make it a corruption trap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])

_JSONL_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.StringType()),      # ISO-8601 string on the wire
    T.StructField("html_b64", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def read_pages(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Load a pages table in the input_hint schema from ``fmt``
    ('parquet' | 'jsonl')."""
    if fmt == "parquet":
        return spark.read.schema(PAGES_SCHEMA).parquet(path)
    if fmt == "jsonl":
        raw = spark.read.schema(_JSONL_SCHEMA).json(path)
        return raw.select(
            "url",
            F.to_timestamp("warc_ts").alias("warc_ts"),
            F.unbase64("html_b64").alias("html"),
            "text", "lang")
    raise ValueError(f"unknown pages format {fmt!r}")


def write_pages_jsonl(pages: DataFrame, path: str) -> None:
    """Inverse profile writer (round-trip testing / interchange)."""
    (pages.select(
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").alias("warc_ts"),
        F.base64("html").alias("html_b64"),
        "text", "lang")
     .write.mode("overwrite").json(path))
