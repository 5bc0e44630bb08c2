"""Similarity search over an embedding column (array<float>).

 * brute_force_topk — exact cosine top-k per query; the correctness
   baseline. Queries are broadcast (small side), the corpus streams.
 * lsh_bucketed_topk — random-hyperplane LSH: sign-bit bucket key from
   D deterministic hyperplanes; candidates searched only within the
   query's bucket (plus ties resolved identically to brute force).
   The scale path: the corpus-side bucket key is precomputable and
   bucket-partitionable, turning top-k into a co-located join.

Hyperplanes are pseudo-random but arithmetic-deterministic
(sin-free integer mixing), so a SQL oracle can reproduce them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pywdcollections_spark.operators.textops import cosine


def brute_force_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                     vec_col: str, qid_col: str | None = None,
                     k: int = 5) -> DataFrame:
    """Exact top-k: for each query vector, the k nearest corpus vectors
    by cosine (ties broken by ascending corpus id; a query's own id is
    excluded). Output: query_id, rank, neighbor_id, cos."""
    qid = qid_col or id_col
    q = F.broadcast(queries.select(F.col(qid).alias("query_id"),
                                   F.col(vec_col).alias("qv")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (q.crossJoin(c)
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", cosine(F.col("qv"), F.col("cv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cos"))


def hyperplane_bit(vec, plane_idx: int, dim: int) -> "F.Column":
    """Sign bit of <vec, h_plane> for a deterministic pseudo-hyperplane:
    h[j][d] = ((j*1024 + d) * 2654435761 mod 1000) / 499.5 - 1."""
    dot = F.aggregate(
        F.zip_with(
            F.transform(vec, lambda x: x.cast("double")),
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda x, d: x * (((F.lit(plane_idx * 1024) + d) * 2654435761 % 1000)
                              .cast("double") / 499.5 - 1.0)),
        F.lit(0.0), lambda acc, v: acc + v)
    return (dot > 0).cast("int")


def lsh_bucket(vec, n_planes: int, dim: int) -> "F.Column":
    b = F.lit(0)
    for j in range(n_planes):
        b = b + hyperplane_bit(vec, j, dim) * (1 << j)
    return b


def lsh_bucketed_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                      vec_col: str, k: int = 5, n_planes: int = 4,
                      dim: int = 64) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. Same output shape as brute_force_topk (ranks within the
    bucket)."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv")) \
              .withColumn("bucket", lsh_bucket(F.col("cv"), n_planes, dim))
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   F.col(vec_col).alias("qv"))
                    .withColumn("bucket", lsh_bucket(F.col("qv"), n_planes, dim)))
    scored = (q.join(c, "bucket")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", cosine(F.col("qv"), F.col("cv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cos"))
