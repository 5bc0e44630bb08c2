"""Similarity search over an embedding column (array<float>).

 * brute_force_topk — exact cosine top-k per query; the correctness
   baseline. Queries are broadcast (small side), the corpus streams.
 * lsh_bucketed_topk — random-hyperplane LSH with MULTI-PROBE: the
   corpus carries one sign-bit bucket key from D deterministic
   hyperplanes (precomputable, bucket-partitionable — the scale path);
   each query probes its own bucket plus every bucket within
   ``probe_flips`` Hamming bits, so recall is bought with extra probes
   on the (small) query side instead of extra corpus copies.
   Measured on the sf0.01 fixture with planted near-neighbors
   (tests/test_similarity_recall.py): 8 planes + 1-flip probing =
   recall@5 0.96 while scanning ~9% of the corpus per query.

Hyperplanes are pseudo-random but arithmetic-deterministic
(sin-free integer mixing), so a SQL oracle can reproduce them.

Sign-LSH math note: a probe matches a true neighbor at angle θ with
per-plane probability 1-θ/π, so bucketing only helps when genuine
near-neighbors exist (θ small). On uniformly random vectors (fixture
top-1 cosine ≈ 0.37, θ ≈ 68°) NO hashing scheme beats a linear scan —
recall there is measured on planted near-duplicates, the standard
ANN-benchmark methodology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pywdcollections_spark.operators.textops import as_double_array, cosine_double


def brute_force_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                     vec_col: str, qid_col: str | None = None,
                     k: int = 5) -> DataFrame:
    """Exact top-k: for each query vector, the k nearest corpus vectors
    by cosine (ties broken by ascending corpus id; a query's own id is
    excluded). Output: query_id, rank, neighbor_id, cos."""
    qid = qid_col or id_col
    # vectors widened to double ONCE per row (textops.as_double_array):
    # cosine over raw floats would pay three cast copies per PAIR
    q = F.broadcast(queries.select(F.col(qid).alias("query_id"),
                                   as_double_array(F.col(vec_col)).alias("qv")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      as_double_array(F.col(vec_col)).alias("cv"))
    scored = (q.crossJoin(c)
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", cosine_double(F.col("qv"), F.col("cv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cos"))


def _plane_array(plane_idx: int, dim: int) -> "F.Column":
    """The deterministic pseudo-hyperplane as a LITERAL double array:
    h[j][d] = ((j*1024 + d) * 2654435761 mod 1000) / 499.5 - 1. The
    components depend only on (plane, dim), so they are computed once
    driver-side (Python int arithmetic is exact; the final division is
    the same IEEE double Spark produces) instead of re-running the
    integer mixing per ELEMENT per ROW inside the fold lambda
    (r6 A/B: ~30% on corpus-side bucketing, bit-identical buckets)."""
    vals = [((plane_idx * 1024 + d) * 2654435761 % 1000) / 499.5 - 1.0
            for d in range(dim)]
    return F.array(*[F.lit(v) for v in vals])


def hyperplane_bit(vec, plane_idx: int, dim: int) -> "F.Column":
    """Sign bit of <vec, h_plane> (see _plane_array). The per-element
    cast handles raw float inputs scalar-wise — no array copy."""
    dot = F.aggregate(
        F.zip_with(vec, _plane_array(plane_idx, dim),
                   lambda x, h: x.cast("double") * h),
        F.lit(0.0), lambda acc, v: acc + v)
    return (dot > 0).cast("int")


def lsh_bucket(vec, n_planes: int, dim: int, plane_offset: int = 0) -> "F.Column":
    """Integer bucket key from ``n_planes`` sign bits. ``plane_offset``
    selects an independent hyperplane family (hash table)."""
    b = F.lit(0)
    for j in range(n_planes):
        b = b + hyperplane_bit(vec, plane_offset + j, dim) * (1 << j)
    return b


def probe_masks(n_planes: int, probe_flips: int) -> list[int]:
    """Multi-probe XOR masks: the exact bucket plus every bucket within
    ``probe_flips`` Hamming bits, generated combinatorially for any
    flip count (sum of C(n_planes, r) masks — the caller pays probe
    fan-out, never silently reduced recall)."""
    from itertools import combinations
    if not 0 <= probe_flips <= n_planes:
        raise ValueError(
            f"probe_flips must be in [0, n_planes={n_planes}], got {probe_flips}")
    masks = []
    for r in range(probe_flips + 1):
        for bits in combinations(range(n_planes), r):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def kmeans_centroids(corpus: DataFrame, id_col: str, vec_col: str,
                     k: int = 16, iters: int = 2, q_scale: int = 1_000_000) -> DataFrame:
    """Deterministic seeded k-means — the 'one extra job' that trains
    IVF centroids (returns (cent_id 0..k-1, centv array<double>) for
    ivf_topk's ``centroids`` input; everything downstream unchanged).

    Cross-engine reproducible by construction, so a SQL oracle can
    re-derive the SAME centroids bit-for-bit:
     * init = the k lowest-id corpus vectors (seeded, not random);
     * assignment = argmax of the 4-dp-rounded cosine, ties to the
       lowest cent_id (same comparator as the oracle's row_number);
     * update = mean over FIXED-POINT vectors: each component is
       quantized to round(x * q_scale) as int64 first, so the per-cell
       sums are exact integer arithmetic — order-INDEPENDENT, unlike a
       float sum whose value depends on partial-aggregation order —
       and the final division of exact integers is the same double in
       any engine. Empty cells keep their previous centroid.

    Spark shape: centroids broadcast each iteration; assignment is a
    map-side max_by; the update shuffles only (cell, dim) partial sums
    (k*dim groups — map-side combined, independent of corpus size)."""
    c = corpus.select(
        F.col(id_col).alias("nid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"))
    c = c.withColumn(
        "vi", F.transform("cv", lambda x: F.round(x * q_scale).cast("long")))
    cent = (c.orderBy("nid").limit(k)
            .select((F.row_number().over(Window.orderBy("nid")) - 1).alias("cent_id"),
                    F.col("cv").alias("centv")))
    for _ in range(iters):
        bc = F.broadcast(cent.select("cent_id", F.col("centv").alias("bcentv")))
        assigned = (c.crossJoin(bc)
                    .withColumn("cc", cosine_double(F.col("cv"), F.col("bcentv")))
                    .groupBy("nid")
                    .agg(F.max_by(
                        F.struct(F.col("vi").alias("vi"),
                                 F.col("cent_id").alias("cell")),
                        F.struct(F.col("cc").alias("cc"),
                                 (-F.col("cent_id")).alias("t"))).alias("s"))
                    .select(F.col("s.cell").alias("cell"), F.col("s.vi").alias("vi")))
        sums = (assigned.select("cell", F.posexplode("vi").alias("d", "val"))
                .groupBy("cell", "d")
                .agg(F.sum("val").alias("sv"), F.count("*").alias("n")))
        newc = (sums.groupBy("cell")
                .agg(F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "sv", "n"))),
                    lambda x: x["sv"].cast("double")
                    / (F.lit(float(q_scale)) * x["n"])).alias("ncentv")))
        cent = (cent.join(newc, cent["cent_id"] == newc["cell"], "left")
                .select("cent_id",
                        F.coalesce("ncentv", "centv").alias("centv")))
        # k rows: truncate lineage each round — otherwise every
        # downstream reference (assignment + probe joins) re-executes
        # the whole training subtree, and the plan grows per iteration
        cent = cent.localCheckpoint()
    return cent


def ivf_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
             vec_col: str, k: int = 5, n_centroids: int = 16,
             n_probe: int = 4, centroids: DataFrame | None = None) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the corpus is partitioned
    into ``n_centroids`` cells by nearest centroid; each query scans
    only its ``n_probe`` nearest cells.

    ``centroids`` (cent_id, centv) plugs in a trained table — see
    kmeans_centroids for the deterministic k-means job. Without it,
    centroids default to the ``n_centroids`` lowest-id corpus vectors
    (the zero-training baseline). Spark shape: the centroid table
    broadcasts, cell assignment is a broadcast cross join collapsed by
    a map-side max_by (16 rows per vector combine before any shuffle),
    and the probe join is an equi join on cell — the cell column is
    precomputable and partitionable at 100 TB."""
    # vectors widened to double ONCE per row (see brute_force_topk)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      as_double_array(F.col(vec_col)).alias("cv"))
    if centroids is None:
        centroids = (c.orderBy("neighbor_id").limit(n_centroids)
                     .select(F.col("neighbor_id").alias("cent_id"),
                             F.col("cv").alias("centv")))
    # k-row table: the no-op widen on already-double trained centroids
    # costs k rows once, and guards float centroids from external callers
    cent = F.broadcast(centroids.select(
        "cent_id", as_double_array(F.col("centv")).alias("centv")))
    cc = cosine_double(F.col("cv"), F.col("centv"))
    assigned = (c.crossJoin(cent)
                .withColumn("cc", cc)
                .groupBy("neighbor_id")
                .agg(F.max_by(
                    F.struct(F.col("cv").alias("cv"), F.col("cent_id").alias("cell")),
                    F.struct(F.col("cc").alias("cc"),
                             (-F.col("cent_id")).alias("nid"))).alias("s"))
                .select("neighbor_id", F.col("s.cv").alias("cv"),
                        F.col("s.cell").alias("cell")))
    q = (queries.select(F.col(id_col).alias("query_id"),
                        as_double_array(F.col(vec_col)).alias("qv"))
         .crossJoin(cent)
         .withColumn("cc", cosine_double(F.col("qv"), F.col("centv"))))
    wq = Window.partitionBy("query_id").orderBy(F.desc("cc"), F.asc("cent_id"))
    probes = (q.withColumn("rn", F.row_number().over(wq))
              .filter(F.col("rn") <= n_probe)
              .select("query_id", "qv", F.col("cent_id").alias("cell")))
    scored = (F.broadcast(probes).join(assigned, "cell")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", cosine_double(F.col("qv"), F.col("cv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cos"))


def lsh_bucketed_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                      vec_col: str, k: int = 5, n_planes: int = 8,
                      dim: int = 64, probe_flips: int = 1) -> DataFrame:
    """Approximate top-k with multi-probe: candidates restricted to the
    query's probe buckets. Same output shape as brute_force_topk (ranks
    within the probed candidate set). The corpus side keeps ONE bucket
    per vector (a precomputable partition key at 100 TB); the probe
    fan-out rides on the broadcast query side only."""
    # vectors widened to double ONCE per row; float->double is exact,
    # so lsh_bucket sign bits are unchanged
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      as_double_array(F.col(vec_col)).alias("cv")) \
              .withColumn("bucket", lsh_bucket(F.col("cv"), n_planes, dim))
    qb = (queries.select(F.col(id_col).alias("query_id"),
                         as_double_array(F.col(vec_col)).alias("qv"))
          .withColumn("qbucket", lsh_bucket(F.col("qv"), n_planes, dim)))
    masks = probe_masks(n_planes, probe_flips)
    q = F.broadcast(qb.withColumn(
        "bucket", F.explode(F.array(*[
            F.col("qbucket").bitwiseXOR(F.lit(m)) for m in masks]))))
    scored = (q.join(c, "bucket")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", cosine_double(F.col("qv"), F.col("cv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cos"))
