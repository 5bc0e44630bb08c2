"""Deduplication operators for large-scale training-data pipelines.

Five strategies over a document table, each a declarative DataFrame
plan designed for the 100 TB shape:

 * exact            — md5 groupBy (map-side partial agg; no skew issue
                      because the hash key is uniform)
 * minhash_lsh      — shingle -> k minhashes -> bands -> bucket join;
                      candidate pairs verified with exact Jaccard.
                      The band join is the only shuffle that grows
                      with corpus size; bucket keys are uniform by
                      construction.
 * simhash          — 16-bit fingerprint groupBy
 * ngram_jaccard    — exact all-pairs Jaccard (bounded input: use for
                      verification/small partitions; LSH is the scale
                      path)
 * embedding_cosine — near-dup via cosine on an embedding column
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pywdcollections_spark.operators.textops import (
    cosine,
    md5_hash64,
    minhash_signature,
    simhash16,
    word_shingles,
)


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per duplicated content hash: canonical (min) id, the
    duplicate count, and the sorted member ids as csv."""
    return (df
            .withColumn("content_md5", F.md5(F.col(text_col)))
            .groupBy("content_md5")
            .agg(F.min(id_col).alias("canonical_id"),
                 F.count("*").alias("n_dups"),
                 F.concat_ws(",", F.sort_array(F.collect_list(F.col(id_col))))
                  .alias("member_ids"))
            .filter(F.col("n_dups") > 1))


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact pairwise Jaccard over word-n-gram shingle SETS via a
    shingle-explode self-join (no cartesian product: only pairs sharing
    at least one shingle are generated)."""
    sh = (df.select(F.col(id_col).alias("doc"),
                    F.explode(F.array_distinct(word_shingles(F.col(text_col), n)))
                     .alias("shingle")))
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc") < F.col("b.doc")))
             .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
             .agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard", F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      n: int = 3, k: int = 8, bands: int = 4,
                      threshold: float = 0.5) -> DataFrame:
    """MinHash + LSH banding: docs whose signatures collide in >=1 band
    become candidate pairs, then exact Jaccard verifies. rows_per_band
    = k/bands. Scale path for near-dup at corpus size."""
    rows = k // bands
    docs = (df.select(F.col(id_col).alias("doc"),
                      F.array_distinct(word_shingles(F.col(text_col), n)).alias("sh"))
            .filter(F.size("sh") > 0)
            .withColumn("sig", minhash_signature(F.col("sh"), k=k)))
    band_rows = docs.select(
        "doc", "sh",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("band"),
                     F.concat_ws("_", *[F.col("sig")[j * rows + r]
                                        for r in range(rows)]).alias("bkey"))
            for j in range(bands)])).alias("b"))
    band_rows = band_rows.select("doc", "sh", "b.band", "b.bkey")
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bkey") == F.col("b.bkey"))
                   & (F.col("a.doc") < F.col("b.doc")))
            .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
                    F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"))
            .dropDuplicates(["doc_a", "doc_b"]))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (cand
            .withColumn("jaccard", F.round(inter / union, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc 16-bit SimHash; near-dup groups = equal fingerprints
    (Hamming-distance banding is a straightforward extension)."""
    return df.select(F.col(id_col).alias("doc"),
                     simhash16(F.col(text_col)).alias("simhash"))


def simhash_duplicate_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return (simhash_fingerprints(df, id_col, text_col)
            .groupBy("simhash")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc").alias("canonical_id"))
            .filter(F.col("n_docs") > 1))


def embedding_cosine_pairs(df: DataFrame, id_col: str, vec_col: str,
                           threshold: float = 0.9,
                           max_id: int | None = None) -> DataFrame:
    """Near-dup by embedding cosine. All-pairs form (bounded input);
    the ANN path for corpus scale lives in operators.similarity."""
    base = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    if max_id is not None:
        base = base.filter(F.col("vid") < max_id)
    a = base.select(F.col("vid").alias("id_a"), F.col("v").alias("va"))
    b = base.select(F.col("vid").alias("id_b"), F.col("v").alias("vb"))
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("cos", cosine(F.col("va"), F.col("vb")))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos"))
