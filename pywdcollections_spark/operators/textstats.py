"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting. All JVM-side built-ins."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pywdcollections_spark.operators.textops import rolling_fingerprint, words

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "fr": ["le", "la", "et", "de", "un", "une", "est"],
    "de": ["der", "die", "das", "und", "ein", "ist", "von"],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbols
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _stop_hits(ws, lang: str):
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(ws, lambda w: F.array_contains(arr, F.lower(w))))


def language_id(df: DataFrame, id_col: str, text_col: str,
                keep: tuple = (), n_tokens_col: str | None = None) -> DataFrame:
    """Stopword-vote language guess with deterministic tie-break
    (en > fr > de on equal votes, 'und' = no votes). ``keep`` forwards
    extra columns (pipeline composition without a re-join).
    ``n_tokens_col`` additionally emits the whitespace token count
    under that name — it reuses the already-bound token array, so a
    composing caller (clean_corpus) doesn't re-split the text for a
    separate counter.

    The token array is bound as a column before the per-language
    stopword filters: words(text) appears in six feature expressions,
    and filter() is a non-codegen HOF, so the unbound form re-split
    the text once per instance (the r6 binding discipline,
    BENCH/BASELINE.md round-6)."""
    base = df.select(F.col(id_col).alias("doc"),
                     words(F.col(text_col)).alias("_ws"), *keep)
    ws = F.col("_ws")
    en, fr, de = (_stop_hits(ws, l) for l in ("en", "fr", "de"))
    guess = (F.when((en >= fr) & (en >= de) & (en > 0), "en")
              .when((fr >= de) & (fr > 0), "fr")
              .when(de > 0, "de")
              .otherwise("und"))
    extra = [F.size(ws).alias(n_tokens_col)] if n_tokens_col else []
    return base.select("doc", guess.alias("lang_guess"),
                       en.alias("en_hits"), fr.alias("fr_hits"),
                       de.alias("de_hits"), *extra, *keep)


def quality_score(df: DataFrame, id_col: str, text_col: str,
                  keep: tuple = ()) -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1]:
    length band, alpha ratio, punctuation ratio, stopword ratio,
    mean word length — the standard web-text quality recipe.
    ``keep`` forwards extra columns for pipeline composition.

    Token array bound first (r6 binding discipline): words(text) feeds
    n_words, the three stopword filters, stop_ratio, mean_wlen and the
    composite — unbound it re-split the text per instance."""
    fwd = [c for c in dict.fromkeys((text_col, *keep))]
    base = df.select(F.col(id_col).alias("doc"),
                     words(F.col(text_col)).alias("_ws"), *fwd)
    t = F.col(text_col)
    n_chars = F.length(t)
    ws = F.col("_ws")
    n_words = F.size(ws)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.!?,;:]", ""))
    stop = _stop_hits(ws, "en") + _stop_hits(ws, "fr") + _stop_hits(ws, "de")
    alpha_ratio = F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 4)
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4)
    stop_ratio = F.round(stop / F.greatest(n_words, F.lit(1)), 4)
    mean_wlen = F.round(n_alpha / F.greatest(n_words, F.lit(1)), 4)
    len_band = F.when(n_chars < 100, 0.2).when(n_chars < 1000, 1.0).otherwise(0.7)
    # round at 6dp: the composite has at most 6 decimal digits (4dp terms
    # divided by 4), so no digits are cut and the cross-engine
    # round-half-tie landmine (Spark HALF_UP vs DuckDB scaled-nearbyint)
    # cannot trigger
    score = F.round(
        (len_band + alpha_ratio + F.least(stop_ratio * 3, F.lit(1.0))
         + (1 - F.least(punct_ratio * 10, F.lit(1.0)))) / 4, 6)
    return base.select("doc", n_chars.alias("n_chars"),
                       n_words.alias("n_words"), alpha_ratio.alias("alpha_ratio"),
                       punct_ratio.alias("punct_ratio"), stop_ratio.alias("stop_ratio"),
                       mean_wlen.alias("mean_word_len"), score.alias("quality"),
                       *keep)


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens and BPE-ish regex pre-tokens per document —
    the training-data budgeting counters."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("doc"),
        F.size(words(t)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_RE), 0)).alias("bpe_tokens"),
        F.length(t).alias("n_chars"))


def clean_corpus(df: DataFrame, id_col: str, text_col: str,
                 min_quality: float = 0.5) -> DataFrame:
    """Composed training-data cleaning pass — the shape a 100 TB corpus
    job actually runs: quality gate -> exact-duplicate collapse (lowest
    id per content hash survives) -> language tag + token counters.
    One declarative plan over one scan: the gate is a pushable filter,
    and the ONLY data-sized shuffle is one md5-partitioned window (the
    hash key is uniform, so no skew). The r5 formulation collapsed
    duplicates with groupBy(min(doc)) + join-back, which computed the
    quality+md5 subplan TWICE (once per join side) and shuffled both
    sides; min-over-window is one pass and one exchange (r6 A/B in
    BENCH/BASELINE.md).

    r7: EVERY row-local feature (quality, language hits, token count)
    is computed BEFORE the dedup window, so (a) the exchange carries
    only narrow columns — doc, md5, a few ints, never the text payload
    (guide §2.3 "project before the exchange"; at corpus scale the
    text column dominated the shuffle bytes), and (b) the post-shuffle
    stage is just min-over-window + filter — previously langid +
    token-split ran after the exchange, where AQE's small-bytes
    coalescing serializes compute-heavy stages at sandbox scale.
    Results identical: the features are per-row functions of text, so
    computing them pre- vs post-dedup changes nothing for surviving
    rows. Trade-off, disclosed: features are now computed on kept rows
    INCLUDING duplicates (~duplicate-fraction extra row-local compute)
    in exchange for a text-free shuffle — at web scale shuffle bytes
    are the scarcer resource by far (measured r7 at sf1.0/32 cores:
    9.2 -> 2.1 s)."""
    from pyspark.sql import Window
    base = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("text"))
    # Pushdown fence on the gate (r7): the predicate's subtree IS the
    # full quality expression — Catalyst would otherwise clone it into
    # a filter pushed below any upstream exchange (e.g. the caller's
    # scan-spreading repartition), evaluating the whole tokenize+regex
    # pass once in the narrow pre-exchange stage AND again in the
    # projection above (measured r7: 6.2 s vs 2.2 s at sf1.0/32 cores,
    # the pushed copy serialized into the unsplittable scan task).
    # OR-ing an always-false NONDETERMINISTIC term pins the filter
    # directly above the projection that computes `quality`, so the
    # expression evaluates exactly once; the row set is unchanged
    # (monotonically_increasing_id() is always >= 0).
    fence = F.monotonically_increasing_id() < F.lit(0)
    q = (quality_score(base, "doc", "text", keep=("text",))
         .filter((F.col("quality") >= min_quality) | fence)
         .withColumn("content_md5", F.md5("text")))
    feat = language_id(q, "doc", "text",
                       keep=("content_md5", "quality", "n_chars"),
                       n_tokens_col="ws_tokens")
    pre = feat.select("doc", "content_md5", "quality", "lang_guess",
                      "ws_tokens", "n_chars")
    w = Window.partitionBy("content_md5")
    uniq = (pre.withColumn("_min_doc", F.min("doc").over(w))
            .filter(F.col("doc") == F.col("_min_doc")).drop("_min_doc"))
    return uniq.select("doc", "content_md5", "quality", "lang_guess",
                       F.col("ws_tokens").cast("long").alias("ws_tokens"),
                       F.col("n_chars").cast("long").alias("n_chars"))


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalized rolling-hash fingerprint per document (dedup key /
    shard-stable content id)."""
    return df.select(F.col(id_col).alias("doc"),
                     rolling_fingerprint(F.col(text_col)).alias("fingerprint"))
