"""Alias-trie scorer for ambiguous mentions (north-star extension;
SURVEY.md §7.2 M3 "custom" item).

The reference resolves mentions by EXACT title lookup only
(find_items_in_value, pywdcollections.py:203-224) — that path lives in
operators/linking.py and its parity is untouched. This module adds the
residue scorer the north star names for mentions the exact dictionary
misses ("Paris, France" when the dictionary knows "Paris").

Spark-first trie: a trie scorer walks a mention left-to-right and
keeps the deepest node that is a complete alias. The root-to-node
paths of that trie ARE the word-boundary prefixes of the mention, so
the whole walk batch-vectorizes as

    mention -> its <= max_words word-boundary prefixes   (JVM expr)
            -> equi-join against the alias dim           (hash join)
            -> keep the longest matched prefix per row   (window)

No Python crossing, no theta join, and the exchange fans out at most
``max_words`` rows per mention — the bounded trie depth. At web scale
the alias dim shuffles or broadcasts by stats like any other dim; the
scorer itself adds one hash join + one window.

Scoring is integer-exact on purpose: (matched_len, mention_len) longs
instead of a float ratio, with ``min_score`` applied as a cross-
multiplied integer comparison — deterministic, and hash-identical in
the DuckDB oracle twin (alias_link_residue in queries.py).
Tie-breaks are total: longest match first, then smallest qid (an
alias mapping to several entities resolves deterministically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_M_NORM = "_alias_mention_norm"
_WORDS = "_alias_words"
_PREFIX = "_alias_prefix"


def normalize_mention(col):
    """lowercase; fold every non-letter/digit run (punctuation,
    whitespace, underscores) to ONE space; trim. 'Paris, France'
    tokenizes as ('paris','france') so the alias 'paris' is a
    word-boundary prefix. The alias dim must be normalized with the
    SAME function (see ``normalize_aliases``)."""
    return F.trim(F.regexp_replace(F.lower(col), r"[^\p{L}\p{N}]+", " "))


def normalize_aliases(aliases: DataFrame, alias_col: str = "alias",
                      qid_col: str = "qid") -> DataFrame:
    """(alias, qid) -> normalized (alias_lc, qid), empty aliases
    dropped, exact duplicates collapsed."""
    return (aliases
            .select(normalize_mention(F.col(alias_col)).alias("alias_lc"),
                    F.col(qid_col).alias("qid"))
            .filter(F.length("alias_lc") > 0)
            .distinct())


def alias_link(mentions: DataFrame, aliases: DataFrame,
               mention_col: str = "mention",
               key_cols: list[str] | None = None,
               max_words: int = 4, min_score: float = 0.0,
               out_col: str = "qid") -> DataFrame:
    """Link each mention row to the alias whose text is the LONGEST
    word-boundary prefix of the mention (trie semantics), scored by
    matched length over mention length.

    ``aliases`` must be ``normalize_aliases`` output (alias_lc, qid).
    ``key_cols`` identify a mention row; when omitted, ALL input
    columns form the key and the input must be row-distinct — a
    duplicate row would silently collapse to one under the per-key
    window, so the default path verifies distinctness with one
    limit-1 aggregation job and raises on duplicates (VERDICT r4 #4).
    NB (ADVICE r5): that guard job re-evaluates the FULL upstream plan
    of ``mentions`` — for an expensive unpersisted input it doubles the
    input's computation cost, so hot-path callers must pass
    ``key_cols`` (every in-repo caller does); the default is the safe
    path for ad-hoc use, not the production grain.
    Callers with a meaningful grain (or intentional duplicates) pass
    ``key_cols`` explicitly and skip the check.
    Returns the input columns + (``out_col``, matched_len,
    mention_len); rows with no alias match or a score below
    ``min_score`` are dropped (the caller unions the exact-link path
    and this residue). Set ``out_col`` when the input already carries
    a ``qid`` column (e.g. the harvest grain's SUBJECT qid)."""
    keys = key_cols or mentions.columns
    if key_cols is None:
        dup = (mentions.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
               .filter(F.col("_n") > 1).limit(1).count())
        if dup:
            raise ValueError(
                "alias_link: input has duplicate rows and no key_cols — "
                "duplicates would silently collapse under the per-key "
                "window; pass key_cols identifying a mention row")
    if out_col in mentions.columns:
        raise ValueError(f"out_col {out_col!r} collides with an input "
                         "column — pass a different out_col")
    df = (mentions
          .withColumn(_M_NORM, normalize_mention(F.col(mention_col)))
          .filter(F.length(_M_NORM) > 0)
          .withColumn(_WORDS, F.split(F.col(_M_NORM), " ")))
    # the trie walk, vectorized: every root-to-node path = a prefix of
    # 1..max_words words (bounded fan-out per mention)
    df = (df.withColumn(
            _PREFIX,
            F.expr(f"transform(sequence(1, least(size({_WORDS}), "
                   f"{int(max_words)})), k -> "
                   f"concat_ws(' ', slice({_WORDS}, 1, k)))"))
          .select(*mentions.columns, F.col(_M_NORM),
                  F.explode(_PREFIX).alias(_PREFIX)))
    al = aliases.withColumnRenamed("qid", "_alias_link_qid")
    cand = (df.join(al, df[_PREFIX] == al["alias_lc"], "inner")
            .select(*mentions.columns,
                    F.col("_alias_link_qid").alias(out_col),
                    F.length(_PREFIX).cast("long").alias("matched_len"),
                    F.length(_M_NORM).cast("long").alias("mention_len")))
    # deepest trie node wins; alias->multiple-qids resolves to min qid
    w = Window.partitionBy(*keys).orderBy(F.desc("matched_len"), F.asc(out_col))
    out = (cand.withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") == 1).drop("_rn"))
    if min_score > 0:
        # integer cross-multiply: no float round-off at the threshold
        thr = int(round(min_score * 10000))
        out = out.filter(F.col("matched_len") * 10000
                         >= F.lit(thr) * F.col("mention_len"))
    return out


def link_with_alias_fallback(cands: DataFrame, sitelinks: DataFrame,
                             redirects: DataFrame, target_p31: DataFrame,
                             class_p279: DataFrame, prop_constraints: DataFrame,
                             aliases: DataFrame,
                             max_words: int = 4,
                             min_score: float = 0.5) -> DataFrame:
    """Exact dictionary linking (operators/linking.py, reference
    semantics untouched) plus the alias-trie scorer over the RESIDUE:
    entity-datatype candidate rows the exact path dropped get one
    alias-scored second chance; everything the exact path resolved is
    returned byte-identically. ``aliases`` is raw (alias, qid).

    NB: ``exact`` is a real fan-out — it feeds both the final union
    AND the residue anti-join — so an unpersisted ``cands`` upstream
    is evaluated twice at materialization. The pipeline caller persists
    cands (plans/pipeline.py harvest); standalone callers with an
    expensive cands plan should do the same."""
    from pywdcollections_spark.functions.udfs import wikilink_mentions_udf
    from pywdcollections_spark.operators.linking import (_GRAIN,
                                                         link_entity_values)

    exact = link_entity_values(cands, sitelinks, redirects, target_p31,
                               class_p279, prop_constraints)
    ent = cands.filter(F.col("datatype") == "entity")
    residue = ent.join(exact.select(*_GRAIN).distinct(), _GRAIN, "left_anti")
    # EVERY extracted mention is scored (VERDICT r4 #6) — the exact
    # path keeps the reference's first-passing-mention rule
    # (pywdcollections.py:203-224) untouched; the residue is an
    # extension and free to pick the best-scoring mention. The
    # namespace-skip/extraction rules stay those of the reference.
    residue_m = (residue
                 .withColumn("_mentions", wikilink_mentions_udf("val"))
                 .filter(F.size("_mentions") > 0)
                 .select(*residue.columns,
                         F.posexplode("_mentions").alias("_mpos", "mention"))
                 .drop("_mentions"))
    scored = alias_link(residue_m, normalize_aliases(aliases),
                        mention_col="mention",
                        key_cols=_GRAIN + ["_mpos"],  # per-mention pick
                        max_words=max_words, min_score=min_score,
                        out_col="_linked_qid")  # grain carries SUBJECT qid
    # best score per grain wins. The ratio compare runs in IEEE double,
    # which is NOT exact for non-dyadic ratios (ADVICE r5): two distinct
    # scores can round to the same double, in which case the winner
    # falls to the earliest-mention tie-break instead of the true best
    # score. Deterministic either way, and the DuckDB oracle twin
    # divides in the same IEEE doubles, so parity holds bit-for-bit;
    # ties break to the EARLIEST mention (stable vs the old
    # first-mention rule), then min qid
    w = Window.partitionBy(*_GRAIN).orderBy(
        (F.col("matched_len") / F.col("mention_len")).desc(),
        F.asc("_mpos"), F.asc("_linked_qid"))
    linked = (scored.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              # the alias dim carries canonical entity ids (same id
              # space as sitelinks.qid) — the winner IS the value
              .withColumn("val", F.col("_linked_qid").cast("string"))
              .select(*_GRAIN, "val"))
    return exact.unionByName(linked)
