"""Corpus-preparation operators: decontamination, repetition quality,
PII scrubbing, sequence packing (operators/corpusops.py)."""

from pyspark.sql import functions as F

from pywdcollections_spark.operators.corpusops import (
    contamination_hits, decontaminate, pack_sequences, pii_scrub,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_hits_counts_distinct_shingles(spark):
    docs = _docs(spark, [
        (1, "the quick brown fox jumps"),          # shares 2 bigrams
        (2, "completely unrelated words here"),    # clean
        (3, "quick brown quick brown quick brown"),  # repeated shared gram
    ])
    bench = _docs(spark, [(100, "a quick brown fox appears")])
    hits = {r["doc"]: r["n_hits"]
            for r in contamination_hits(docs, bench, "doc_id", "text").collect()}
    # doc 1 shares 'quick brown' and 'brown fox'; doc 3 shares only
    # 'quick brown' (counted once — in-row distinct before the join)
    assert hits == {1: 2, 3: 1}


def test_contamination_broadcast_guard_chooses_hash_join(spark):
    """When the benchmark shingle set cannot auto-broadcast (threshold
    lowered below its measured size), the guard must (a) warn loudly,
    (b) pin a shuffled HASH join — never a silent sort-merge over the
    exploded corpus stream — and (c) return identical results."""
    import io
    from contextlib import redirect_stdout

    import pytest

    docs = _docs(spark, [
        (1, "the quick brown fox jumps"),
        (2, "completely unrelated words here"),
        (3, "quick brown quick brown quick brown"),
    ])
    bench = _docs(spark, [(100, "a quick brown fox appears")])
    expected = {r["doc"]: r["n_hits"]
                for r in contamination_hits(docs, bench, "doc_id", "text")
                .collect()}

    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "16b")
    try:
        with pytest.warns(UserWarning, match="exceeds autoBroadcastJoinThreshold"):
            hits = contamination_hits(docs, bench, "doc_id", "text")
        buf = io.StringIO()
        with redirect_stdout(buf):
            hits.explain("formatted")
        plan = buf.getvalue()
        assert "ShuffledHashJoin" in plan
        assert "SortMergeJoin" not in plan
        got = {r["doc"]: r["n_hits"] for r in hits.collect()}
        assert got == expected
    finally:
        spark.conf.set(key, old)


def test_decontaminate_drops_flagged_only(spark):
    docs = _docs(spark, [
        (1, "the quick brown fox jumps"),
        (2, "completely unrelated words here"),
    ])
    bench = _docs(spark, [(100, "a quick brown fox appears")])
    kept = decontaminate(docs, bench, "doc_id", "text")
    assert [r["doc_id"] for r in kept.collect()] == [2]
    # max_hits raises the bar: doc 1 has 2 hits, survives max_hits=2
    kept2 = decontaminate(docs, bench, "doc_id", "text", max_hits=2)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [1, 2]


def test_word_shingles_expression_shape(spark):
    """Regression pin for the r6 O(words^2) bug: grams must be built
    from zipped SLICES of the token array, never per-element
    element_at over the unbound tokenization (HOF lambdas re-evaluate
    unbound subtrees per ELEMENT, so that form re-tokenizes the whole
    text once per gram — measured 5.4 s -> 0.2 s over 5k sf0.1 docs).
    The plan audit cannot see expression-level strategy, so pin the
    expression tree itself."""
    from pywdcollections_spark.operators.textops import word_shingles
    expr = str(word_shingles(F.col("t"), 3))
    assert "zip_with" in expr and "slice" in expr
    assert "element_at" not in expr


def test_repetition_stats(spark):
    docs = _docs(spark, [
        (1, "a a a a"),                      # all-dup words, top bigram fills every slot
        (2, "one two three four"),           # no repetition
        (3, "x y\nx y\nz z"),                # duplicate line
        (4, ""),                             # empty -> all zeros
    ])
    out = {r["doc"]: r.asDict() for r in
           repetition_stats(docs, "doc_id", "text").collect()}
    assert out[1]["dup_word_frac"] == 0.75          # 1 distinct of 4
    assert out[1]["top_bigram_cnt"] == 3            # 'a a' x3
    assert out[1]["top_bigram_frac"] == 1.0         # 3 of 3 slots
    assert out[2]["dup_word_frac"] == 0.0
    assert out[2]["top_bigram_cnt"] == 1
    assert out[3]["n_lines"] == 3
    assert out[3]["dup_line_frac"] == round(1 - 2 / 3, 6)
    assert out[4]["n_words"] == 0 and out[4]["dup_word_frac"] == 0.0
    assert out[4]["top_bigram_cnt"] == 0 and out[4]["top_bigram_frac"] == 0.0


def test_pii_scrub(spark):
    docs = _docs(spark, [
        (1, "mail bob@example.com or alice@test.org today"),
        (2, "server at 192.168.1.10 port open"),
        (3, "call +4915123456789 now"),
        (4, "no pii at all"),
        (5, "ip 1234.5.6.7 is not valid so only the tail 5.6.7 fails too"),
    ])
    out = {r["doc"]: r.asDict() for r in
           pii_scrub(docs, "doc_id", "text").collect()}
    assert out[1]["n_emails"] == 2 and "[EMAIL]" in out[1]["scrubbed_text"]
    assert "bob@" not in out[1]["scrubbed_text"]
    assert out[2]["n_ipv4"] == 1 and "[IP]" in out[2]["scrubbed_text"]
    assert out[3]["n_phones"] == 1 and "[PHONE]" in out[3]["scrubbed_text"]
    assert out[4] == {"doc": 4, "n_emails": 0, "n_ipv4": 0, "n_phones": 0,
                      "scrubbed_text": "no pii at all",
                      "scrubbed_md5": out[4]["scrubbed_md5"]}
    # 4-digit first octet: \b[0-9]{1,3} cannot start mid-digit-run
    assert out[5]["n_ipv4"] == 0


def test_pack_sequences_layout(spark):
    rows = [(i, 10 * (i % 3 + 1)) for i in range(40)]  # 10/20/30-token docs
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_sequences(df, "doc_id", "n_tok", ctx_tokens=50, n_buckets=4)
    pdf = out.toPandas().sort_values(["bucket", "doc"]).reset_index(drop=True)
    assert len(pdf) == 40
    # offsets are contiguous within each bucket and shards are the
    # start-offset window
    for _, g in pdf.groupby("bucket"):
        cum = 0
        for _, r in g.iterrows():
            assert r["start_offset"] == cum
            assert r["shard"] == cum // 50
            cum += r["n_tokens"]


def test_pack_sequences_deterministic(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(20)],
                               "doc_id long, n_tok long")
    a = pack_sequences(df, "doc_id", "n_tok").collect()
    b = pack_sequences(df.orderBy(F.rand(seed=3)), "doc_id", "n_tok").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_simhash_fingerprints_aggregate_strategy_and_parity(spark):
    """r7 pin: simhash_fingerprints runs as explode -> ONE codegen
    HashAggregate (per-bit vote sums), not 16 interpreted array folds
    — and stays bit-identical to the bound-array fold form
    (textops.simhash16_from_hashes) on edge cases: empty text, null
    text, one token, repeated tokens, multi-space."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from pywdcollections_spark.operators.dedup import simhash_fingerprints
    from pywdcollections_spark.operators.textops import (
        simhash16_from_hashes, token_hashes)

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, ""), (3, None), (4, "one"),
         (5, "a a a a b"), (6, "  spaced   out  tokens  ")],
        "doc_id long, text string")
    agg = {r["doc"]: r["simhash"]
           for r in simhash_fingerprints(docs, "doc_id", "text").collect()}
    fold = {r["doc"]: r["simhash"] for r in
            docs.select(F.col("doc_id").alias("doc"),
                        token_hashes(F.col("text")).alias("_th"))
                .select("doc", simhash16_from_hashes(F.col("_th"))
                        .alias("simhash")).collect()}
    assert agg == fold
    out = simhash_fingerprints(docs, "doc_id", "text")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "HashAggregate" in plan        # codegen agg, not SortAggregate
    assert "Generate" in plan             # the token explode
    assert plan.count("partial_sum") >= 16


def test_minhash_and_lsh_expression_strategies_pinned(spark):
    """Shape pins for silently-re-regressable expression strategies
    (VERDICT r6 #3): (a) minhash_lsh_pairs must bind shingle hashes
    ONCE before the k affine passes — the unbound form re-runs md5 per
    shingle per hash function (k x md5 occurrences in the analyzed
    plan; the bound form has one per docs-subtree instance); (b)
    similarity.lsh_bucket must embed the hyperplanes as LITERAL double
    arrays — the per-element integer-mixing form carries the 2654435761
    multiplier into the expression tree and re-runs it per element per
    row."""
    from pyspark.sql import functions as F

    from pywdcollections_spark.operators.dedup import minhash_lsh_pairs
    from pywdcollections_spark.operators.similarity import lsh_bucket

    docs = _docs(spark, [(1, "a b c d"), (2, "b c d e")])
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", n=2, k=8, bands=4,
                              threshold=0.1)
    plan = pairs._jdf.queryExecution().analyzed().toString()
    # bound: one md5 per band-rows subtree instance (self-join => 2);
    # unbound would be k per instance (16+)
    assert plan.count("md5") <= 4, f"md5 evaluated {plan.count('md5')}x"

    bucket_expr = str(lsh_bucket(F.col("v"), n_planes=4, dim=8))
    assert "2654435761" not in bucket_expr
