"""textstats operator internals: the r7 clean_corpus restructure
(row-local features before the dedup window; text never enters the
exchange) and the language_id token-count rider it relies on."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from pywdcollections_spark.operators.textstats import clean_corpus, language_id


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_language_id_token_count_rider(spark):
    out = language_id(_docs(spark, [(1, "the cat and   the dog"),
                                    (2, ""), (3, "le chat est la")]),
                      "doc_id", "text", n_tokens_col="ws_tokens")
    got = {r["doc"]: (r["lang_guess"], r["ws_tokens"]) for r in out.collect()}
    assert got == {1: ("en", 5), 2: ("und", 0), 3: ("fr", 4)}


def test_clean_corpus_dedup_and_features(spark):
    """Duplicates collapse to the min doc id; per-row features on the
    survivor are identical whether computed pre- or post-dedup (they
    are row-local), which the r7 restructure relies on."""
    good = ("the cat and the dog sat, in the house of the hill. " * 3)
    docs = _docs(spark, [(5, good), (2, good), (9, good + " extra tail words"),
                         (1, "!!!! ???? ;;;; ....")])   # low quality -> gated
    out = {r["doc"]: r.asDict() for r in
           clean_corpus(docs, "doc_id", "text").collect()}
    assert sorted(out) == [2, 9]                 # dup 5 collapsed into 2; 1 gated
    assert out[2]["lang_guess"] == "en"
    assert out[2]["ws_tokens"] == len(good.split())
    assert out[2]["n_chars"] == len(good)
    assert out[2]["content_md5"] != out[9]["content_md5"]


def test_clean_corpus_exchange_carries_no_text(spark):
    """Shape pin for the r7 restructure: the md5-partitioned dedup
    exchange must carry only narrow feature columns — the text payload
    stays below it (at corpus scale text dominated the shuffle bytes),
    and lang/token features are computed BEFORE the exchange so the
    post-shuffle stage is window+filter only."""
    out = clean_corpus(_docs(spark, [(1, "the cat and the dog in a house")]),
                       "doc_id", "text")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    blocks = plan.split("\n\n")
    ex = [b for b in blocks
          if "Exchange" in b and "hashpartitioning(content_md5" in b]
    assert ex, "dedup exchange not found in plan:\n" + plan
    for b in ex:
        in_lines = [l for l in b.splitlines() if l.startswith("Input")]
        assert in_lines and all("text#" not in l for l in in_lines), b
        assert "lang_guess" in b and "ws_tokens" in b, b
