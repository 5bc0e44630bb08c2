"""near_dup_clusters: connected-components semantics (min-label,
multi-hop chains, separate components, fixpoint convergence)."""

from pywdcollections_spark.operators.dedup import near_dup_clusters


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return {r["doc_id"]: r["cluster"]
            for r in near_dup_clusters(df).collect()}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter 4 needs multiple propagation rounds
    got = _run(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_stay_separate(spark):
    got = _run(spark, [(10, 11), (11, 12), (20, 21)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cycle_terminates(spark):
    got = _run(spark, [(1, 2), (2, 3), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_long_chain_converges_in_logarithmic_rounds(spark):
    """The alternating large-star/small-star rounds (VERDICT r3 #4)
    must close a long-chain component in ~log^2 rounds, not
    diameter rounds: a 120-hop chain (diameter 120) labels correctly
    in <=8 rounds where per-round label propagation would need 120."""
    stats = {}
    pairs = [(i, i + 1) for i in range(1, 121)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster"]
           for r in near_dup_clusters(df, stats=stats).collect()}
    assert got == {i: 1 for i in range(1, 122)}
    assert stats["converged"]
    assert stats["rounds"] <= 8, f"took {stats['rounds']} rounds"


def test_nonconvergence_raises_not_silent(spark):
    """Exhausting max_iters without the star-forest fixpoint must
    raise (ADVICE r3): non-canonical labels diverging from the
    transitive-closure oracle are worse than a failure."""
    import pytest
    df = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="fixpoint"):
        near_dup_clusters(df, max_iters=0)


def test_empty_pair_list(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert near_dup_clusters(df).count() == 0


def test_self_pairs_keep_singleton_docs(spark):
    """ADVICE r4: a doc appearing ONLY as (x, x) must still get a
    cluster row; a self-pair on a doc that also rides a real edge must
    not duplicate its row."""
    df = spark.createDataFrame([(1, 2), (1, 1), (7, 7)],
                               "doc_a long, doc_b long")
    rows = near_dup_clusters(df).collect()
    assert len(rows) == 3
    assert {r["doc_id"]: r["cluster"] for r in rows} == {1: 1, 2: 1, 7: 7}


def test_only_self_pairs(spark):
    got = _run(spark, [(5, 5), (9, 9)])
    assert got == {5: 5, 9: 9}
