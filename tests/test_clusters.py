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
