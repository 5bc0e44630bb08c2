"""Resumability (north rule): a run killed after some bucket groups
resumes from lineage and ends with tables identical to an
uninterrupted run."""

import pytest
from pyspark.sql import functions as F

from pywdcollections_spark.config import demo_config
from pywdcollections_spark.plans.checkpoint import run_with_checkpoint
from pywdcollections_spark.testkit import spark_tables as TK

N = 200
SEED = 7


@pytest.fixture(scope="module")
def env(spark):
    pages = TK.pages_df(spark, N, SEED, head_templates=20).cache()
    dims = TK.dim_dfs(spark, N, SEED)
    return pages, dims


def _triples(spark, out_dir):
    return (spark.read.parquet(f"{out_dir}/triples")
            .select("subj", "pred", "obj_norm", "source"))


def test_interrupted_run_resumes_identically(spark, env, tmp_path_factory):
    pages, dims = env
    full_dir = str(tmp_path_factory.mktemp("full"))
    part_dir = str(tmp_path_factory.mktemp("partial"))

    # uninterrupted run
    r_full = run_with_checkpoint(spark, pages, demo_config(), dims, full_dir)
    assert r_full["buckets_done"] == r_full["n_buckets"]

    # killed after 2 of 4 groups
    r1 = run_with_checkpoint(spark, pages, demo_config(), dims, part_dir, max_groups=2)
    assert r1["groups_processed"] == 2
    n_partial = _triples(spark, part_dir).count()

    # resume: only the remaining groups run
    r2 = run_with_checkpoint(spark, pages, demo_config(), dims, part_dir)
    assert r2["groups_processed"] == 2
    assert r2["buckets_done"] == r2["n_buckets"]

    a = _triples(spark, full_dir)
    b = _triples(spark, part_dir)
    assert a.count() == b.count() > n_partial
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # idempotent: a third run processes nothing and changes nothing
    r3 = run_with_checkpoint(spark, pages, demo_config(), dims, part_dir)
    assert r3["groups_processed"] == 0
    assert _triples(spark, part_dir).count() == a.count()

    # lineage covers every bucket with correct page counts
    lin = spark.read.parquet(f"{part_dir}/lineage")
    assert lin.select("bucket").distinct().count() == r2["n_buckets"]
    assert lin.agg(F.sum("n_pages")).first()[0] == N
