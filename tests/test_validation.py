"""Validation/promotion parity: engine validate stage vs the pure-Python
golden oracle (testkit.validate_golden — independent reimplementation
of the reference writers, pywdcollections.py:1061-1337)."""

import pytest
from pyspark.sql import functions as F

from pywdcollections_spark.config import demo_config
from pywdcollections_spark.plans.pipeline import build_kg
from pywdcollections_spark.testkit import spark_tables as TK
from pywdcollections_spark.testkit.validate_golden import expected_validation

N_PAGES = 250
SEED = 1729
HEAD = 30


@pytest.fixture(scope="module")
def outputs(spark):
    pages = TK.pages_df(spark, N_PAGES, SEED, head_templates=HEAD)
    dims = TK.dim_dfs(spark, N_PAGES, SEED)
    return build_kg(spark, pages, demo_config(), dims)


def test_valid_triples_match_golden(spark, outputs):
    golden_valid, _ = expected_validation(N_PAGES, SEED, head_templates=HEAD)
    exp = spark.createDataFrame(
        [(r["subj"], r["pred"], r["obj_norm"], r["source"]) for r in golden_valid],
        "subj string, pred string, obj_norm string, source string")
    got = outputs["triples"].select("subj", "pred", "obj_norm", "source")
    missing = exp.exceptAll(got)
    extra = got.exceptAll(exp)
    nm, ne = missing.count(), extra.count()
    if nm or ne:
        print("MISSING:"); missing.show(30, truncate=80)
        print("EXTRA:"); extra.show(30, truncate=80)
    assert nm == 0 and ne == 0


def test_rejects_match_golden(spark, outputs):
    _, golden_rejects = expected_validation(N_PAGES, SEED, head_templates=HEAD)
    exp = spark.createDataFrame(
        [(r["subj"], r["pred"], r["reason"]) for r in golden_rejects],
        "subj string, pred string, reject_reason string")
    got = outputs["rejects"].select("subj", "pred", "reject_reason")
    missing = exp.exceptAll(got)
    extra = got.exceptAll(exp)
    nm, ne = missing.count(), extra.count()
    if nm or ne:
        print("MISSING:"); missing.show(30, truncate=80)
        print("EXTRA:"); extra.show(30, truncate=80)
    assert nm == 0 and ne == 0
