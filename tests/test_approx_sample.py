"""Accuracy/statistical bounds for the approximate scale twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.registry import QUERIES, queries_map
from tests.conftest import SF_CORRECTNESS

queries_map()


def test_approx_percentile_close_to_exact(spark):
    li = load_table(spark, SF_CORRECTNESS, "lineitem")
    exact = {
        r.l_returnflag: (r.p25, r.p50, r.p75)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.25)").alias("p25"),
            F.expr("percentile(l_quantity, 0.50)").alias("p50"),
            F.expr("percentile(l_quantity, 0.75)").alias("p75"),
        )
        .collect()
    }
    approx = {
        r.l_returnflag: (r.p25, r.p50, r.p75)
        for r in QUERIES["q_approx_percentile"].fn(spark, SF_CORRECTNESS).collect()
    }
    for flag, (e25, e50, e75) in exact.items():
        a25, a50, a75 = approx[flag]
        for e, a in [(e25, a25), (e50, a50), (e75, a75)]:
            assert abs(e - a) <= 1.0  # quantity domain 1..50; sketch err << 1 bucket


def test_approx_distinct_within_rsd(spark):
    li = load_table(spark, SF_CORRECTNESS, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    approx = {
        r.l_returnflag: r.approx_parts
        for r in QUERIES["q_approx_distinct"].fn(spark, SF_CORRECTNESS).collect()
    }
    for flag, n in exact.items():
        assert abs(approx[flag] - n) <= 0.1 * n  # rsd=0.02, generous bound


def test_sample_fraction_and_determinism(spark):
    df1 = QUERIES["q_sample"].fn(spark, SF_CORRECTNESS)
    df2 = QUERIES["q_sample"].fn(spark, SF_CORRECTNESS)
    n_src = load_table(spark, SF_CORRECTNESS, "orders").count()
    n = df1.count()
    assert 0.05 * n_src <= n <= 0.15 * n_src  # fraction=0.1 +- slack
    assert sorted(r.o_orderkey for r in df1.collect()) == sorted(
        r.o_orderkey for r in df2.collect()
    )  # fixed seed -> deterministic


def test_deterministic_split_is_stable_and_partitioning_invariant(spark):
    from sas_etl_spark.operators.sampling import deterministic_split

    docs = load_table(spark, SF_CORRECTNESS, "documents").select("doc_id")
    a = {r.doc_id: r.split for r in deterministic_split(docs, "doc_id").collect()}
    # invariant under repartitioning — the property df.sample lacks
    b = {
        r.doc_id: r.split
        for r in deterministic_split(docs.repartition(7), "doc_id").collect()
    }
    assert a == b
    n = len(a)
    from collections import Counter

    frac = {k: v / n for k, v in Counter(a.values()).items()}
    assert abs(frac["train"] - 0.8) < 0.05
    assert abs(frac["valid"] - 0.1) < 0.03
    assert abs(frac["test"] - 0.1) < 0.03


def test_deterministic_split_rejects_bad_weights(spark):
    import pytest as _pytest

    from sas_etl_spark.operators.sampling import deterministic_split

    docs = load_table(spark, SF_CORRECTNESS, "documents")
    with _pytest.raises(ValueError):
        deterministic_split(docs, "doc_id", splits=(("a", 50), ("b", 40)))
