"""Accuracy/statistical bounds for the approximate scale twins.

Round 6: q_approx_percentile / q_approx_distinct / q_sample graduated
to oracle-paired — each now embeds its accuracy attestation in the
driver-visible result (a bound flag the oracle asserts constant, or
exact hash-reproducible membership). The tests here pin the RAW sketch
estimates against exact twins independently of the query packaging,
plus the native seeded df.sample lane the queries no longer use.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.registry import QUERIES, queries_map
from tests.conftest import SF_CORRECTNESS

queries_map()


def test_approx_percentile_close_to_exact(spark):
    """Raw sketch vs exact, and the query's embedded flag is all-1."""
    li = load_table(spark, SF_CORRECTNESS, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_quantity", [0.25, 0.5, 0.75], 10_000
            ).alias("approx_q"),
            F.expr("percentile(l_quantity, 0.25)").alias("e25"),
            F.expr("percentile(l_quantity, 0.50)").alias("e50"),
            F.expr("percentile(l_quantity, 0.75)").alias("e75"),
        )
        .collect()
    )
    for r in rows:
        for a, e in zip(r.approx_q, (r.e25, r.e50, r.e75)):
            assert abs(a - e) <= 1.0  # quantity domain 1..50; err << 1 step

    out = QUERIES["q_approx_percentile"].fn(spark, SF_CORRECTNESS).collect()
    assert out and all(r.within_1 == 1 for r in out)


def test_approx_distinct_within_rsd(spark):
    """Raw HLL estimate vs exact, and the query's embedded flag."""
    li = load_table(spark, SF_CORRECTNESS, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("n"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r.approx_parts - r.n) <= 0.1 * r.n  # rsd=0.02, generous

    out = QUERIES["q_approx_distinct"].fn(spark, SF_CORRECTNESS).collect()
    assert out and all(r.within_bounds == 1 for r in out)


def test_sample_fraction_determinism_and_seed_independence(spark):
    df1 = QUERIES["q_sample"].fn(spark, SF_CORRECTNESS)
    df2 = QUERIES["q_sample"].fn(spark, SF_CORRECTNESS)
    n_src = load_table(spark, SF_CORRECTNESS, "orders").count()
    n = df1.count()
    assert 0.05 * n_src <= n <= 0.15 * n_src  # rate=100/1000 +- slack
    keys1 = sorted(r.o_orderkey for r in df1.collect())
    assert keys1 == sorted(r.o_orderkey for r in df2.collect())  # deterministic

    # a different seed draws a (statistically) different membership,
    # at the same rate — the PROC SURVEYSELECT SEED= contract
    from sas_etl_spark.operators.sampling import srs_sample

    orders = load_table(spark, SF_CORRECTNESS, "orders")
    other = srs_sample(orders, "o_orderkey", 100, seed=7)
    keys7 = sorted(r.o_orderkey for r in other.select("o_orderkey").collect())
    assert keys7 != keys1
    assert 0.05 * n_src <= len(keys7) <= 0.15 * n_src

    # membership is repartitioning-invariant — the property df.sample
    # lacks (its RNG stream is per-partition)
    repart = sorted(
        r.o_orderkey
        for r in srs_sample(orders.repartition(7), "o_orderkey", 100, seed=42)
        .select("o_orderkey")
        .collect()
    )
    assert repart == keys1


def test_native_seeded_sample_lane(spark):
    """df.sample(fraction, seed) — the Spark-native Bernoulli lane the
    registered query deliberately avoids (partition-dependent RNG):
    still deterministic within a fixed partitioning + seed."""
    orders = load_table(spark, SF_CORRECTNESS, "orders")
    a = orders.sample(fraction=0.1, seed=42).count()
    b = orders.sample(fraction=0.1, seed=42).count()
    n_src = orders.count()
    assert a == b
    assert 0.05 * n_src <= a <= 0.15 * n_src


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
