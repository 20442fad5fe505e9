"""Salted-skew operators must be result-identical to their plain
counterparts (salting is a physical rewrite, not a semantic one)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.operators.skew import explode_salt_join, salted_agg
from tests.conftest import SF_SMOKE


def test_salted_agg_matches_plain_groupby(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    plain = {
        (r.l_returnflag,): (r.s, r.n, r.mn, r.mx)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("s"),
            F.count("l_quantity").alias("n"),
            F.min("l_quantity").alias("mn"),
            F.max("l_quantity").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r.s, r.n, r.mn, r.mx)
        for r in salted_agg(
            li,
            keys=["l_returnflag"],
            aggs={
                "s": ("sum", "l_quantity"),
                "n": ("count", "l_quantity"),
                "mn": ("min", "l_quantity"),
                "mx": ("max", "l_quantity"),
            },
            salt_buckets=8,
        ).collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        ps, pn, pmn, pmx = plain[k]
        ss, sn, smn, smx = salted[k]
        assert pn == sn and pmn == smn and pmx == smx
        assert abs(ps - ss) < 1e-6 * abs(ps)  # double merge-order drift only


def test_explode_salt_join_matches_plain_join(spark):
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    plain = (
        lineitem.join(orders, "o_orderkey")
        .agg(F.count(F.lit(1)), F.sum("l_quantity"))
        .collect()[0]
    )
    salted = (
        explode_salt_join(lineitem, orders, on="o_orderkey", salt_buckets=4)
        .agg(F.count(F.lit(1)), F.sum("l_quantity"))
        .collect()[0]
    )
    assert plain[0] == salted[0]
    assert abs(plain[1] - salted[1]) < 1e-6 * abs(plain[1])
