"""Bucketed co-located joins: same-key same-count bucketed tables must
join with NO shuffle exchange on either side (the recurring-join scale
path, SCALE.md)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.plans import formatted_plan
from sas_etl_spark.sources import write_bucketed
from tests.conftest import SF_SMOKE


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    lineitem = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 4)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem",
        "o_orderkey", 4,
    )
    try:
        joined = spark.table("b_lineitem").join(spark.table("b_orders"), "o_orderkey")
        plan = formatted_plan(joined)
        assert "Exchange hashpartitioning" not in plan, plan
        # and it still computes the right thing
        expect = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count()
        assert joined.count() == expect
    finally:
        spark.sql("drop table if exists b_orders")
        spark.sql("drop table if exists b_lineitem")
