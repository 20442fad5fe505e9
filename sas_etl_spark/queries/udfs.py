"""UDF-surface queries (SURVEY.md §2.11): each Arrow-batched Python
path is oracle-paired with the equivalent plain SQL, proving the
pandas UDF lane is result-identical to the JVM lane."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.functions.udfs import charge_udf, weighted_avg_udaf, zscore_per_group
from sas_etl_spark.registry import query


@query(
    "q_udf_charge",
    oracle="""
    select l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) as charge
    from lineitem
    """,
    tags=("udf",),
)
def q_udf_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (PROC FCMP analog) computing the extended
    charge; must equal the pure-SQL expression bit-for-bit (identical
    IEEE ops, elementwise)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge_udf("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@query(
    "q_udaf_weighted",
    oracle="""
    select l_returnflag,
           round(sum(l_discount * l_quantity) / sum(l_quantity), 6) as wavg_disc
    from lineitem
    group by l_returnflag
    """,
    tags=("udf",),
)
def q_udaf_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (custom PROC MEANS statistic):
    quantity-weighted mean discount per return flag."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_avg_udaf("l_discount", "l_quantity"), 6).alias("wavg_disc")
    )


@query(
    "q_grouped_zscore",
    oracle="""
    select o_orderkey,
           round((o_totalprice - avg(o_totalprice) over w)
                 / nullif(stddev_samp(o_totalprice) over w, 0), 6) as z
    from orders
    window w as (partition by o_custkey)
    """,
    tags=("udf", "window"),
)
def q_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (BY-group DATA step with arbitrary
    logic): z-score each order's price within its customer. Singleton
    customers -> null (stddev_samp undefined), mirrored on both sides;
    pandas NaN is normalized to SQL NULL before comparison."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    z = zscore_per_group(
        orders,
        group_col="o_custkey",
        value_col="o_totalprice",
        out_schema="o_custkey long, o_orderkey long, o_totalprice double, z double",
    )
    z_clean = F.when(F.isnan("z"), F.lit(None).cast("double")).otherwise(F.col("z"))
    return z.select("o_orderkey", F.round(z_clean, 6).alias("z"))


@query(
    "q_udtf_tokens",
    oracle="""
    select doc_id, u.idx, u.token
    from (
        select doc_id,
               unnest(list_transform(
                   range(1, len(string_split(text, ' ')) + 1),
                   i -> struct_pack(
                       idx := cast(i - 1 as bigint),
                       token := string_split(text, ' ')[i]))) as u
        from documents
    )
    """,
    tags=("udf", "udtf", "text"),
)
def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join: one (position, token) row per
    token per document (SAS: DATA step with multiple OUTPUT
    statements). The oracle rebuilds the same ordinality with a
    struct-unnest. posexplode is the JVM hot-path twin; this pins the
    UDTF lane's results to it exactly."""
    from sas_etl_spark.functions.udfs import register_tokenize_udtf

    register_tokenize_udtf(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        select d.doc_id, t.idx, t.token
        from _udtf_docs d, lateral tokenize_udtf(d.text) t
        """
    )


@query(
    "q_cogroup_reconcile",
    oracle="""
    with o as (
        select o_custkey as custkey, cast(count(*) as bigint) as n_orders
        from orders group by o_custkey
    ), l as (
        select o_custkey as custkey, cast(count(*) as bigint) as n_lines
        from lineitem join orders on l_orderkey = o_orderkey
        group by o_custkey
    )
    select coalesce(o.custkey, l.custkey) as custkey,
           coalesce(n_orders, 0) as n_orders,
           coalesce(n_lines, 0) as n_lines,
           round(coalesce(n_lines, 0) * 1.0
                 / greatest(coalesce(n_orders, 0), 1), 6) as lines_per_order
    from o full join l on o.custkey = l.custkey
    """,
    tags=("udf", "cogroup"),
)
def q_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CO-GROUPED applyInPandas — the per-BY-group MERGE of TWO
    datasets with arbitrary Python logic (SAS: ``MERGE a b; BY k;``
    inside a DATA step whose body does real computation, not just
    matching): both sides are grouped on the BY key and each
    (key, pandas_a, pandas_b) pair lands in one Python function via
    Arrow. Here: reconcile each customer's order count against their
    line count — either side may be EMPTY for a key (the outer-merge
    semantics cogroup gives for free). Completes the §2.11 UDF
    surface next to scalar/grouped-agg/grouped-map/UDTF. Scale: one
    co-partitioned shuffle on the BY key; per-group pandas work is
    bounded by group size (the operator to avoid for hot keys —
    exactly like a skewed DATA-step BY group)."""
    import pandas as pd

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    lines = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("custkey"))
    )
    orders_k = orders.select(F.col("o_custkey").alias("custkey"))

    def reconcile(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        n_orders, n_lines = len(odf), len(ldf)
        return pd.DataFrame(
            {
                "custkey": [key[0]],
                "n_orders": [n_orders],
                "n_lines": [n_lines],
                "lines_per_order": [round(n_lines / max(n_orders, 1), 6)],
            }
        )

    return (
        orders_k.groupBy("custkey")
        .cogroup(lines.groupBy("custkey"))
        .applyInPandas(
            reconcile,
            "custkey long, n_orders long, n_lines long, lines_per_order double",
        )
    )
