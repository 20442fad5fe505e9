"""Window / ordered queries (SURVEY.md §2.5, §2.9 #57)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.operators.events import session_counts
from sas_etl_spark.operators.windows import moving_avg, running_total, top_k_per_group
from sas_etl_spark.registry import query


@query(
    "q_window_rank",
    oracle="""
    select * from (
        select o_custkey, o_orderkey, o_totalprice,
               row_number() over (
                   partition by o_custkey
                   order by o_totalprice desc, o_orderkey
               ) as rn
        from orders
    ) t where rn <= 3
    """,
    tags=("bench", "window"),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (SAS: PROC SORT + FIRST.
    counter / _N_ within BY group). SURVEY.md §2.4 #34, §2.5 #37.

    o_orderkey tiebreak makes the kept rows deterministic across
    engines. Hash-partitioned by customer — scales with key
    cardinality, no global sort.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return top_k_per_group(
        orders,
        partition_by=["o_custkey"],
        order_by=[F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
    )


@query(
    "q_dedup_firstlast",
    oracle="""
    select user_id, min(ts) as first_ts, max(ts) as last_ts, count(*) as n
    from events
    group by user_id
    """,
    tags=("bench", "agg", "events"),
)
def q_dedup_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event per user (SAS: BY user; FIRST./LAST.
    subsetting). SURVEY.md §2.4 #33.

    min/max, not a window: a whole-row FIRST. would need an ordered
    window; for timestamps alone, min/max aggregates are one partial-
    agg shuffle with no sort.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_sessionize",
    oracle="""
    select user_id, count(*) as sessions from (
        select user_id,
               case when lag(ts) over (partition by user_id order by ts, event_id) is null
                         or ts - lag(ts) over (partition by user_id order by ts, event_id)
                            > interval 30 minute
                    then 1 else 0 end as new_s
        from events
    ) t where new_s = 1
    group by user_id
    """,
    tags=("bench", "window", "events"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions per user with a 30-minute inactivity gap (SAS: BY
    user + LAG gap logic). SURVEY.md §2.9 #57.

    Batch twin of streaming session_window; gap compared in exact
    integer microseconds. event_id tiebreak pins the lag order.
    """
    events = load_table(spark, sf_dir, "events")
    return session_counts(events, gap_seconds=30 * 60)


@query(
    "q_running_total",
    oracle="""
    select o_custkey, o_orderkey,
           round(sum(o_totalprice) over (
               partition by o_custkey
               order by o_orderdate, o_orderkey
               rows between unbounded preceding and current row
           ), 2) as running_total
    from orders
    """,
    tags=("window",),
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer cumulative spend in order-date order (SAS: RETAIN
    + sum statement within BY group). SURVEY.md §2.2 #14, §2.5 #40."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    out = running_total(
        orders,
        value="o_totalprice",
        partition_by=["o_custkey"],
        order_by=[F.col("o_orderdate"), F.col("o_orderkey")],
    )
    return out.select(
        "o_custkey", "o_orderkey", F.round("running_total", 2).alias("running_total")
    )


@query(
    "q_rank_ntile",
    oracle="""
    select c_custkey, c_nationkey,
           rank()       over (partition by c_nationkey order by c_acctbal desc) as rnk,
           dense_rank() over (partition by c_nationkey order by c_acctbal desc) as drnk,
           ntile(4)     over (partition by c_nationkey
                              order by c_acctbal desc, c_custkey) as quartile
    from customer
    """,
    tags=("window",),
)
def q_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranks and quartiles per nation (SAS: PROC RANK, GROUPS=4).
    SURVEY.md §2.5 #36.

    rank/dense_rank are functions of the order value, so ties are
    deterministic without a tiebreak; ntile is position-based, so its
    window adds the unique-key tiebreak. All cast to long (ANSI window
    functions are BIGINT).
    """
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    w_val = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    w_pos = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return customer.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w_val).cast("long").alias("rnk"),
        F.dense_rank().over(w_val).cast("long").alias("drnk"),
        F.ntile(4).over(w_pos).cast("long").alias("quartile"),
    )


@query(
    "q_moving_avg",
    oracle="""
    select event_id,
           round(avg(value) over (
               partition by user_id
               order by ts, event_id
               rows between 6 preceding and current row
           ), 6) as mavg7
    from events
    """,
    tags=("window", "events"),
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row moving average per user (SAS: LAG chain or PROC
    EXPAND). SURVEY.md §2.5 #38."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    out = moving_avg(
        events,
        value="value",
        partition_by=["user_id"],
        order_by=[F.col("ts"), F.col("event_id")],
        preceding=6,
        out_col="mavg7",
    )
    return out.select("event_id", F.round("mavg7", 6).alias("mavg7"))


@query(
    "q_rank_ties_mean",
    oracle="""
    select c_custkey, c_nationkey,
           rank() over w
             + (cast(count(*) over (partition by c_nationkey, c_acctbal)
                     as double) - 1) / 2 as mean_rank
    from customer
    window w as (partition by c_nationkey order by c_acctbal desc)
    """,
    tags=("window",),
)
def q_rank_ties_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROC RANK's DEFAULT tie handling, TIES=MEAN: tied values share
    the average of the positions they span — rank + (n_ties - 1)/2.
    Composed from two window functions over the same partitioning
    (one ordered, one value-grouped), so Spark plans a single exchange
    on c_nationkey for both; no second shuffle for the tie count."""
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    w_tie = Window.partitionBy("c_nationkey", "c_acctbal")
    return customer.select(
        "c_custkey",
        "c_nationkey",
        (
            F.rank().over(w)
            + (F.count(F.lit(1)).over(w_tie).cast("double") - 1) / 2
        ).alias("mean_rank"),
    )


@query(
    "q_rank_tie_modes",
    oracle="""
    select p_partkey, p_brand, p_size,
           cast(rank() over w as bigint) as r_low,
           cast(rank() over w
                + count(*) over (partition by p_brand, p_size) - 1
                as bigint) as r_high,
           cast(dense_rank() over w as bigint) as r_dense,
           round(rank() over w
                 + (cast(count(*) over (partition by p_brand, p_size)
                         as double) - 1) / 2, 1) as r_mean,
           round(percent_rank() over w, 6) as r_fraction,
           round(cume_dist() over w, 6) as r_cume
    from part
    window w as (partition by p_brand order by p_size)
    """,
    tags=("window",),
)
def q_rank_tie_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every PROC RANK output mode in one pass: the four TIES= modes
    (LOW = ANSI rank(), DENSE = dense_rank(), HIGH = rank +
    tie_count - 1, MEAN = rank + (tie_count - 1)/2) plus the
    FRACTION/PERCENT family (percent_rank = (rank-1)/(n-1), cume_dist
    = NPLUS1-style cumulative fraction). p_size within p_brand is
    heavily tied (integer domain 1..50), so every mode is exercised
    on real tie groups. All three window specs share the p_brand hash
    partitioning — Spark plans ONE exchange; every output is
    tie-deterministic (a function of the order VALUE, not row
    position), so no tiebreak column is needed for cross-engine
    parity."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    w = Window.partitionBy("p_brand").orderBy("p_size")
    w_tie = Window.partitionBy("p_brand", "p_size")
    low = F.rank().over(w)
    tie_n = F.count(F.lit(1)).over(w_tie)
    return part.select(
        "p_partkey",
        "p_brand",
        "p_size",
        low.cast("long").alias("r_low"),
        (low + tie_n - 1).cast("long").alias("r_high"),
        F.dense_rank().over(w).cast("long").alias("r_dense"),
        F.round(low + (tie_n.cast("double") - 1) / 2, 1).alias("r_mean"),
        F.round(F.percent_rank().over(w), 6).alias("r_fraction"),
        F.round(F.cume_dist().over(w), 6).alias("r_cume"),
    )


@query(
    "q_rolling_stats",
    oracle="""
    select event_id,
           round(min(value) over w, 6) as roll_min,
           round(max(value) over w, 6) as roll_max,
           round(stddev_samp(value) over w, 6) as roll_std
    from events
    window w as (partition by user_id order by ts, event_id
                 rows between 6 preceding and current row)
    """,
    tags=("window", "events"),
)
def q_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row min/max/sample-stddev per user (SAS: PROC EXPAND
    TRANSFORMOUT=(MOVMIN 7 / MOVMAX 7 / MOVSTD 7) — the envelope and
    volatility bands next to q_moving_avg's MOVAVE). All three share
    ONE window spec, so Spark plans a single partitioned sort and
    evaluates the frame once per row; the first row of each series
    has a 1-row frame, where sample stddev is NULL on both engines
    (n-1 = 0)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return events.select(
        "event_id",
        F.round(F.min("value").over(w), 6).alias("roll_min"),
        F.round(F.max("value").over(w), 6).alias("roll_max"),
        F.round(F.stddev_samp("value").over(w), 6).alias("roll_std"),
    )
