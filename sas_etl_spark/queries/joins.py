"""Join queries (SURVEY.md §2.3): MERGE / PROC SQL join class."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.operators.asof import most_recent_prior
from sas_etl_spark.operators.broadcast import broadcast_if_small
from sas_etl_spark.registry import query


@query(
    "q_join3_revenue",
    oracle="""
    select n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
    from customer
    join orders   on c_custkey = o_custkey
    join lineitem on l_orderkey = o_orderkey
    join nation   on c_nationkey = n_nationkey
    group by n_name
    """,
    tags=("bench", "join", "flagship"),
)
def q_join3_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation: 3-way equi-join + aggregation (SAS: PROC SQL
    multi-join / MERGE chain + PROC MEANS). SURVEY.md §2.3 #19, #25.

    Scale plan: only the join keys + measures are selected, so the
    parquet scans read 2-3 columns each. nation (25 rows) is broadcast
    explicitly (SAS hash-object analog); lineitem⋈orders and ⋈customer
    shuffle on their keys, where AQE re-plans to broadcast at small SF
    and splits skewed partitions at large SF.
    """
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q_merge_in_flags",
    oracle="""
    select coalesce(c.c_custkey, o.o_custkey) as custkey,
           c.c_name, o.o_orderkey,
           case when c.c_custkey is not null then 1 else 0 end as in_a,
           case when o.o_custkey is not null then 1 else 0 end as in_b
    from customer c full join orders o on c.c_custkey = o.o_custkey
    """,
    tags=("join",),
)
def q_merge_in_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAS match-merge: ``MERGE customer(IN=a) orders(IN=b); BY
    custkey;`` — full outer join + IN= flags. SURVEY.md §2.3 #18.

    The IN= subsetting idioms reduce to join types: ``IF a AND b`` →
    inner, ``IF a AND NOT b`` → left_anti — see q_semi_join /
    q_anti_join.
    """
    customer = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name")
        .withColumn("in_a", F.lit(1))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .withColumn("in_b", F.lit(1))
    )
    joined = customer.join(orders, customer.c_custkey == orders.o_custkey, "full")
    return joined.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_name",
        "o_orderkey",
        F.coalesce("in_a", F.lit(0)).alias("in_a"),
        F.coalesce("in_b", F.lit(0)).alias("in_b"),
    )


@query(
    "q_left_join_null",
    oracle="""
    select c.c_custkey,
           count(o.o_orderkey) as n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) as total_spend
    from customer c left join orders o on c.c_custkey = o.o_custkey
    group by c.c_custkey
    """,
    tags=("join",),
)
def q_left_join_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-aware aggregation (customers with
    zero orders kept, count(col) skips nulls). SURVEY.md §2.3 #20."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@query(
    "q_semi_join",
    oracle="""
    select c_custkey, c_name from customer
    where exists (select 1 from orders
                  where o_custkey = c_custkey and o_totalprice > 300000)
    """,
    tags=("join",),
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (SAS: MERGE IN= flags with IF a AND b, or WHERE
    EXISTS). SURVEY.md §2.3 #23. left_semi never duplicates the left
    side and shuffles only the key column of the right.
    """
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select("o_custkey")
    )
    return customer.join(
        big_orders, customer.c_custkey == big_orders.o_custkey, "left_semi"
    )


@query(
    "q_anti_join",
    oracle="""
    select c_custkey, c_name from customer
    where not exists (select 1 from orders
                      where o_custkey = c_custkey
                        and o_orderdate < timestamp '1996-01-01 00:00:00')
    """,
    tags=("join",),
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: customers with no pre-1996 order (SAS: MERGE IN=
    with IF a AND NOT b). SURVEY.md §2.3 #24. Written as NOT EXISTS
    (not NOT IN) so null semantics are identical across engines
    (§4.3). The date filter keeps the result non-empty at every SF —
    every customer has *some* order in the fixtures."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    early_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return customer.join(
        early_orders, customer.c_custkey == early_orders.o_custkey, "left_anti"
    )


@query(
    "q_range_join",
    oracle="""
    select s.s_suppkey,
           count(*) as n_richer
    from supplier s
    join customer c
      on c.c_nationkey = s.s_nationkey and c.c_acctbal > s.s_acctbal
    group by s.s_suppkey
    """,
    tags=("join",),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi-key + range residual (SAS: PROC SQL with
    inequality ON). SURVEY.md §2.3 #22.

    Per nation, count customers richer than each supplier. The smaller
    side (supplier) takes a SIZE-GATED broadcast hint — supplier grows
    with SF (sf×10k rows), so the hint holds only while the scan is
    provably small; past the bound the equi-key part shuffles as a
    hash join and the range predicate still evaluates as a post-probe
    filter — never a nested-loop over the big side.
    """
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    customer = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    return (
        customer.join(
            broadcast_if_small(supplier),
            (F.col("c_nationkey") == F.col("s_nationkey"))
            & (F.col("c_acctbal") > F.col("s_acctbal")),
        )
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_richer"))
    )


@query(
    "q_asof_event",
    oracle="""
    select p.event_id, max(c.ts) as last_click_ts
    from events p
    left join events c
      on c.user_id = p.user_id and c.event_type = 'click' and c.ts < p.ts
    where p.event_type = 'purchase'
    group by p.event_id
    """,
    tags=("join", "events"),
)
def q_asof_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the most recent prior click of
    the same user. SURVEY.md §2.3 #27.

    The oracle uses the O(n²)-per-user join formulation; the Spark
    plan is the scalable one — a single ordered window carrying the
    last click timestamp forward (operators.asof.most_recent_prior):
    one shuffle+sort per user partition, no row multiplication.
    """
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    relevant = events.filter(F.col("event_type").isin("click", "purchase"))
    with_last = most_recent_prior(
        relevant,
        partition_by=["user_id"],
        order_by=[F.col("ts"), F.col("event_id")],
        source_pred=F.col("event_type") == "click",
        value="ts",
        out_col="last_click_ts",
    )
    return with_last.filter(F.col("event_type") == "purchase").select(
        "event_id", "last_click_ts"
    )


@query(
    "q_bucketed_join",
    oracle="""
    select o_orderkey, cast(count(*) as bigint) as n_items,
           round(sum(l_quantity), 2) as qty
    from lineitem join orders on l_orderkey = o_orderkey
    group by o_orderkey
    order by qty desc, o_orderkey
    limit 20
    """,
    tags=("join", "bucketed", "scale"),
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join (SAS analog: indexed MERGE): both
    sides written bucketBy(8, o_orderkey) + sortBy, then fact⋈fact
    join + SAME-KEY aggregation + top-20 — with ZERO Exchange in the
    plan, asserted at build time. The on-disk bucket layout carries
    hash partitioning through the SortMergeJoin AND the per-orderkey
    aggregate; the only cross-partition movement left is the k-row
    TakeOrderedAndProject driver merge. At 100 TB this is the
    recurring-join pattern: pay one bucketed write, then every later
    join/agg on the key is shuffle-free (SCALE.md). The merge hint
    pins SMJ so the proof can't silently degrade to a broadcast plan.
    Data lands in session scratch (external tables, cleaned at exit);
    oracle recomputes from the raw source, proving the bucketed
    round-trip lost nothing.
    """
    from sas_etl_spark.plans import assert_no_exchange
    from sas_etl_spark.scratch import scratch_dir
    from sas_etl_spark.sources import write_bucketed

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    base = scratch_dir(spark, "bucketed")
    write_bucketed(orders, "sas_etl_b_orders", "o_orderkey", 8, path=f"{base}/orders")
    write_bucketed(
        li, "sas_etl_b_lineitem", "o_orderkey", 8, path=f"{base}/lineitem"
    )
    joined = (
        spark.table("sas_etl_b_lineitem")
        .hint("merge")
        .join(spark.table("sas_etl_b_orders"), "o_orderkey")
    )
    out = (
        joined.groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .orderBy(F.desc("qty"), F.asc("o_orderkey"))
        .limit(20)
    )
    assert_no_exchange(out, "q_bucketed_join")
    return out


@query(
    "q_merge_many_to_many",
    oracle="""
    with a as (
        select o_custkey as k, o_orderkey, o_totalprice,
               row_number() over (partition by o_custkey
                                  order by o_orderkey) as rn
        from orders where o_orderstatus = 'O'
    ), b as (
        select o_custkey as k, o_orderkey, o_totalprice,
               row_number() over (partition by o_custkey
                                  order by o_orderkey) as rn
        from orders where o_orderstatus = 'F'
    ),
    ca as (select k, max(rn) as na from a group by k),
    cb as (select k, max(rn) as nb from b group by k),
    keys as (
        select coalesce(ca.k, cb.k) as k,
               coalesce(na, 0) as na, coalesce(nb, 0) as nb
        from ca full join cb on ca.k = cb.k
    ),
    seq as (
        select k, na, nb,
               unnest(range(1, greatest(na, nb) + 1)) as i
        from keys
    )
    select s.k, cast(s.i as bigint) as i,
           a.o_orderkey as a_order, a.o_totalprice as a_price,
           b.o_orderkey as b_order, b.o_totalprice as b_price
    from seq s
    left join a on a.k = s.k and a.rn = least(s.i, s.na)
    left join b on b.k = s.k and b.rn = least(s.i, s.nb)
    """,
    tags=("join", "sas-semantics"),
)
def q_merge_many_to_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAS MERGE BY with a many-to-many BY group — the semantics SQL
    does NOT have: a DATA-step MERGE walks the two sorted datasets
    ROW-BY-ROW within each BY group, emitting max(n_a, n_b) rows per
    group, with the shorter side's LAST row retained (re-emitted) for
    the overhang — never the n_a*n_b cartesian an SQL join produces.
    Every SAS shop has jobs that depend on this; an engine claiming
    MERGE parity must reproduce it exactly.

    Spark construction (all equi-joins, no cartesian, no UDF):
    row-number both sides within the BY group; full-outer the
    per-group counts; explode sequence(1, greatest(n_a, n_b)) to
    materialize the output skeleton; join each side back on
    (key, least(i, n_side)) — the least() IS the retain-last-row
    rule. Skeleton size is sum of max counts = the exact output,
    partitioned by the BY key throughout; at 100 TB everything
    shuffles once on the BY key. Demonstrated on open-vs-finished
    orders per customer (uneven counts in both directions; customers
    missing a side exercise the one-sided overhang)."""
    orders = load_table(spark, sf_dir, "orders")

    def side(status: str) -> DataFrame:
        from pyspark.sql import Window

        w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        return (
            orders.filter(F.col("o_orderstatus") == status)
            .select(
                F.col("o_custkey").alias("k"),
                "o_orderkey",
                "o_totalprice",
                F.row_number().over(w).cast("long").alias("rn"),
            )
        )

    a, b = side("O"), side("F")
    # column names n_a/n_b, not "na": DataFrame.na is the missing-data
    # accessor and shadows a column of that name in attribute lookups
    ca = a.groupBy("k").agg(F.max("rn").alias("n_a"))
    cb = b.groupBy("k").agg(F.max("rn").alias("n_b"))
    keys = (
        ca.join(cb, "k", "full")
        .select(
            "k",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    seq = keys.select(
        "k", "n_a", "n_b",
        F.explode(F.sequence(F.lit(1), F.greatest("n_a", "n_b"))).alias("i"),
    )
    return (
        seq.join(
            a.select(F.col("k").alias("ak"), F.col("rn").alias("rn_a"),
                     F.col("o_orderkey").alias("a_order"),
                     F.col("o_totalprice").alias("a_price")),
            (seq.k == F.col("ak"))
            & (F.col("rn_a") == F.least(seq.i, F.col("n_a"))),
            "left",
        )
        .join(
            b.select(F.col("k").alias("bk"), F.col("rn").alias("rn_b"),
                     F.col("o_orderkey").alias("b_order"),
                     F.col("o_totalprice").alias("b_price")),
            (F.col("k") == F.col("bk"))
            & (F.col("rn_b") == F.least(F.col("i"), F.col("n_b"))),
            "left",
        )
        .select("k", F.col("i").cast("long").alias("i"),
                "a_order", "a_price", "b_order", "b_price")
    )


# -- fuzzy match / entity resolution ---------------------------------


@query(
    "q_fuzzy_match",
    oracle="""
    with dirty as (
        select c_custkey as dirty_key, c_nationkey,
               substring(c_name, 1, 9 + c_custkey % 7)
                 || substring(c_name, 11 + c_custkey % 7, 100) as dirty_name
        from customer where c_custkey % 10 = 7
    ),
    cand as (
        select d.dirty_key, d.dirty_name, c.c_custkey, c.c_name,
               levenshtein(d.dirty_name, c.c_name) as dist
        from dirty d
        join customer c
          on c.c_nationkey = d.c_nationkey
         and length(c.c_name) = length(d.dirty_name) + 1
        where levenshtein(d.dirty_name, c.c_name) <= 2
    ),
    best as (
        select dirty_key, c_custkey as matched_key,
               cast(dist as bigint) as dist,
               row_number() over (partition by dirty_key
                                  order by dist, c_custkey) as rn
        from cand
    )
    select dirty_key, matched_key, dist,
           matched_key = dirty_key as correct
    from best where rn = 1
    """,
    tags=("join", "quality"),
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-match entity resolution with blocking (SAS: the classic
    PROC SQL + COMPGED fuzzy merge; MDM: link dirty records back to a
    master list).

    A deterministic 10% of customer names get one character deleted
    (the 'dirty' feed — same construction in the oracle). Candidate
    generation is a BLOCKED equi-join on (nationkey, name length+1) —
    never all-pairs: per-block work is bounded by customers-per-nation,
    the real-world analog of blocking on zip/state. Candidates verify
    with levenshtein <= 2 and the best match per dirty record wins
    (min distance, then min key — deterministic). The ``correct``
    column is the attested accuracy metric — a deleted leading digit
    can legitimately tie two masters (e.g. '...23' from both '...123'
    and '...023'), and the deterministic tiebreak resolves such
    ambiguity IDENTICALLY on both engines, so the hash still pins
    every link decision.

    Scale: blocking keys are plain equi-join columns, so the candidate
    join shuffles/broadcasts like any other join; edit distance runs
    only within blocks. Wider recall (insertions + substitutions)
    adds (nationkey, len) and (nationkey, len-1) blocks — union of
    equi-joins, same shape.
    """
    cust = load_table(spark, sf_dir, "customer")
    dirty = cust.filter(F.col("c_custkey") % 10 == 7).select(
        F.col("c_custkey").alias("dirty_key"),
        F.col("c_nationkey").alias("d_nationkey"),
        F.concat(
            F.col("c_name").substr(
                F.lit(1), (F.lit(9) + F.col("c_custkey") % 7).cast("int")
            ),
            F.col("c_name").substr(
                (F.lit(11) + F.col("c_custkey") % 7).cast("int"), F.lit(100)
            ),
        ).alias("dirty_name"),
    )
    clean = cust.select("c_custkey", "c_name", "c_nationkey")
    cand = dirty.join(
        clean,
        (F.col("c_nationkey") == F.col("d_nationkey"))
        & (F.length("c_name") == F.length("dirty_name") + 1),
    ).withColumn("dist", F.levenshtein("dirty_name", "c_name"))
    best = (
        cand.filter(F.col("dist") <= 2)
        .groupBy("dirty_key")
        .agg(
            F.min(F.struct(F.col("dist"), F.col("c_custkey"))).alias("best")
        )
    )
    return best.select(
        "dirty_key",
        F.col("best.c_custkey").alias("matched_key"),
        F.col("best.dist").cast("long").alias("dist"),
        (F.col("best.c_custkey") == F.col("dirty_key")).alias("correct"),
    )
