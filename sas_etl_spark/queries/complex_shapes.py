"""Composite query shapes: multi-operator pipelines of the kind real
reference workloads chain together (filter+join+agg+top-N, correlated
subqueries, exact pairwise text similarity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.operators.broadcast import broadcast_if_small
from sas_etl_spark.operators.graph import connected_components
from sas_etl_spark.operators.minhash import (
    jaccard,
    prefix_filtered_pairs,
    shingle_array,
)
from sas_etl_spark.registry import query


@query(
    "q_ship_priority",
    oracle="""
    select l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
           o_orderdate, o_orderpriority
    from customer
    join orders   on c_custkey = o_custkey
    join lineitem on l_orderkey = o_orderkey
    where c_mktsegment = 'BUILDING'
      and o_orderdate < timestamp '1996-03-15 00:00:00'
      and l_shipdate  > timestamp '1996-03-15 00:00:00'
    group by l_orderkey, o_orderdate, o_orderpriority
    order by revenue desc, l_orderkey
    limit 10
    """,
    tags=("join", "composite"),
)
def q_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority shape (TPC-H Q3 class): selective dimension
    filter -> two joins -> agg -> global top-10. Filters sit before the
    joins so they push to the scans; the segment-filtered customer side
    takes a SIZE-GATED broadcast hint (customer grows with SF — past
    the bound AQE picks the strategy, and its runtime stats still see
    the ~1/5 segment selectivity); top-10 is TakeOrdered on the rounded
    revenue with orderkey tiebreak (deterministic limit boundary)."""
    customer = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1996-03-15 00:00:00").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    lineitem = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(broadcast_if_small(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q_min_per_group_join",
    oracle="""
    select s.s_nationkey, s.s_suppkey, s.s_name, s.s_acctbal
    from supplier s
    where s.s_acctbal = (select min(s2.s_acctbal) from supplier s2
                         where s2.s_nationkey = s.s_nationkey)
    """,
    tags=("join", "composite"),
)
def q_min_per_group_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (TPC-H Q2 class): rows achieving their
    group's minimum. SAS: PROC SQL correlated subquery (or sort +
    FIRST.). Implemented as a min-over-window + filter — one shuffle,
    no self-join, and ties are kept exactly like the correlated
    subquery keeps them (Catalyst decorrelates the oracle's form into
    the same aggregate-join shape)."""
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_nationkey", "s_suppkey", "s_name", "s_acctbal"
    )
    w = Window.partitionBy("s_nationkey")
    return (
        supplier.withColumn("_mn", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("_mn"))
        .drop("_mn")
    )


@query(
    "q_jaccard_pairs",
    oracle="""
    with sh as (
        select doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                   i -> array_to_string(
                            (string_split(text, ' '))[i:i+2], ' '))) as s
        from documents
    )
    select a.doc_id as a_id, b.doc_id as b_id,
           round(len(list_intersect(a.s, b.s)) * 1.0
                 / len(list_distinct(list_concat(a.s, b.s))), 6) as jaccard
    from sh a, sh b
    where a.doc_id < b.doc_id
      and round(len(list_intersect(a.s, b.s)) * 1.0
                / len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.2
    """,
    tags=("dedup", "text"),
)
def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram-Jaccard pair scoring (driver-mandated dedup
    flavor, standalone exact form): all pairs >= 0.2 on 3-gram shingle
    sets. This is the verification primitive the MinHash-LSH pipeline
    (q_near_dup_minhash) accelerates; kept exact here as its own
    operator and as the LSH ground truth. All-pairs is the verifiable
    test-SF form — at 100 TB candidates come from LSH only."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        F.col("doc_id"), shingle_array(F.col("text")).alias("_sh")
    )
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("_sh").alias("_sa"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("_sh").alias("_sb"))
    return (
        a.join(b, a.a_id < b.b_id)
        .select(
            "a_id",
            "b_id",
            F.round(jaccard(F.col("_sa"), F.col("_sb")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.2)
    )


@query(
    "q_containment_pairs",
    oracle="""
    with sh as (
        select doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                   i -> array_to_string(
                            (string_split(text, ' '))[i:i+2], ' '))) as s
        from documents
    )
    select a.doc_id as a_id, b.doc_id as b_id,
           round(len(list_intersect(a.s, b.s)) * 1.0 / len(a.s), 6)
               as containment
    from sh a, sh b
    where a.doc_id <> b.doc_id
      and round(len(list_intersect(a.s, b.s)) * 1.0 / len(a.s), 6) >= 0.8
    """,
    tags=("dedup", "text", "scale"),
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-CONTAINMENT dedup pairs — the asymmetric relation
    Jaccard misses: C(A->B) = |sh(A) n sh(B)|/|sh(A)| >= 0.8 flags a
    doc mostly reproduced inside another (quotes, boilerplate,
    subset-duplication) even when the longer doc makes the union —
    and thus Jaccard — tiny. Ordered pairs (a contained-in b), both
    directions for exact dups.

    Spark side is operators/minhash.containment_filtered_pairs: A's
    xxhash-ordered shingle prefix (length |A|-ceil(t|A|)+1) equi-
    joined against ALL of B's shingles with the |B| >= t|A| size
    filter, then exact verify — recall provably 1, candidates from
    postings collisions, never all-pairs. The DuckDB oracle is the
    brute-force O(n^2) ground truth (test-SF verifiable form; at
    100 TB candidates come from the prefix join only)."""
    docs = load_table(spark, sf_dir, "documents")
    from sas_etl_spark.operators.minhash import containment_filtered_pairs

    return containment_filtered_pairs(docs, threshold=0.8)


@query(
    "q_dedup_containment",
    oracle="""
    with kept as (
        select min(doc_id) as doc_id, text
        from documents
        group by text
    ),
    sh as (
        select doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                   i -> array_to_string(
                            (string_split(text, ' '))[i:i+2], ' '))) as s
        from kept
    )
    select a.doc_id as a_id, b.doc_id as b_id,
           round(len(list_intersect(a.s, b.s)) * 1.0 / len(a.s), 6)
               as containment
    from sh a, sh b
    where a.doc_id <> b.doc_id
      and round(len(list_intersect(a.s, b.s)) * 1.0 / len(a.s), 6) >= 0.8
    """,
    tags=("dedup", "text", "scale", "composite"),
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The containment join's PRODUCTION POSTURE (VERDICT r8 item 5):
    exact dedup FIRST, containment on the collapsed corpus. Verbatim
    copies make the containment relation output-quadratic (every copy
    pair has C = 1 — 501k true pairs on the replicated sf1 fixture,
    20.8 s), yet carry no curation signal beyond "identical": the
    exact stage collapses each digest group to its min-doc_id
    representative, and the prefix-filtered containment join then runs
    on distinct texts only, where true pairs are the genuinely
    asymmetric near-containments. Measured at sf1: the composite cuts
    the containment stage's input back to the distinct corpus and the
    20.8 s standalone cost collapses with it (SCALE.md round-9 table).

    Plan: one map-side-combined groupBy on the 32-byte sha2 digest
    (min(struct(doc_id, text)) ships ONE representative per digest per
    partition — copies never cross the wire), then
    operators/minhash.containment_filtered_pairs unchanged. The oracle
    groups by raw text (same partition of the corpus, sha256 collision
    aside) and replays the brute-force containment ground truth over
    the kept set."""
    from sas_etl_spark.operators.minhash import containment_filtered_pairs

    docs = load_table(spark, sf_dir, "documents")
    kept = (
        docs.select(F.sha2(F.col("text"), 256).alias("_dg"), "doc_id", "text")
        .groupBy("_dg")
        .agg(F.min(F.struct("doc_id", "text")).alias("_kv"))
        .select(
            F.col("_kv.doc_id").alias("doc_id"),
            F.col("_kv.text").alias("text"),
        )
    )
    return containment_filtered_pairs(kept, threshold=0.8)


@query(
    "q_dup_clusters",
    oracle="""
    with recursive sh as (
        select doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                   i -> array_to_string(
                            (string_split(text, ' '))[i:i+2], ' '))) as s
        from documents
    ),
    pairs as (
        select a.doc_id as a_id, b.doc_id as b_id
        from sh a, sh b
        where a.doc_id < b.doc_id
          and round(len(list_intersect(a.s, b.s)) * 1.0
                    / len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.2
    ),
    edges as (
        select a_id as u, b_id as v from pairs
        union all
        select b_id as u, a_id as v from pairs
    ),
    reach(u, v) as (
        select u, v from edges
        union
        select r.u, e.v from reach r join edges e on r.v = e.u
    )
    select u as doc_id,
           least(u, min(v)) as cluster_id,
           cast(case when least(u, min(v)) = u then 1 else 0 end as int)
               as is_rep
    from reach
    group by u
    """,
    tags=("dedup", "graph", "composite"),
)
def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS from pair edges — the keep/drop stage of the
    dedup pipeline. Pair finders (q_jaccard_pairs exact form here; the
    MinHash/SimHash/SRP LSH twins at scale) emit edges; near-duplication
    is transitive in practice, so the keep-set needs connected
    components: cluster_id = min doc_id of the component, is_rep marks
    the one kept document per cluster. Spark side is iterative
    min-label propagation with pointer jumping (operators/graph.py);
    the oracle is the recursive-CTE transitive closure, exercising the
    driver's hash compare on an iterative algorithm's output.

    The EDGE stage here is the exact all-pairs scorer and inherits
    q_jaccard_pairs' status: ground-truth form, test-SF only (the
    driver verifies at sf0.01 = 125k pairs; at sf0.1 the 12.5M-pair
    HOF scoring already takes minutes on both engines). At scale the
    edges come from the LSH candidate generators (near_dup_pairs /
    simhash / SRP) — connected_components is edge-source-agnostic and
    materializes whatever edge list it is given exactly once."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(F.col("doc_id"), shingle_array(F.col("text")).alias("_sh"))
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("_sh").alias("_sa"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("_sh").alias("_sb"))
    pairs = (
        a.join(b, a.a_id < b.b_id)
        .select(
            "a_id",
            "b_id",
            F.round(jaccard(F.col("_sa"), F.col("_sb")), 6).alias("_j"),
        )
        .filter(F.col("_j") >= 0.2)
        .select("a_id", "b_id")
    )
    comps = connected_components(pairs)
    return comps.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).cast("int").alias("is_rep"),
    )


@query(
    "q_neardup_apply",
    oracle="""
    with recursive sh as (
        select doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                   i -> array_to_string(
                            (string_split(text, ' '))[i:i+2], ' '))) as s
        from documents
    ),
    pairs as (
        select a.doc_id as a_id, b.doc_id as b_id
        from sh a, sh b
        where a.doc_id < b.doc_id
          and round(len(list_intersect(a.s, b.s)) * 1.0
                    / len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.2
    ),
    edges as (
        select a_id as u, b_id as v from pairs
        union all
        select b_id as u, a_id as v from pairs
    ),
    reach(u, v) as (
        select u, v from edges
        union
        select r.u, e.v from reach r join edges e on r.v = e.u
    ),
    dropped as (
        select u as doc_id from reach
        group by u having least(u, min(v)) <> u
    )
    select d.source,
           cast(count(*) as bigint) as n_docs,
           cast(count(*) filter (where dr.doc_id is not null) as bigint)
               as n_dropped,
           cast(count(*) filter (where dr.doc_id is null) as bigint)
               as n_kept,
           bit_xor(case when dr.doc_id is null then
               list_reduce(list_transform(range(1, 16),
                 j -> strpos('0123456789abcdef',
                             substr(sha256(cast(d.doc_id as varchar)),
                                    j, 1)) - 1),
               (a, x) -> a * 16 + x) else 0 end) as kept_digest
    from documents d
    left join dropped dr on dr.doc_id = d.doc_id
    group by d.source
    """,
    tags=("dedup", "graph", "composite", "llm"),
)
def q_neardup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster APPLY — materialize the deduplicated corpus
    from the cluster decision (q_dup_clusters marks is_rep; this op
    executes the drop): every non-representative cluster member is
    removed, and the output audits the result per source (doc counts
    kept/dropped plus an order-insensitive bit_xor digest of the
    KEPT doc_id set — one wrongly kept or dropped document flips it).
    Completes the dedup lane's plan->apply closure, same as
    q_mixture_apply for mixing and q_span_dedup for substrings.

    Edge stage: the exact all-pairs scorer (ground-truth form,
    test-SF only — q_dup_clusters' contract); at 100 TB the edges
    come from the LSH candidate generators instead and everything
    downstream is unchanged. The drop set is O(duplicates) and joins
    back LEFT onto the corpus scan by doc_id — an anti-join-with-
    audit, one digest-keyed shuffle; connected components is the
    iteration-bounded pointer-jumping operator (operators/graph.py).
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(F.col("doc_id"), shingle_array(F.col("text")).alias("_sh"))
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("_sh").alias("_sa"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("_sh").alias("_sb"))
    pairs = (
        a.join(b, a.a_id < b.b_id)
        .select(
            "a_id",
            "b_id",
            F.round(jaccard(F.col("_sa"), F.col("_sb")), 6).alias("_j"),
        )
        .filter(F.col("_j") >= 0.2)
        .select("a_id", "b_id")
    )
    comps = connected_components(pairs)
    dropped = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id"), F.lit(1).alias("_drop")
    )
    digest = F.conv(
        F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 15),
        16,
        10,
    ).cast("long")
    is_kept = F.col("_drop").isNull()
    return (
        docs.select("doc_id", "source")
        .join(dropped, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((~is_kept).cast("long")).alias("n_dropped"),
            F.sum(is_kept.cast("long")).alias("n_kept"),
            F.bit_xor(F.when(is_kept, digest).otherwise(F.lit(0))).alias(
                "kept_digest"
            ),
        )
    )


@query(
    "q_prefix_join",
    oracle="""
    with sh as (
        select doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                   i -> array_to_string(
                            (string_split(text, ' '))[i:i+2], ' '))) as s
        from documents
    )
    select a.doc_id as a_id, b.doc_id as b_id,
           round(len(list_intersect(a.s, b.s)) * 1.0
                 / len(list_distinct(list_concat(a.s, b.s))), 6) as jaccard
    from sh a, sh b
    where a.doc_id < b.doc_id
      and round(len(list_intersect(a.s, b.s)) * 1.0
                / len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.5
    """,
    tags=("dedup", "text", "scale"),
)
def q_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT similarity join at threshold 0.5 via prefix filtering
    (AllPairs) — provably recall-1 pruning, verified against the
    brute-force oracle: candidates come from an equi-join on exploded
    canonical-prefix tokens instead of the O(n^2) cross join
    (q_jaccard_pairs' shape), and the exact verify keeps precision at
    1. This is the third pillar of the dedup family: exact all-pairs
    (ground truth, test-SF only), MinHash-LSH (probabilistic, any
    threshold), prefix filtering (exact AND pruned, high thresholds).
    """
    docs = load_table(spark, sf_dir, "documents")
    return prefix_filtered_pairs(docs, threshold=0.5)


#: The canned spec q_pipeline_spec runs — a control-table-style job
#: definition (see sas_etl_spark.pipeline): revenue by return flag for
#: 1996-Q1-shipped lines of open orders.
PIPELINE_SPEC = [
    {"op": "load", "table": "lineitem"},
    {
        "op": "filter",
        "where": "l_shipdate >= timestamp '1996-01-01 00:00:00' "
                 "and l_shipdate < timestamp '1996-04-01 00:00:00'",
    },
    {"op": "derive", "cols": {"revenue": "l_extendedprice * (1 - l_discount)"}},
    {"op": "join", "table": "orders", "on": ["l_orderkey=o_orderkey"]},
    {"op": "filter", "where": "o_orderstatus = 'O'"},
    {
        "op": "agg",
        "by": ["l_returnflag"],
        "aggs": {
            "n": "cast(count(*) as bigint)",
            "rev": "round(sum(revenue), 2)",
        },
    },
    {"op": "select", "cols": ["l_returnflag", "n", "rev"]},
]


@query(
    "q_pipeline_spec",
    oracle="""
    select l_returnflag,
           cast(count(*) as bigint) as n,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as rev
    from lineitem join orders on l_orderkey = o_orderkey
    where l_shipdate >= timestamp '1996-01-01 00:00:00'
      and l_shipdate < timestamp '1996-04-01 00:00:00'
      and o_orderstatus = 'O'
    group by l_returnflag
    """,
    tags=("composite", "pipeline"),
)
def q_pipeline_spec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-driven job: the ENTIRE query is the PIPELINE_SPEC data
    structure interpreted by sas_etl_spark.pipeline.run_pipeline (SAS:
    %macro-driven ETL reading control tables). The spec compiles to
    one Catalyst plan, so the hash match proves declaring jobs as data
    loses nothing: filters still push to both scans, the join still
    broadcasts, the agg still gets map-side partials."""
    from sas_etl_spark.pipeline import run_pipeline

    return run_pipeline(spark, sf_dir, PIPELINE_SPEC)


@query(
    "q_market_basket",
    oracle="""
    with li as (select distinct l_orderkey, l_partkey from lineitem),
    n as (select cast(count(distinct l_orderkey) as double) as n_orders
          from li),
    item as (select l_partkey, cast(count(*) as bigint) as c from li
             group by l_partkey),
    pairs as (
        select a.l_partkey as p1, b.l_partkey as p2,
               cast(count(*) as bigint) as support
        from li a join li b
          on a.l_orderkey = b.l_orderkey and a.l_partkey < b.l_partkey
        group by p1, p2
        having count(*) >= 2
    )
    select p1, p2, support,
           round(support * n_orders / (i1.c * i2.c), 6) as lift
    from pairs
    join item i1 on p1 = i1.l_partkey
    join item i2 on p2 = i2.l_partkey
    cross join n
    order by support desc, lift desc, p1, p2
    limit 50
    """,
    tags=("analytics", "join"),
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with support and lift (SAS: PROC
    ASSOC / the association-rules half of Enterprise Miner; the
    co-purchase analysis every retail ETL ships). Top-50 part pairs
    ordered by a 2+ support floor.

    Scale shape: the pair generator is a keyed SELF-JOIN on the
    basket id — pair work per basket is bounded by (items/basket)^2,
    never corpus-quadratic; the p1<p2 predicate halves it and
    canonicalizes pair identity. Item counts and the basket total are
    broadcast back over the (already reduced) pair table. At 100 TB:
    one shuffle on basket id + one on pair id; a support-floor
    pre-filter (frequent-items first, the Apriori property) slots in
    before the self-join when baskets are wide. LIMIT rides a
    deterministic (support, lift, p1, p2) total order on both
    engines."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = li.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_orders")
    )
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p1"))
    b = li.select(F.col("l_orderkey").alias("k2"), F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, (a.k == b.k2) & (a.p1 < b.p2))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    i1 = item.select(F.col("l_partkey").alias("p1"), F.col("c").alias("c1"))
    i2 = item.select(F.col("l_partkey").alias("p2"), F.col("c").alias("c2"))
    return (
        pairs.join(F.broadcast(i1), "p1")
        .join(F.broadcast(i2), "p2")
        .crossJoin(F.broadcast(n))
        .select(
            "p1",
            "p2",
            "support",
            F.round(
                F.col("support") * F.col("n_orders") / (F.col("c1") * F.col("c2")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), F.desc("lift"), F.asc("p1"), F.asc("p2"))
        .limit(50)
    )


# -- PageRank (fixed-iteration) --------------------------------------

PR_DAMPING = 0.85
PR_ITERS = 5

#: The k-iteration update as chained CTE steps — generated so the
#: oracle's iteration count provably equals PR_ITERS.
def _pagerank_oracle() -> str:
    steps = []
    prev = "p0"
    for k in range(1, PR_ITERS + 1):
        steps.append(f"""
    p{k} as (
        select nodes.node,
               {1 - PR_DAMPING} / n.nn + {PR_DAMPING} * coalesce(s.c, 0)
                   as pr
        from nodes cross join n
        left join (select en.dst, sum(en.wn * {prev}.pr) as c
                   from en join {prev} on {prev}.node = en.src
                   group by en.dst) s
          on s.dst = nodes.node
    )""")
        prev = f"p{k}"
    return f"""
    with edges as (
        select c.c_nationkey as src, s.s_nationkey as dst,
               cast(count(*) as double) as w
        from orders o
        join customer c on c.c_custkey = o.o_custkey
        join lineitem l on l.l_orderkey = o.o_orderkey
        join supplier s on s.s_suppkey = l.l_suppkey
        group by c.c_nationkey, s.s_nationkey
    ),
    outw as (select src, sum(w) as ow from edges group by src),
    en as (select e.src, e.dst, e.w / o.ow as wn
           from edges e join outw o on o.src = e.src),
    nodes as (select distinct node from (
        select src as node from edges
        union select dst from edges) t),
    n as (select cast(count(*) as double) as nn from nodes),
    p0 as (select node, 1.0 / n.nn as pr from nodes cross join n),
    {",".join(steps)}
    select node, round(pr, 6) as pagerank from {prev}
    """


@query("q_pagerank", oracle=_pagerank_oracle(), tags=("graph", "composite"))
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation-to-nation trade graph (edges =
    customer-nation -> supplier-nation weighted by line items;
    5 power iterations, damping 0.85) — the canonical ITERATIVE
    dataflow, declared as a loop of joins + aggregates with NO
    driver-side graph state (SAS has no analog; closest is IML
    matrix iteration).

    pr'(v) = (1-d)/N + d * sum over in-edges (u,v) of
    pr(u) * w(u,v)/out_weight(u). The oracle UNROLLS the identical
    update into chained CTEs generated from the same constants, so
    iteration count and arithmetic provably match; 6dp rounding covers
    summation-order drift (~1e-15 after 5 rounds).

    Scale: each iteration is one join + one grouped sum on the edge
    list — the rank vector is O(nodes) and the join keys on src, so
    1000x more edges changes task counts, not shape. Long iteration
    chains would localCheckpoint every few rounds exactly as
    connected_components does (operators/graph.py); 5 rounds on a
    25-node rank vector doesn't need it.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    edges = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(supp, supp.s_suppkey == li.l_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        # materialize the O(nations^2) edge list ONCE: the node-count
        # job, the out-weight agg, and all 5 iterations then read the
        # checkpointed rows instead of re-deriving the 4-table join
        # (the connected_components lineage-truncation precedent)
        .localCheckpoint(eager=True)
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    en = edges.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("ow")).alias("wn")
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # driver-side scalar: O(nations), bounded
    pr = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr"))
    for _ in range(PR_ITERS):
        contrib = (
            en.join(pr, en.src == pr.node)
            .groupBy("dst")
            .agg(F.sum(F.col("wn") * F.col("pr")).alias("c"))
        )
        pr = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            (
                F.lit((1 - PR_DAMPING) / n_nodes)
                + PR_DAMPING * F.coalesce("c", F.lit(0.0))
            ).alias("pr"),
        )
    return pr.select("node", F.round("pr", 6).alias("pagerank"))


# -- hierarchy flattening (bounded-depth recursion) -------------------

HIER_NODES = 127  # perfect binary tree: node k's parent is k div 2
HIER_DEPTH_BOUND = 7  # ceil(log2(127)) — the join-iteration bound


@query(
    "q_hierarchy_flatten",
    oracle=f"""
    with recursive nodes as (
        select c_custkey as node, c_custkey // 2 as parent
        from customer where c_custkey between 1 and {HIER_NODES}
    ),
    walk as (
        select node, node as cur, 0 as depth from nodes
        union all
        select w.node, n.parent, w.depth + 1
        from walk w join nodes n on n.node = w.cur
        where w.cur <> 1
    )
    select node, cast(max(depth) as bigint) as depth,
           cast(1 as bigint) as root,
           node * 2 > {HIER_NODES} as is_leaf
    from walk group by node
    """,
    tags=("graph", "composite", "sas-semantics"),
)
def q_hierarchy_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-child hierarchy flattening — depth and root for every
    node of a 127-node tree (BOM explosion / org-chart rollup; SAS:
    PROC TREE or a DATA-step point-chase loop; SQL: recursive CTE).

    The hierarchy derives deterministically from customer keys
    (node k's parent = k div 2). Spark has no recursive CTE — the
    Spark-native form is a BOUNDED ITERATIVE JOIN: walk one parent
    step per round for ceil(log2(N)) rounds, retiring nodes that
    reached the root; the oracle's recursive CTE computes identical
    depths. Termination is structural (depth bound), not data-driven
    — no driver-side convergence checks at all.

    Scale: each round is one equi-join of the frontier against the
    parent map — right while depth is small and known. For DEEP
    hierarchies use operators/graph.py::flatten_hierarchy —
    pointer doubling (ancestor-of-ancestor), ceil(log2(depth)) rounds
    with localCheckpoint between them; property-tested equal to this
    walker on this tree and to a Python parent-walk on 600-deep
    chains and random forests (tests/test_graph.py).
    """
    cust = load_table(spark, sf_dir, "customer")
    nodes = cust.filter(
        (F.col("c_custkey") >= 1) & (F.col("c_custkey") <= HIER_NODES)
    ).select(
        F.col("c_custkey").alias("node"),
        F.floor(F.col("c_custkey") / 2).cast("long").alias("parent"),
    )
    parents = nodes.select(
        F.col("node").alias("p_node"), F.col("parent").alias("p_parent")
    )
    walk = nodes.select(
        "node", F.col("node").alias("cur"), F.lit(0).alias("depth")
    )
    for _ in range(HIER_DEPTH_BOUND):
        stepped = (
            walk.join(parents, walk.cur == parents.p_node, "left")
            .select(
                "node",
                F.when(F.col("cur") == 1, F.col("cur"))
                .otherwise(F.col("p_parent"))
                .alias("cur"),
                F.when(F.col("cur") == 1, F.col("depth"))
                .otherwise(F.col("depth") + 1)
                .alias("depth"),
            )
        )
        walk = stepped
    return walk.select(
        "node",
        F.col("depth").cast("long").alias("depth"),
        F.lit(1).cast("long").alias("root"),
        (F.col("node") * 2 > HIER_NODES).alias("is_leaf"),
    )


# -- triangle counting (graph motifs) ------------------------------------


@query(
    "q_triangles",
    oracle="""
    with dedges as (
        select distinct c.c_nationkey as src, s.s_nationkey as dst
        from orders o
        join customer c on c.c_custkey = o.o_custkey
        join lineitem l on l.l_orderkey = o.o_orderkey
        join supplier s on s.s_suppkey = l.l_suppkey
        where c.c_nationkey <> s.s_nationkey
    ),
    und as (
        select least(src, dst) as u, greatest(src, dst) as v
        from dedges group by 1, 2
    ),
    tri as (
        select e1.u as a, e1.v as b, e2.v as c
        from und e1
        join und e2 on e2.u = e1.v
        join und e3 on e3.u = e1.u and e3.v = e2.v
    ),
    per_node as (
        select node, cast(count(*) as bigint) as n_triangles from (
            select a as node from tri
            union all select b from tri
            union all select c from tri
        ) t group by node
    ),
    deg as (
        select node, cast(count(*) as bigint) as degree from (
            select u as node from und union all select v from und
        ) t group by node
    )
    select d.node, d.degree,
           coalesce(p.n_triangles, 0) as n_triangles,
           round(case when d.degree >= 2
                      then 2.0 * coalesce(p.n_triangles, 0)
                           / (d.degree * (d.degree - 1))
                      else 0 end, 6) as clustering_coef
    from deg d left join per_node p using (node)
    """,
    tags=("graph", "composite"),
)
def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + local clustering coefficient over the
    nation trade graph (same edge derivation as q_pagerank, made
    undirected and deduplicated) — the canonical graph-motif operator
    (SAS has no analog; this is the Cohen / node-iterator-with-
    ordering MapReduce algorithm). Each triangle {a<b<c} is
    enumerated EXACTLY ONCE by joining ordered edges: (a,b) ⋈ (b,c)
    ⋈ (a,c) with a<b<c enforced by the least/greatest normalization —
    no double counting, no direction ambiguity. Per node: triangle
    membership count and the local clustering coefficient
    2T / (deg * (deg-1)).

    Scale: the ordering trick is THE scale device — undirected edges
    stored once as (min, max) make the two-hop join enumerate each
    wedge once, and the closing-edge join is an equi-join on the
    (u, v) pair; everything shuffles on node keys. Degree skew is the
    classic hazard (hub wedges are quadratic in hub degree) — the
    production mitigation is degree-ordered orientation (orient each
    edge toward the higher-degree endpoint, bounding wedge fan-out by
    arboricity); on the 25-node fixture graph the id ordering already
    suffices and keeps the oracle replay exact."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    dedges = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(supp, supp.s_suppkey == li.l_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .distinct()
    )
    und = (
        dedges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
        # O(nations^2) rows; three self-join consumers below read the
        # checkpoint instead of re-deriving the 4-table join
        .localCheckpoint(eager=True)
    )
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = und.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    per_node = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    t = F.coalesce("n_triangles", F.lit(0))
    return deg.join(per_node, "node", "left").select(
        "node",
        F.col("degree").cast("long").alias("degree"),
        t.cast("long").alias("n_triangles"),
        F.round(
            F.when(
                F.col("degree") >= 2,
                2.0 * t / (F.col("degree") * (F.col("degree") - 1)),
            ).otherwise(0.0),
            6,
        ).alias("clustering_coef"),
    )
