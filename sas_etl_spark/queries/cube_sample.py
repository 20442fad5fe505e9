"""CUBE/grouping-id and sampling queries — completing the PROC MEANS
TYPES/WAYS surface (SAS _TYPE_) and PROC SURVEYSELECT."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.registry import query


@query(
    "q_cube",
    oracle="""
    select coalesce(l_returnflag, 'ALL') as rf,
           coalesce(l_linestatus, 'ALL') as ls,
           cast(grouping(l_returnflag) * 2 + grouping(l_linestatus) as bigint) as type_id,
           round(sum(l_quantity), 2) as q,
           count(*) as n
    from lineitem
    group by cube(l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All CLASS-combination subtotals (SAS: PROC MEANS with two CLASS
    vars — all _TYPE_ levels). grouping_id() reproduces _TYPE_ exactly
    (bit per grouped-out column). One aggregation pass expands the 4
    grouping sets internally — never 4 scans."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("type_id"),
            F.round(F.sum("l_quantity"), 2).alias("q"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "type_id",
            "q",
            "n",
        )
    )


@query(
    "q_grouping_sets",
    oracle="""
    select o_orderstatus, o_orderpriority,
           cast(count(*) as bigint) as n,
           round(sum(o_totalprice), 2) as total,
           cast(grouping(o_orderstatus) as integer) as g_status,
           cast(grouping(o_orderpriority) as integer) as g_prio
    from orders
    group by grouping sets ((o_orderstatus), (o_orderpriority))
    """,
    tags=("agg",),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SAS: PROC MEANS TYPES statement picking
    specific _TYPE_ levels) — the third grouping-combination shape
    next to rollup/cube: two disjoint one-column sets in ONE
    aggregation pass over one scan, via Spark 4's native
    DataFrame.groupingSets API. grouping() flags disambiguate which
    set produced each row (a real NULL key vs a grouped-out column)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        )
    )


@query(
    "q_approx_percentile",
    oracle="""
    select l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) as p25,
           round(quantile_cont(l_quantity, 0.50), 6) as p50,
           round(quantile_cont(l_quantity, 0.75), 6) as p75,
           cast(1 as int) as within_1
    from lineitem
    group by l_returnflag
    """,
    tags=("agg", "approx", "scale"),
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles — the 100 TB twin of q_percentiles
    (mergeable, bounded memory; exact percentile buffers each group).

    Graduated from rows-only in round 6: the sketch's picks are
    engine-specific, so the driver-visible result carries the EXACT
    interpolated percentiles (oracle = quantile_cont, the established
    q_percentiles parity) plus ``within_1`` = "every sketch value is
    within 1.0 of its exact percentile", asserted constant-1 by the
    oracle. 1.0 is one unit of the integer l_quantity domain (1..50):
    the sketch guarantees rank error <= 1/accuracy = 1e-4, and a 1e-4
    rank slip moves the value by at most one domain step — so the
    hash comparison attests the sketch's rank-error contract at value
    resolution. Production callers use percentile_approx alone; this
    registered form is its accuracy harness."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", [0.25, 0.5, 0.75], 10_000).alias("approx_q"),
        F.expr("percentile(l_quantity, 0.25)").alias("e25"),
        F.expr("percentile(l_quantity, 0.50)").alias("e50"),
        F.expr("percentile(l_quantity, 0.75)").alias("e75"),
    )
    within = (
        (F.abs(F.element_at("approx_q", 1) - F.col("e25")) <= 1.0)
        & (F.abs(F.element_at("approx_q", 2) - F.col("e50")) <= 1.0)
        & (F.abs(F.element_at("approx_q", 3) - F.col("e75")) <= 1.0)
    )
    return agg.select(
        "l_returnflag",
        F.round("e25", 6).alias("p25"),
        F.round("e50", 6).alias("p50"),
        F.round("e75", 6).alias("p75"),
        within.cast("int").alias("within_1"),
    )


@query(
    "q_sample",
    oracle="""
    with h as (
        select o_orderkey, o_custkey, o_totalprice,
               list_reduce(
                 list_transform(range(1,16),
                   j -> strpos('0123456789abcdef',
                               substr(sha256('42:' || cast(o_orderkey as varchar)),
                                      j, 1)) - 1),
                 (a,x) -> a*16+x) % 1000 as bucket
        from orders
    )
    select o_orderkey, o_custkey, o_totalprice from h where bucket < 100
    """,
    tags=("scan", "sample"),
)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded 10% simple random sample (SAS: PROC SURVEYSELECT
    METHOD=SRS SEED=42). Membership is a pure function of
    (seed, o_orderkey) — sha256('42:'||key) bucketed per-mille, see
    operators/sampling.srs_sample — so the oracle reproduces the EXACT
    member rows (graduated from rows-only in round 6: Spark's native
    ``df.sample(fraction, seed)`` draws from a partition-dependent RNG
    stream no other engine can replay, which is also why it is the
    wrong primitive for a reproducible training pipeline). Sampling is
    a codegen filter at the scan: no shuffle, and the unsampled rest
    is never materialized."""
    from sas_etl_spark.operators.sampling import srs_sample

    orders = load_table(spark, sf_dir, "orders")
    return srs_sample(orders, "o_orderkey", 100, seed=42).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "q_split_hash",
    oracle="""
    with b as (
        select case
            when list_reduce(
                   list_transform(range(1,16),
                     j -> strpos('0123456789abcdef',
                                 substr(sha256(cast(doc_id as varchar)), j, 1)) - 1),
                   (a,x) -> a*16+x) % 100 < 80 then 'train'
            when list_reduce(
                   list_transform(range(1,16),
                     j -> strpos('0123456789abcdef',
                                 substr(sha256(cast(doc_id as varchar)), j, 1)) - 1),
                   (a,x) -> a*16+x) % 100 < 90 then 'valid'
            else 'test' end as split
        from documents
    )
    select split, cast(count(*) as bigint) as n from b group by split
    """,
    tags=("sample", "dedup"),
)
def q_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split by sha256 of the
    document key (SAS: PROC SURVEYSELECT with a hash stratifier; the
    training-pipeline replacement for seeded sampling). Unlike
    df.sample, assignment is a pure function of doc_id — stable across
    engines, runs, and repartitioning — so the DuckDB oracle recomputes
    the exact same membership (first 15 sha256 hex digits -> 60-bit
    int -> mod 100). Shuffle-free narrow op; verified here by split
    counts (membership itself is pinned by unit test)."""
    from sas_etl_spark.operators.sampling import deterministic_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        deterministic_split(docs, "doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_stratified_sample",
    oracle="""
    with h as (
        select o_orderkey, o_orderstatus, o_totalprice,
               list_reduce(
                 list_transform(range(1,16),
                   j -> strpos('0123456789abcdef',
                               substr(sha256(cast(o_orderkey as varchar)), j, 1)) - 1),
                 (a,x) -> a*16+x) % 1000 as bucket
        from orders
    )
    select o_orderkey, o_orderstatus, o_totalprice
    from h
    where bucket < case o_orderstatus
                   when 'O' then 50 when 'F' then 200 else 500 end
    """,
    tags=("sample",),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum rates (SAS: PROC
    SURVEYSELECT STRATA o_orderstatus / SAMPRATE= list): 5% of open
    orders, 20% of finished, 50% of in-progress — the unequal-rates
    shape every training-data curation pipeline uses to oversample
    scarce strata.

    Membership is a pure function of the row key (sha256 bucket in
    [0,1000), same engine-portable hash as q_split_hash), NOT a seeded
    RNG — so the sample is identical across engines, runs, cluster
    sizes, and repartitioning, and the oracle reproduces the exact
    member ROWS, not just counts. Shuffle-free: one codegen Project +
    filter at the scan."""
    from sas_etl_spark.operators.sampling import hash_bucket

    orders = load_table(spark, sf_dir, "orders")
    rate = (
        F.when(F.col("o_orderstatus") == "O", 50)
        .when(F.col("o_orderstatus") == "F", 200)
        .otherwise(500)
    )
    return orders.filter(hash_bucket("o_orderkey", 1000) < rate).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "q_pps_sample",
    oracle="""
    with h as (
        select o_orderkey, o_totalprice,
               least(1.0, o_totalprice / 300000) as p,
               list_reduce(
                 list_transform(range(1,16),
                   j -> strpos('0123456789abcdef',
                               substr(sha256('11:' || cast(o_orderkey as varchar)),
                                      j, 1)) - 1),
                 (a,x) -> a*16+x) % 1000000 as bucket
        from orders
    )
    select o_orderkey, o_totalprice,
           round(1.0 / p, 6) as ht_weight
    from h
    where bucket < p * 1000000
    """,
    tags=("sample", "scale"),
)
def q_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size (Poisson/importance) sampling
    with Horvitz-Thompson weights (SAS: PROC SURVEYSELECT METHOD=PPS;
    the quality-weighted document sampling every training-data
    curation pipeline uses to oversample high-value records):
    inclusion probability p = min(1, size/threshold), membership
    decided by the same seeded engine-portable hash as q_sample
    (per-mille bucket scaled to 1e6 resolution), and each kept row
    carries weight 1/p so any downstream weighted sum is an unbiased
    estimator of the population total (Horvitz-Thompson). Membership
    AND weights are exactly reproducible by the oracle — pure
    codegen filter at the scan, no shuffle, nothing materialized for
    the unsampled rest."""
    from sas_etl_spark.operators.sampling import hash_bucket

    orders = load_table(spark, sf_dir, "orders")
    p = F.least(F.lit(1.0), F.col("o_totalprice") / 300_000)
    return (
        orders.withColumn("p", p)
        .filter(hash_bucket("o_orderkey", 1_000_000, seed=11) < F.col("p") * 1_000_000)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.round(1.0 / F.col("p"), 6).alias("ht_weight"),
        )
    )


# -- SAS PCTLDEF 1-5 --------------------------------------------------


@query(
    "q_pctldef",
    oracle="""
    with ranked as (
        select o_orderpriority, o_totalprice as x,
               row_number() over (partition by o_orderpriority
                                  order by o_totalprice, o_orderkey) as rn
        from orders
    ),
    stats as (
        select o_orderpriority, max(rn) as n
        from ranked group by o_orderpriority
    ),
    pcts as (select * from (values (0.25), (0.5), (0.75)) t(p)),
    gp as (
        select s.o_orderpriority, s.n, p.p,
               cast(floor(s.n * p.p) as bigint) as j,
               s.n * p.p - floor(s.n * p.p) as g,
               cast(floor((s.n + 1) * p.p) as bigint) as j4,
               (s.n + 1) * p.p - floor((s.n + 1) * p.p) as g4
        from stats s cross join pcts p
    ),
    pos as (
        select *,
               greatest(least(j, n), 1) as lo,
               greatest(least(j + 1, n), 1) as hi,
               greatest(least(case when g = 0.5
                                   then (case when j % 2 = 0 then j
                                              else j + 1 end)
                                   else cast(floor(n * p + 0.5) as bigint)
                              end, n), 1) as i2,
               greatest(least(j4, n), 1) as lo4,
               greatest(least(j4 + 1, n), 1) as hi4
        from gp
    )
    select pos.o_orderpriority, pos.p,
           round((1 - g) * rlo.x + g * rhi.x, 4) as def1,
           round(ri.x, 4) as def2,
           round(case when g = 0 then rlo.x else rhi.x end, 4) as def3,
           round((1 - g4) * rlo4.x + g4 * rhi4.x, 4) as def4,
           round(case when g = 0 then (rlo.x + rhi.x) / 2.0
                      else rhi.x end, 4) as def5
    from pos
    join ranked rlo  on rlo.o_orderpriority = pos.o_orderpriority
                    and rlo.rn = pos.lo
    join ranked rhi  on rhi.o_orderpriority = pos.o_orderpriority
                    and rhi.rn = pos.hi
    join ranked ri   on ri.o_orderpriority = pos.o_orderpriority
                    and ri.rn = pos.i2
    join ranked rlo4 on rlo4.o_orderpriority = pos.o_orderpriority
                    and rlo4.rn = pos.lo4
    join ranked rhi4 on rhi4.o_orderpriority = pos.o_orderpriority
                    and rhi4.rn = pos.hi4
    """,
    tags=("agg", "stats", "sas-semantics"),
)
def q_pctldef(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL FIVE SAS percentile definitions (PROC UNIVARIATE / PROC
    MEANS ``PCTLDEF=1..5``) computed exactly, per group, for
    p in {.25, .5, .75} — the deep-parity surface a SAS migration
    actually hits, because PCTLDEF changes answers and audits compare
    them digit-for-digit.

    With n sorted values x(1..n), np = n*p, j = floor(np), g = np-j
    (per the public SAS 9.4 procedure documentation):
      - def1: (1-g)x(j) + g x(j+1)            (weighted average at np)
      - def2: x(i), i = floor(np+1/2); when g = 1/2 exactly, i = j if
              j even else j+1                  (closest observation)
      - def3: x(j) if g=0 else x(j+1)          (empirical CDF)
      - def4: like def1 but at (n+1)p          (weighted average at (n+1)p)
      - def5: (x(j)+x(j+1))/2 if g=0 else x(j+1)  (EDF with averaging;
              the SAS DEFAULT)
    Boundary cases (j=0, j>=n) are handled by clamping the FETCHED
    positions to [1, n], which reproduces SAS's x(0):=x(1) / y:=x(n)
    conventions. p values (1/4, 1/2, 3/4) are exact binary fractions,
    so j and g are engine-exact and every branch condition (g=0,
    g=1/2, parity of j) is deterministic on both engines.

    Scale (round-8 rework): the former form ranked every row with a
    window partitioned by the 5-value group key — one task sorting
    ~n/5 rows (29 s at sf10, linear with no parallelism to recruit).
    Order statistics now come from operators/quantiles.
    order_statistics_bucketed: sketch-guided range buckets, bucket
    prefix offsets, and a local row_number over ONLY the <=25 needed
    buckets — parallelism = groups x buckets and the sorted rows are
    (needed buckets) x (rows/bucket), not the corpus. The five
    per-definition lookups then join the resolved (group, position)
    -> x table instead of rescanning a ranked corpus five times.
    """
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    pcts = spark.createDataFrame([(0.25,), (0.5,), (0.75,)], "p double")
    n, p = F.col("n"), F.col("p")
    gp = stats.crossJoin(F.broadcast(pcts)).select(
        "o_orderpriority",
        "n",
        "p",
        F.floor(n * p).cast("long").alias("j"),
        (n * p - F.floor(n * p)).alias("g"),
        F.floor((n + 1) * p).cast("long").alias("j4"),
        ((n + 1) * p - F.floor((n + 1) * p)).alias("g4"),
    )
    j, g, j4 = F.col("j"), F.col("g"), F.col("j4")
    clamp = lambda c: F.greatest(F.least(c, n), F.lit(1).cast("long"))
    pos = gp.select(
        "o_orderpriority",
        "p",
        "g",
        "g4",
        clamp(j).alias("lo"),
        clamp(j + 1).alias("hi"),
        clamp(
            F.when(
                g == 0.5,
                F.when(j % 2 == 0, j).otherwise(j + 1),
            ).otherwise(F.floor(n * p + 0.5).cast("long"))
        ).alias("i2"),
        clamp(j4).alias("lo4"),
        clamp(j4 + 1).alias("hi4"),
    )

    # resolve the distinct needed positions ONCE via the bucketed
    # order-statistics operator, then five tiny (group, p) lookups
    # against the resolved table
    from sas_etl_spark.operators.quantiles import order_statistics_bucketed

    role_cols = ("lo", "hi", "i2", "lo4", "hi4")
    needed = None
    for rc in role_cols:
        part = pos.select("o_orderpriority", F.col(rc).alias("_pos"))
        needed = part if needed is None else needed.unionByName(part)
    resolved = order_statistics_bucketed(
        orders.select("o_orderpriority", "o_totalprice", "o_orderkey"),
        "o_orderpriority",
        "o_totalprice",
        "o_orderkey",
        needed.distinct(),
    )

    def lookup(pos_df: DataFrame, pos_col: str, out: str) -> DataFrame:
        return (
            pos_df.select(
                "o_orderpriority", "p", F.col(pos_col).alias("_pos")
            )
            .join(F.broadcast(resolved), ["o_orderpriority", "_pos"])
            .select(
                "o_orderpriority", "p", F.col("x").alias(out)
            )
        )

    x_lo = lookup(pos, "lo", "x_lo")
    x_hi = lookup(pos, "hi", "x_hi")
    x_i2 = lookup(pos, "i2", "x_i2")
    x_lo4 = lookup(pos, "lo4", "x_lo4")
    x_hi4 = lookup(pos, "hi4", "x_hi4")
    keys = ["o_orderpriority", "p"]
    assembled = (
        pos.select(*keys, "g", "g4")
        .join(x_lo, keys)
        .join(x_hi, keys)
        .join(x_i2, keys)
        .join(x_lo4, keys)
        .join(x_hi4, keys)
    )
    g_, g4_ = F.col("g"), F.col("g4")
    return assembled.select(
        "o_orderpriority",
        "p",
        F.round((1 - g_) * F.col("x_lo") + g_ * F.col("x_hi"), 4).alias(
            "def1"
        ),
        F.round("x_i2", 4).alias("def2"),
        F.round(
            F.when(g_ == 0, F.col("x_lo")).otherwise(F.col("x_hi")), 4
        ).alias("def3"),
        F.round(
            (1 - g4_) * F.col("x_lo4") + g4_ * F.col("x_hi4"), 4
        ).alias("def4"),
        F.round(
            F.when(g_ == 0, (F.col("x_lo") + F.col("x_hi")) / 2.0).otherwise(
                F.col("x_hi")
            ),
            4,
        ).alias("def5"),
    )


# -- k-fold cross-validation assignment ------------------------------

KFOLD_K = 5


@query(
    "q_kfold_assign",
    oracle=f"""
    with f as (
        select label,
               list_reduce(
                 list_transform(range(1, 9),
                   j -> strpos('0123456789abcdef',
                          substr(sha256(cast(vec_id as varchar)), j, 1)) - 1),
                 (a, x) -> a * 16 + x) % {KFOLD_K} as fold
        from embeddings
    )
    select cast(fold as bigint) as fold, label,
           cast(count(*) as bigint) as n
    from f group by fold, label
    """,
    tags=("sample", "llm"),
)
def q_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment with a label
    balance audit (ML prep: PROC SURVEYSELECT GROUPS= analog). Fold =
    sha256(id) mod k — the q_split_hash mechanism generalized from
    {{train,val,test}} to k folds: engine-portable, repartition- and
    insert-order-invariant, and stable under dataset growth (a row's
    fold never changes when other rows arrive).

    Output is the (fold, label) census — the audit that folds are
    size- and class-balanced BEFORE any training run consumes them.

    Scale: pure scan-side hash arithmetic + one tiny agg.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    fold = (
        F.conv(
            F.substring(F.sha2(F.col("vec_id").cast("string"), 256), 1, 8),
            16,
            10,
        ).cast("long")
        % KFOLD_K
    ).alias("fold")
    return (
        emb.select(fold, "label")
        .groupBy("fold", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# -- systematic sampling ---------------------------------------------

SYS_INTERVAL = 10
SYS_OFFSET = 3


@query(
    "q_systematic_sample",
    oracle=f"""
    with r as (
        select o_orderkey, o_custkey, round(o_totalprice, 2) as totalprice,
               row_number() over (order by o_orderkey) as rn
        from orders
    )
    select o_orderkey, o_custkey, totalprice
    from r where rn % {SYS_INTERVAL} = {SYS_OFFSET}
    """,
    tags=("sample",),
)
def q_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (every k-th) sampling over a deterministic frame
    order (SAS: PROC SURVEYSELECT METHOD=SYS with a fixed seed
    picking the start offset) — the third SURVEYSELECT method beside
    SRS (q_sample) and PPS (q_pps_sample).

    The ORACLE spells the textbook frame definition (global
    row_number over the key order, rank mod k). The Spark side spells
    the 100 TB form: because the frame key is DENSE (0..N-1, a fixture
    invariant pinned by tests), frame rank = o_orderkey + 1, so
    membership is the pure scan predicate (key+1) mod k = offset —
    ZERO shuffle, no global enumeration — and the oracle hash PROVES
    the two spellings pick identical rows. (Sparse keys at scale use a
    per-partition offset-carrying index instead; the membership
    contract — every k-th frame unit — is unchanged.)
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderkey") + 1) % SYS_INTERVAL == SYS_OFFSET
    ).select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("totalprice"),
    )


# -- deterministic per-group reservoir (bottom-k) --------------------

RESERVOIR_K = 5
RESERVOIR_SEED = 7
#: Two-level candidate cut: top 8 bits of the 60-bit hash -> 256
#: range buckets (the order_statistics_bucketed idea specialized to a
#: UNIFORM key, so the bucket histogram needs no sketch pass).
_RES_BUCKET_SHIFT = 52


@query(
    "q_reservoir_sample",
    oracle=f"""
    with h as (
        select doc_id, source,
               list_reduce(list_transform(range(1, 16),
                 j -> strpos('0123456789abcdef',
                             substr(sha256('{RESERVOIR_SEED}:'
                                           || cast(doc_id as varchar)),
                                    j, 1)) - 1),
               (a, x) -> a * 16 + x) as h60
        from documents
    ),
    rk as (
        select *, row_number() over (partition by source
                                     order by h60, doc_id) as rn
        from h
    )
    select source, doc_id, cast(rn as bigint) as sample_rank
    from rk where rn <= {RESERVOIR_K}
    """,
    tags=("sample", "llm"),
)
def q_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size uniform sample per group — exactly k documents from
    every source — as a DETERMINISTIC reservoir: rank rows by a seeded
    60-bit key hash and keep the bottom k per group (the classic
    bottom-k sketch; equivalent in distribution to reservoir sampling
    but a pure function of (seed, key), so membership is stable across
    engines, runs, and partitionings — PROC SURVEYSELECT N= per
    stratum, reproducibly). Completes the sampling family: SRS draws a
    RATE (q_sample), systematic an interval, PPS weights; this draws
    an exact COUNT per group.

    The ORACLE spells the textbook form (row_number over the hash per
    source). The Spark side spells the scale form — ranking every row
    with a window partitioned by ~20 sources serializes into 20 tasks
    sorting n/20 rows each, so instead:

      1. bucket each hash by its top 8 bits (uniform by construction,
         no sketch needed), aggregate the tiny per-(source, bucket)
         histogram (map-side combined),
      2. prefix-sum it to find each source's cutoff bucket — the
         first whose cumulative count reaches k (fallback: last
         bucket, for groups with < k rows),
      3. broadcast the 1-row-per-source cutoff, filter candidates at
         the scan (expected ~n/256 rows per source), and run the
         exact window over candidates only.

    The oracle hash PROVES the two spellings select identical rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    h60 = F.conv(
        F.substring(
            F.sha2(
                F.concat(
                    F.lit(f"{RESERVOIR_SEED}:"),
                    F.col("doc_id").cast("string"),
                ),
                256,
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    hashed = docs.select("doc_id", "source", h60.alias("h60"))
    bucketed = hashed.withColumn(
        "_bucket", F.shiftright("h60", _RES_BUCKET_SHIFT)
    )
    bhist = bucketed.groupBy("source", "_bucket").agg(
        F.count(F.lit(1)).alias("_c")
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cut = (
        bhist.select(
            "source", "_bucket", F.sum("_c").over(w_cum).alias("_cum")
        )
        .groupBy("source")
        .agg(
            F.coalesce(
                F.min(F.when(F.col("_cum") >= RESERVOIR_K, F.col("_bucket"))),
                F.max("_bucket"),
            ).alias("_cut")
        )
    )
    cand = bucketed.join(F.broadcast(cut), "source").filter(
        F.col("_bucket") <= F.col("_cut")
    )
    w_rank = Window.partitionBy("source").orderBy("h60", "doc_id")
    return (
        cand.withColumn("sample_rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("sample_rank") <= RESERVOIR_K)
        .select("source", "doc_id", "sample_rank")
    )


# -- domain-mixture resampling ---------------------------------------

#: Target mixture in per-mille by source tier (sums to 1000 across the
#: 20-source fixture: 5*100 + 5*50 + 10*25).
MIX_W_HIGH, MIX_W_MID, MIX_W_LOW = 100, 50, 25


@query(
    "q_domain_mixture",
    oracle=f"""
    with w as (
        select source, count(*) as n_avail,
               case when cast(substr(source, 4) as int) < 5
                        then {MIX_W_HIGH}
                    when cast(substr(source, 4) as int) < 10
                        then {MIX_W_MID}
                    else {MIX_W_LOW} end as w
        from documents group by source
    ),
    budget as (
        -- largest total T (in rows) such that every source can supply
        -- its share w/1000 * T from what it has: T = min n*1000/w.
        -- 128-bit (HUGEINT here, DECIMAL(38,0) on the Spark side) so
        -- the n*1000 / w*T*1e6 numerators survive 1e10+ row sources.
        select min(cast(n_avail as hugeint) * 1000 // w) as t from w
    ),
    rates as (
        select source, n_avail, w,
               least(1000000,
                     cast(w as hugeint) * t * 1000000
                         // (1000 * cast(n_avail as hugeint))) as rate_ppm
        from w cross join budget
    ),
    kept as (
        select d.source, count(*) as n_kept
        from documents d
        join rates r on r.source = d.source
        where list_reduce(
                list_transform(range(1,16),
                  j -> strpos('0123456789abcdef',
                              substr(sha256('7:' || cast(d.doc_id as varchar)),
                                     j, 1)) - 1),
                (a,x) -> a*16+x) % 1000000 < r.rate_ppm
        group by d.source
    )
    select r.source,
           cast(r.n_avail as bigint) as n_avail,
           cast(r.w as bigint) as target_w,
           cast(r.rate_ppm as bigint) as rate_ppm,
           cast(coalesce(k.n_kept, 0) as bigint) as n_kept
    from rates r left join kept k on k.source = r.source
    """,
    tags=("sample", "llm", "governance"),
)
def q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling — THE training-data mixing op: given
    per-source target weights (per-mille), downsample each source so
    the corpus hits the target mixture at the largest total the
    scarcest source allows (SAS: PROC SURVEYSELECT stratified with
    unequal rates; pipelines: the domain-weights stage of any
    pretraining mix).

    Everything is INTEGER arithmetic so both engines compute
    bit-identical keep thresholds: budget T = min over sources of
    floor(n*1000/w); per-source rate_ppm = floor(w*T*1e6/(1000*n)),
    capped at 1e6. Membership is then the seeded engine-portable
    sha256 per-MILLION bucket of doc_id (operators/sampling
    hash_bucket; same idiom q_sample attests per-mille) — so the
    oracle reproduces the exact kept-row set, not just expected
    counts. Output: per-source availability, weight, rate, and
    realized kept count.

    Scale: two O(sources) aggs (map-side combined count, then min),
    the rate table broadcasts back onto the scan, and membership is a
    codegen filter — the unkept rows are never materialized, and no
    shuffle moves more than O(sources) rows except the final kept
    count (map-side combined). Upsampling variants (scarce source,
    epochs = ceil(share/avail)) reuse the same rate table with a
    repeat factor instead of a filter.
    """
    from sas_etl_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    idx = F.substring("source", 4, 10).cast("int")
    w = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_avail"))
        .withColumn(
            "w",
            F.when(idx < 5, F.lit(MIX_W_HIGH))
            .when(idx < 10, F.lit(MIX_W_MID))
            .otherwise(F.lit(MIX_W_LOW)),
        )
    )
    # TRUE integer division (not float+floor), in 128-bit: Spark
    # DECIMAL(38,0) DIV here, HUGEINT in the oracle — both are int128
    # arithmetic, bit-identical, and the w*T*1e6 ~ corpus_rows*1e9
    # numerator stays exact past 1e10-row sources (where BIGINT would
    # wrap at ~9e9). Pinned at synthetic 2e10-row counts by
    # tests/test_llm_operators.py::test_mixture_arithmetic_1e10_rows.
    # r16: budget T as a single-partition window MIN over the 20-row
    # aggregate instead of a second aggregation subtree cross-joined
    # back — halves the documents scans (see q_mixture_apply). The
    # min's operand is staged as an aggregate-side column so
    # CollapseProject folds it into the HashAggregate and the window's
    # SinglePartition exchange keeps a constant-state child (the
    # plans/audit.py benign shape).
    rates = w.withColumn(
        "_tgt", F.expr("cast(n_avail as decimal(38,0)) * 1000 div w")
    ).withColumn(
        "t", F.min("_tgt").over(Window.partitionBy())
    ).select(
        "source",
        "n_avail",
        "w",
        F.least(
            F.lit(1_000_000).cast("long"),
            F.expr(
                "cast(w as decimal(38,0)) * t * 1000000"
                " div (1000 * cast(n_avail as decimal(38,0)))"
            ),
        )
        .cast("long")
        .alias("rate_ppm"),
    )
    # r16 (guide §2.4): membership becomes a conditional SUM inside
    # the per-source aggregation (rate columns ride the broadcast join
    # as grouping keys — functionally dependent on source, groups
    # unchanged) instead of filter + count + left-join-back-to-rates;
    # the old tail re-evaluated the rates subtree (a second documents
    # scan) and joined two 20-row sides. Every source emits a row even
    # at n_kept = 0 because its docs reach the aggregate unfiltered —
    # the same zero-row contract the left join provided.
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source", "n_avail", "w", "rate_ppm")
        .agg(
            F.sum(
                F.when(
                    hash_bucket("doc_id", 1_000_000, seed=7)
                    < F.col("rate_ppm"),
                    1,
                ).otherwise(0)
            ).alias("n_kept")
        )
        .select(
            "source",
            F.col("n_avail").cast("long").alias("n_avail"),
            F.col("w").cast("long").alias("target_w"),
            "rate_ppm",
            F.col("n_kept").cast("long").alias("n_kept"),
        )
    )


# -- temperature-scaled mixture (alpha = 0.5) ------------------------

#: isqrt precision scale: w = floor(sqrt(n * 1e6)) = floor(1000*sqrt(n))
#: keeps ~3 significant sub-integer digits of the square root.
_TEMP_SCALE = 1_000_000

#: Engine-portable EXACT integer square root of a BIGINT expression:
#: the double sqrt is only a seed (correctly rounded, but fed the
#: ROUNDED double of x once x > 2^53), so the +-1 adjustment re-decides
#: the floor against exact integer squares. Valid while (r+1)^2 fits
#: BIGINT — x up to ~4e18, i.e. sources up to ~4e12 rows at this scale.
def _isqrt_sql(x: str) -> str:
    """floor(sqrt(x)) as portable SQL text (same text runs on Spark and
    DuckDB): seed from the double sqrt, then correct the boundary."""
    seed = f"cast(floor(sqrt(cast(({x}) as double))) as bigint)"
    return (
        f"(case when ({seed} + 1) * ({seed} + 1) <= ({x}) then {seed} + 1 "
        f"when {seed} * {seed} <= ({x}) then {seed} "
        f"else {seed} - 1 end)"
    )


@query(
    "q_temperature_mixture",
    oracle=f"""
    with w as (
        select source, count(*) as n_avail,
               {_isqrt_sql(f"count(*) * {_TEMP_SCALE}")} as w_sqrt
        from documents group by source
    ),
    tot as (select sum(cast(w_sqrt as hugeint)) as sw from w),
    budget as (
        select min(cast(n_avail as hugeint) * sw // w_sqrt) as t
        from w cross join tot
    ),
    rates as (
        select source, n_avail, w_sqrt,
               least(1000000,
                     cast(w_sqrt as hugeint) * t * 1000000
                         // (sw * cast(n_avail as hugeint))) as rate_ppm
        from w cross join tot cross join budget
    ),
    kept as (
        select d.source, count(*) as n_kept
        from documents d
        join rates r on r.source = d.source
        where list_reduce(
                list_transform(range(1,16),
                  j -> strpos('0123456789abcdef',
                              substr(sha256('19:' || cast(d.doc_id as varchar)),
                                     j, 1)) - 1),
                (a,x) -> a*16+x) % 1000000 < r.rate_ppm
        group by d.source
    )
    select r.source,
           cast(r.n_avail as bigint) as n_avail,
           cast(r.w_sqrt as bigint) as w_sqrt,
           cast(r.rate_ppm as bigint) as rate_ppm,
           cast(coalesce(k.n_kept, 0) as bigint) as n_kept
    from rates r left join kept k on k.source = r.source
    """,
    tags=("sample", "llm", "governance"),
)
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling at alpha = 1/2 — the
    smoothed domain-balancing rule of multilingual pretraining (mBERT
    / XLM-R exponentiated-share sampling; T5's temperature mixing):
    target share of source s is n_s^alpha / sum n^alpha, flattening
    head sources and boosting tails without q_domain_mixture's
    hand-set weight table.

    alpha = 1/2 keeps the arithmetic ENGINE-EXACT where general
    pow() would drift (libm pow is not correctly rounded; sqrt is):
    w_s = isqrt(n_s * 1e6) — an exact integer square root whose
    double-sqrt seed is boundary-corrected against exact integer
    squares (valid to ~4e12-row sources), so both engines derive
    bit-identical weights even past 2^53 where the double itself
    rounds. Budget and rates then follow the q_domain_mixture int128
    protocol: T = min_s floor(n_s * W / w_s) (W = sum of weights),
    rate_ppm = floor(w_s * T * 1e6 / (W * n_s)) capped at 1e6,
    membership = seeded sha256 per-million bucket (seed 19 — a fresh
    independent draw: 7 is q_domain_mixture's rate draw and 11/13 are
    the mixture-apply residual/hash seeds, so no other registered op
    shares this key+modulus+seed triple). Oracle reproduces the exact
    kept-row multiset.

    Scale: identical to q_domain_mixture — two O(sources) aggs, a
    broadcast rate table, a codegen membership filter, and one
    map-side-combined kept count. HUGEINT / DECIMAL(38,0) keeps
    n_s * W ~ 1e10 * 2e9 = 2e19 exact past the BIGINT wrap.
    """
    from sas_etl_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_avail"))
        .withColumn(
            "w_sqrt", F.expr(_isqrt_sql(f"n_avail * {_TEMP_SCALE}"))
        )
    )
    # r16: weight total and budget as chained single-partition windows
    # over the 20-row aggregate instead of two extra aggregation
    # subtrees cross-joined back — the old shape re-computed the w
    # subtree once per use (4 documents scans before the kept pass);
    # this one scans documents twice in total (see q_mixture_apply).
    rates = (
        w.withColumn("_wsd", F.col("w_sqrt").cast("decimal(38,0)"))
        .withColumn("sw", F.sum("_wsd").over(Window.partitionBy()))
        .withColumn(
            "t",
            F.min(
                F.expr("cast(n_avail as decimal(38,0)) * sw div w_sqrt")
            ).over(Window.partitionBy()),
        )
        .select(
            "source",
            "n_avail",
            "w_sqrt",
            F.least(
                F.lit(1_000_000).cast("long"),
                F.expr(
                    "cast(w_sqrt as decimal(38,0)) * t * 1000000"
                    " div (sw * cast(n_avail as decimal(38,0)))"
                ).cast("long"),
            ).alias("rate_ppm"),
        )
    )
    # r16: conditional-sum membership inside the per-source agg, rate
    # columns as grouping keys — no filter/count/left-join tail, no
    # second documents scan (see q_domain_mixture).
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source", "n_avail", "w_sqrt", "rate_ppm")
        .agg(
            F.sum(
                F.when(
                    hash_bucket("doc_id", 1_000_000, seed=19)
                    < F.col("rate_ppm"),
                    1,
                ).otherwise(0)
            ).alias("n_kept")
        )
        .select(
            "source",
            F.col("n_avail").cast("long").alias("n_avail"),
            F.col("w_sqrt").cast("long").alias("w_sqrt"),
            "rate_ppm",
            F.col("n_kept").cast("long").alias("n_kept"),
        )
    )


#: Epoch-planning total budget: 2x the corpus (typical multi-epoch
#: pretraining mix — scarce overweighted sources repeat).
MIX_BUDGET_X = 2


@query(
    "q_mixture_epochs",
    oracle=f"""
    with w as (
        select source, count(*) as n_avail,
               case when cast(substr(source, 4) as int) < 5
                        then {MIX_W_HIGH}
                    when cast(substr(source, 4) as int) < 10
                        then {MIX_W_MID}
                    else {MIX_W_LOW} end as w
        from documents group by source
    ),
    tot as (select sum(n_avail) * {MIX_BUDGET_X} as t_total from w),
    plan as (
        -- HUGEINT (int128, = Spark's DECIMAL(38,0) DIV): w*t_total and
        -- remainder*1e6 survive 1e10+ row sources where BIGINT wraps
        select source, n_avail, w,
               cast(w as hugeint) * t_total // 1000 as target_rows
        from w cross join tot
    )
    select source,
           cast(n_avail as bigint) as n_avail,
           cast(w as bigint) as target_w,
           cast(target_rows as bigint) as target_rows,
           cast(target_rows // n_avail as bigint) as full_epochs,
           cast(cast(target_rows % n_avail as hugeint) * 1000000 // n_avail
                as bigint) as residual_ppm
    from plan
    """,
    tags=("sample", "llm", "governance"),
)
def q_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-weighted mixture planning — the UPSAMPLING side of domain
    mixing (q_domain_mixture downsamples to the scarcest source; real
    pretraining recipes instead fix a token budget and let scarce
    overweighted domains REPEAT): per source, how many full epochs plus
    what residual sampling rate hits target_rows = w/1000 x budget,
    budget = {MIX_BUDGET_X}x corpus.

    Pure integer arithmetic end to end (BIGINT div/mod, identical on
    both engines): full_epochs = target div avail; the remainder
    becomes a per-million residual rate for the final partial epoch —
    executable directly against q_domain_mixture's seeded-hash
    membership machinery (epochs e: union e full copies + hash-filter
    at residual_ppm). High-weight sources here get 4 epochs
    (100/1000 x 2x x 20 sources), low-weight ones a 1/2 epoch.

    Scale: one map-side-combined count per source, one 1-row total
    broadcast, O(sources) output — the plan itself never touches row
    data, so it costs the same at 100 TB as at test SF; the execution
    stage it parameterizes is scan-side filtering/unioning only.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    idx = F.substring("source", 4, 10).cast("int")
    w = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_avail"))
        .withColumn(
            "w",
            F.when(idx < 5, F.lit(MIX_W_HIGH))
            .when(idx < 10, F.lit(MIX_W_MID))
            .otherwise(F.lit(MIX_W_LOW)),
        )
    )
    # r16: corpus total as a single-partition window over the 20-row
    # aggregate instead of a second aggregation subtree cross-joined
    # back — halves the documents scans (see q_mixture_apply).
    return (
        w.withColumn(
            "t_total", F.sum("n_avail").over(Window.partitionBy()) * MIX_BUDGET_X
        )
        # DECIMAL(38,0) DIV = int128 floor division, the oracle's
        # HUGEINT twin — exact past 1e10-row sources (BIGINT wraps at
        # ~9e9); pinned by test_mixture_arithmetic_1e10_rows.
        .withColumn(
            "target_rows",
            F.expr("cast(w as decimal(38,0)) * t_total div 1000"),
        )
        .select(
            "source",
            F.col("n_avail").cast("long").alias("n_avail"),
            F.col("w").cast("long").alias("target_w"),
            F.col("target_rows").cast("long").alias("target_rows"),
            F.expr("target_rows div n_avail").cast("long").alias("full_epochs"),
            F.expr(
                "cast(target_rows % n_avail as decimal(38,0))"
                " * 1000000 div n_avail"
            )
            .cast("long")
            .alias("residual_ppm"),
        )
    )


#: Seeds for the mixture-apply membership and content hashes. Distinct
#: from every other registered seed so the drawn residual sets are
#: independent of the other sampling queries.
MIX_RESID_SEED, MIX_HASH_SEED = 11, 13

#: Extra rows added to q_mixture_apply's budget. The fixture's sources
#: are uniform (n_avail identical), so the plain 2x budget divides
#: evenly and every residual_ppm would be 0 — the partial-epoch
#: hash-filter path would go unattested. +137 makes every tier's
#: target non-divisible: all 20 sources get a real residual rate.
MIX_APPLY_EXTRA = 137

#: sha256-fold idioms the DuckDB oracle uses to reproduce Spark's
#: operators/sampling.hash_bucket bit-for-bit (first 15 hex digits ->
#: int -> mod): seeded residual-membership bucket on doc_id, and the
#: per-(doc_id, epoch) content-hash bucket. 1e8 content buckets keep
#: the per-source SUM far inside BIGINT even at 1e10x4-epoch sources.
_SQL_RESID_BUCKET = f"""list_reduce(list_transform(range(1,16),
            j -> strpos('0123456789abcdef',
                        substr(sha256('{MIX_RESID_SEED}:'
                                      || cast(d.doc_id as varchar)),
                               j, 1)) - 1),
          (a,x) -> a*16+x) % 1000000"""
_SQL_EPOCH_HASH = f"""list_reduce(list_transform(range(1,16),
                j -> strpos('0123456789abcdef',
                            substr(sha256('{MIX_HASH_SEED}:'
                                          || cast(doc_id as varchar)
                                          || '#' || cast(e as varchar)),
                                   j, 1)) - 1),
              (a,x) -> a*16+x) % 100000000"""


@query(
    "q_mixture_apply",
    oracle=f"""
    with w as (
        select source, count(*) as n_avail,
               case when cast(substr(source, 4) as int) < 5
                        then {MIX_W_HIGH}
                    when cast(substr(source, 4) as int) < 10
                        then {MIX_W_MID}
                    else {MIX_W_LOW} end as w
        from documents group by source
    ),
    tot as (select sum(n_avail) * {MIX_BUDGET_X} + {MIX_APPLY_EXTRA}
                as t_total from w),
    plan as (
        select source, n_avail,
               cast(w as hugeint) * t_total // 1000 as target_rows
        from w cross join tot
    ),
    plan2 as (
        select source, n_avail,
               target_rows // n_avail as full_epochs,
               cast(target_rows % n_avail as hugeint) * 1000000 // n_avail
                   as residual_ppm
        from plan
    ),
    perdoc as (
        select d.source, p.n_avail, p.full_epochs, p.residual_ppm,
               cast(p.full_epochs
                 + (case when {_SQL_RESID_BUCKET} < p.residual_ppm
                         then 1 else 0 end) as bigint) as copies,
               d.doc_id
        from documents d join plan2 p on p.source = d.source
    ),
    exploded as (
        select source, n_avail, full_epochs, residual_ppm, copies,
               coalesce(list_sum(list_transform(range(1, copies + 1),
                   e -> {_SQL_EPOCH_HASH})), 0) as doc_hash
        from perdoc
    )
    select source,
           cast(n_avail as bigint) as n_avail,
           cast(full_epochs as bigint) as full_epochs,
           cast(residual_ppm as bigint) as residual_ppm,
           cast(sum(copies) as bigint) as n_rows,
           cast(case when full_epochs >= 1 then n_avail
                     else sum(case when copies > full_epochs then 1
                              else 0 end) end as bigint) as n_docs,
           cast(sum(doc_hash) as bigint) as content_hash
    from exploded
    group by source, n_avail, full_epochs, residual_ppm
    """,
    tags=("sample", "llm", "governance", "bench_llm"),
)
def q_mixture_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE the epoch-weighted mixture plan — materialize
    q_mixture_epochs' (full_epochs, residual_ppm) per-source recipe as
    the actual upsampled row multiset: every document repeats
    full_epochs times, plus one extra copy when its seeded hash falls
    under the residual rate (the final partial epoch). This closes the
    plan->corpus gap: q_mixture_epochs proves the arithmetic,
    q_mixture_apply proves the produced ROWS. The budget here is
    2x corpus + MIX_APPLY_EXTRA: the fixture's sources are uniform, so
    the plain 2x budget divides evenly and the residual path would
    never fire — the offset forces a nonzero residual_ppm on every
    tier, putting the partial-epoch hash filter inside the hash.

    The oracle reproduces the exact kept/repeated multiset, not just
    expected counts: membership is the engine-portable seeded sha256
    per-million bucket (operators/sampling.hash_bucket), and
    ``content_hash`` sums a per-(doc_id, epoch) sha bucket over every
    emitted copy — any row gained, lost, or shifted between epochs
    flips the hash. ``n_rows`` = full_epochs*n_avail + residual kept;
    ``n_docs`` (distinct documents represented) uses the closed form
    [full_epochs>=1 -> n_avail, else residual-kept count] instead of a
    count(distinct) so no doc-keyed expand enters the plan.

    Scale: the plan stage is O(sources) aggs; execution is a broadcast
    of the O(sources) rate table back onto the scan, a codegen
    ``copies`` expression, and explode(sequence(1, copies)) AT THE
    SCAN — unkept rows never materialize, repeats never shuffle as
    payload. The only exchange is the final groupBy(source) of
    map-side-combined partials. Epoch count is data-independent
    (bounded by max weight), so the explode fan-out is a constant
    factor, not a skew risk. 128-bit plan arithmetic (DECIMAL(38,0)
    div / HUGEINT) survives 1e10-row sources — pinned by
    test_mixture_arithmetic_1e10_rows."""
    from sas_etl_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    idx = F.substring("source", 4, 10).cast("int")
    w = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_avail"))
        .withColumn(
            "w",
            F.when(idx < 5, F.lit(MIX_W_HIGH))
            .when(idx < 10, F.lit(MIX_W_MID))
            .otherwise(F.lit(MIX_W_LOW)),
        )
    )
    # r16 (guide §2.4): the corpus total is a WINDOW over the 20-row
    # per-source aggregate instead of a second aggregation subtree
    # cross-joined back — the old shape re-computed the w subtree
    # (scan + groupBy) once per use, so the full query paid FIVE
    # documents scans; this one pays two (w + the exploded pass). The
    # single-partition window is bounded by the source count, the
    # same O(sources) guarantee as the broadcast it replaces.
    plan = (
        w.withColumn(
            "t_total",
            F.sum("n_avail").over(Window.partitionBy()) * MIX_BUDGET_X
            + MIX_APPLY_EXTRA,
        )
        .withColumn(
            "target_rows",
            F.expr("cast(w as decimal(38,0)) * t_total div 1000"),
        )
        .select(
            "source",
            "n_avail",
            F.expr("target_rows div n_avail").alias("full_epochs"),
            F.expr(
                "cast(target_rows % n_avail as decimal(38,0))"
                " * 1000000 div n_avail"
            ).alias("residual_ppm"),
        )
    )
    resid = hash_bucket("doc_id", 1_000_000, seed=MIX_RESID_SEED)
    copies = F.col("full_epochs") + F.when(
        resid < F.col("residual_ppm"), F.lit(1)
    ).otherwise(F.lit(0))
    # r16 (guide §2.4): explode_OUTER keeps zero-copy docs as one
    # e=NULL row, so every source flows through the aggregation and
    # the old plan-LEFT-JOIN-counts tail (which re-evaluated the plan
    # subtree — a third documents scan — and sort-merge-joined two
    # 20-row sides) is gone entirely: the plan columns ride the
    # broadcast join and become grouping keys (functionally dependent
    # on source, so the groups are unchanged). NULL e contributes to
    # no aggregate: count("e") skips it, the resid flag's otherwise(0)
    # covers it, and h is NULL through the concat.
    exploded = (
        docs.join(F.broadcast(plan), "source")
        .withColumn("copies", copies)
        .withColumn(
            "e",
            F.explode_outer(
                F.when(
                    F.col("copies") >= 1,
                    F.sequence(F.lit(1), F.col("copies")),
                )
            ),
        )
        .withColumn(
            "h",
            hash_bucket(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("#"),
                    F.col("e").cast("string"),
                ),
                100_000_000,
                seed=MIX_HASH_SEED,
            ),
        )
    )
    # A source whose every document draws 0 copies still emits a
    # zeroed row (its docs arrive with e=NULL), exactly as the
    # oracle's unfiltered perdoc grouping does. Unreachable at the
    # current 2x+extra budget (full_epochs >= 1 everywhere) but keeps
    # the two engines aligned if budget or weights shrink.
    return (
        exploded.groupBy("source", "n_avail", "full_epochs", "residual_ppm")
        .agg(
            F.count("e").alias("n_rows"),
            F.sum(
                F.when(F.col("e") == F.col("full_epochs") + 1, 1).otherwise(0)
            ).alias("_n_resid"),
            F.sum("h").alias("content_hash"),
        )
        .select(
            "source",
            F.col("n_avail").cast("long").alias("n_avail"),
            F.col("full_epochs").cast("long").alias("full_epochs"),
            F.col("residual_ppm").cast("long").alias("residual_ppm"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.when(F.col("full_epochs") >= 1, F.col("n_avail"))
            .otherwise(F.coalesce("_n_resid", F.lit(0)))
            .cast("long")
            .alias("n_docs"),
            F.coalesce("content_hash", F.lit(0)).cast("long").alias(
                "content_hash"
            ),
        )
    )


#: Seed for the epoch-shuffle ordering keys (distinct from every other
#: registered seed) and the key space (uniform in [0, 1e15): ties are
#: astronomically rare and broken deterministically anyway).
MIX_SHUFFLE_SEED, MIX_SHUFFLE_SPACE = 17, 10**15


@query(
    "q_epoch_shuffle",
    oracle=f"""
    with w as (
        select source, count(*) as n_avail,
               case when cast(substr(source, 4) as int) < 5
                        then {MIX_W_HIGH}
                    when cast(substr(source, 4) as int) < 10
                        then {MIX_W_MID}
                    else {MIX_W_LOW} end as w
        from documents group by source
    ),
    tot as (select sum(n_avail) * {MIX_BUDGET_X} + {MIX_APPLY_EXTRA}
                as t_total from w),
    plan2 as (
        select source, n_avail,
               tgt // n_avail as full_epochs,
               cast(tgt % n_avail as hugeint) * 1000000 // n_avail
                   as residual_ppm
        from (select source, n_avail,
                     cast(w as hugeint) * t_total // 1000 as tgt
              from w cross join tot)
    ),
    perdoc as (
        select d.doc_id,
               cast(p.full_epochs
                 + (case when {_SQL_RESID_BUCKET} < p.residual_ppm
                         then 1 else 0 end) as bigint) as copies
        from documents d join plan2 p on p.source = d.source
    ),
    multiset as (
        select doc_id, unnest(range(1, copies + 1)) as e
        from perdoc where copies >= 1
    ),
    keyed as (
        select e, doc_id,
               list_reduce(list_transform(range(1,16),
                   j -> strpos('0123456789abcdef',
                               substr(sha256('{MIX_SHUFFLE_SEED}:'
                                             || cast(doc_id as varchar)
                                             || '#' || cast(e as varchar)),
                                      j, 1)) - 1),
                 (a,x) -> a*16+x) % {MIX_SHUFFLE_SPACE} as k
        from multiset
    ),
    head as (
        select string_agg(cast(e as varchar) || ':'
                          || cast(doc_id as varchar), ','
                          order by k, e, doc_id) as head10
        from (select * from keyed order by k, e, doc_id limit 10)
    )
    select cast(e as bigint) as epoch,
           cast(count(*) as bigint) as n_rows,
           cast(min(k) as bigint) as key_min,
           cast(max(k) as bigint) as key_max,
           cast(sum(k % 1000003) as bigint) as key_modsum,
           head10
    from keyed cross join head
    group by e, head10
    """,
    tags=("sample", "llm", "scale"),
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle of the mixed corpus — the
    third leg of the mixture lane (q_mixture_epochs PLANS the mix,
    q_mixture_apply MATERIALIZES the multiset, this op ORDERS it for
    training): every (doc, epoch) copy gets a pseudo-random sort key
    = seeded sha256 of (doc_id, epoch) in [0, 1e15), so the data
    order is a pure function of (seed, content) — identical across
    engines, runs, cluster sizes, and repartitionings. Spark's own
    rand()/shuffle would be partition-dependent and unreplayable: the
    same reason srs_sample exists.

    Attestation covers the ORDER-DEFINING material end to end: the
    global head-10 of the permutation in key order (TakeOrdered, the
    actual start of epoch-interleaved training), and per-epoch key
    count/min/max/modular-sum — any key gained, lost, or changed
    flips a column, and the full permutation is derivable from the
    keys by construction. key_modsum folds each key mod 1000003
    before summing, exact to ~9e12 rows per epoch in BIGINT.

    Scale: keys are one codegen projection over q_mixture_apply's
    scan-side explode (no extra pass); the per-epoch stats are one
    map-side-combined groupBy over <= max-epoch groups; the head is
    TakeOrderedAndProject. The production WRITER materializes the
    order without any global rank:
    ``repartitionByRange(key).sortWithinPartitions(key)`` writes
    range-partitioned files whose concatenation IS the permutation —
    positions never exist as data, so nothing here is corpus-global
    except the 10-row head."""
    from sas_etl_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    idx = F.substring("source", 4, 10).cast("int")
    w = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_avail"))
        .withColumn(
            "w",
            F.when(idx < 5, F.lit(MIX_W_HIGH))
            .when(idx < 10, F.lit(MIX_W_MID))
            .otherwise(F.lit(MIX_W_LOW)),
        )
    )
    tot = w.agg(
        (F.sum("n_avail") * MIX_BUDGET_X + MIX_APPLY_EXTRA).alias("t_total")
    )
    plan = (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "target_rows",
            F.expr("cast(w as decimal(38,0)) * t_total div 1000"),
        )
        .select(
            "source",
            F.expr("target_rows div n_avail").alias("full_epochs"),
            F.expr(
                "cast(target_rows % n_avail as decimal(38,0))"
                " * 1000000 div n_avail"
            ).alias("residual_ppm"),
        )
    )
    resid = hash_bucket("doc_id", 1_000_000, seed=MIX_RESID_SEED)
    copies = F.col("full_epochs") + F.when(
        resid < F.col("residual_ppm"), F.lit(1)
    ).otherwise(F.lit(0))
    keyed = (
        docs.join(F.broadcast(plan), "source")
        .withColumn("copies", copies)
        .filter(F.col("copies") >= 1)
        .withColumn("e", F.explode(F.sequence(F.lit(1), F.col("copies"))))
        .select(
            "e",
            "doc_id",
            hash_bucket(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("#"),
                    F.col("e").cast("string"),
                ),
                MIX_SHUFFLE_SPACE,
                seed=MIX_SHUFFLE_SEED,
            ).alias("k"),
        )
    )
    head = (
        keyed.orderBy(F.asc("k"), F.asc("e"), F.asc("doc_id"))
        .limit(10)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("k", "e", "doc_id"))
                    ),
                    lambda s: F.concat(
                        s["e"].cast("string"),
                        F.lit(":"),
                        s["doc_id"].cast("string"),
                    ),
                ),
                ",",
            ).alias("head10")
        )
    )
    return (
        keyed.groupBy("e")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("k").alias("key_min"),
            F.max("k").alias("key_max"),
            F.sum(F.col("k") % 1000003).alias("key_modsum"),
        )
        .crossJoin(F.broadcast(head))
        .select(
            F.col("e").cast("long").alias("epoch"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("key_min").cast("long").alias("key_min"),
            F.col("key_max").cast("long").alias("key_max"),
            F.col("key_modsum").cast("long").alias("key_modsum"),
            "head10",
        )
    )
