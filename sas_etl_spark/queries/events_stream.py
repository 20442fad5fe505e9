"""Event-stream queries verified in batch (SURVEY.md §2.10).

The reference class is batch-only; the `events` table is a bounded
stream stand-in. These queries are written against expressions whose
streaming twins (F.window / F.session_window + withWatermark) are
built in sas_etl_spark.streaming — same grouping semantics, verified
here against the batch oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.registry import query


@query(
    "q_tumbling_counts",
    oracle="""
    select time_bucket(interval 6 hour, ts) as bucket,
           event_type,
           count(*) as n,
           round(sum(value), 2) as total_value
    from events
    group by 1, 2
    """,
    tags=("events", "streaming"),
)
def q_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour window counts per event type (streaming:
    groupBy(F.window(ts, '6 hours')) — same bucketing, batch-verified).
    SURVEY.md §2.10.

    F.window and DuckDB time_bucket both align buckets to the epoch
    (session tz pinned UTC), so bucket starts agree exactly.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "total_value")
    )


#: Sliding-window counts oracle, shared by the batch
#: (q_sliding_window) and streaming (q_stream_sliding) twins.
SLIDING_ORACLE = """
    with buckets as (
        select distinct time_bucket(interval 3 hour, ts) as b from events
    ),
    starts as (
        select distinct wstart from (
            select b as wstart from buckets
            union all
            select b - interval 3 hour as wstart from buckets
        )
    )
    select s.wstart, count(*) as n
    from starts s
    join events e on e.ts >= s.wstart and e.ts < s.wstart + interval 6 hour
    group by s.wstart
    """


@query(
    "q_sliding_window",
    oracle=SLIDING_ORACLE,
    tags=("events", "streaming"),
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (6h length, 3h slide) event counts — streaming
    twin: F.window(ts, '6 hours', '3 hours'). SURVEY.md §2.10.

    Spark assigns each row to its length/slide = 2 covering windows
    directly (an internal explode — no self-join). The oracle
    reconstructs identical semantics: every emitted window start is an
    observed 3h bucket or that bucket minus 3h, counted over
    [wstart, wstart+6h). Each such window is provably non-empty, and
    Spark emits exactly that start set — so the inner join loses
    nothing.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "6 hours", "3 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("wstart"), "n")
    )


#: Gaps-and-islands sessions oracle, shared by the batch
#: (q_session_window) and streaming (q_stream_session) twins.
SESSIONS_ORACLE = """
    with flags as (
        select user_id, ts, event_id,
               case when lag(ts) over (partition by user_id order by ts, event_id) is null
                         or ts - lag(ts) over (partition by user_id order by ts, event_id)
                            > interval 30 minute
                    then 1 else 0 end as f
        from events
    ),
    islands as (
        select user_id, ts,
               sum(f) over (partition by user_id order by ts, event_id
                            rows between unbounded preceding and current row) as sid
        from flags
    )
    select user_id, min(ts) as session_start, count(*) as n_events
    from islands
    group by user_id, sid
    """


@query(
    "q_session_window",
    oracle=SESSIONS_ORACLE,
    tags=("events", "streaming"),
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session aggregation via F.session_window in BATCH mode
    (SURVEY.md §2.10) — the same gap-merged session operator the
    streaming path uses, oracle-checked against the classic
    gaps-and-islands SQL formulation. Session start = first event;
    n_events per session. (session_window's end = last event + gap is
    a Spark-specific convention, so the comparison pins start+count.)
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("sw.start").alias("session_start"), "n_events"
        )
    )


@query(
    "q_gap_fill",
    oracle="""
    with daily as (
        select user_id, date_trunc('day', ts) as day,
               round(sum(value), 2) as v
        from events group by 1, 2
    ), span as (
        select user_id, min(day) as d0, max(day) as d1 from daily group by 1
    ), cal as (
        select user_id, unnest(generate_series(d0, d1, interval 1 day)) as day
        from span
    )
    select c.user_id, c.day,
           last_value(d.v ignore nulls) over (
               partition by c.user_id order by c.day
               rows between unbounded preceding and current row) as value,
           d.v is null as is_gap
    from cal c left join daily d using (user_id, day)
    """,
    tags=("events", "window"),
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densify + LOCF forward fill (SAS: PROC EXPAND
    METHOD=STEP / the classic RETAIN carry-forward DATA step; PROC
    TIMESERIES gap handling): per-user daily totals, with missing
    calendar days materialized and filled from the last observed day.

    Spark shape: groupBy day -> per-user span agg -> sequence()/
    explode calendar (rows generated engine-side, never collected) ->
    left join back -> last(ignorenulls) over a user-partitioned
    running frame. Every stage is keyed by user_id, so at 100 TB the
    shuffles are even hash exchanges and the window never sees a
    global sort; the calendar explode emits ~days-per-user rows per
    user, not a cross join.

    The first calendar day per user always has data (span starts at
    min observed day) so no leading-null branch is needed; is_gap
    marks filled rows. Daily sums round to 2dp on both engines before
    the fill copies them (registry float rule).
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    cal = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cal.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.last("v", ignorenulls=True).over(w).alias("value"),
        F.col("v").isNull().alias("is_gap"),
    )


@query(
    "q_interp_linear",
    oracle="""
    with daily as (
        select user_id, date_trunc('day', ts) as day,
               round(sum(value), 2) as v
        from events group by 1, 2
    ), span as (
        select user_id, min(day) as d0, max(day) as d1 from daily group by 1
    ), cal as (
        select user_id, unnest(generate_series(d0, d1, interval 1 day)) as day
        from span
    ), framed as (
        select c.user_id, c.day, d.v,
               last_value(d.v ignore nulls) over (
                   partition by c.user_id order by c.day
                   rows between unbounded preceding and current row) as p_v,
               last_value(case when d.v is not null then c.day end ignore nulls)
                   over (
                   partition by c.user_id order by c.day
                   rows between unbounded preceding and current row) as p_day,
               first_value(d.v ignore nulls) over (
                   partition by c.user_id order by c.day
                   rows between current row and unbounded following) as n_v,
               first_value(case when d.v is not null then c.day end ignore nulls)
                   over (
                   partition by c.user_id order by c.day
                   rows between current row and unbounded following) as n_day
        from cal c left join daily d using (user_id, day)
    )
    select user_id, day,
           round(case when v is not null then v
                else p_v + (n_v - p_v)
                     * (date_diff('day', p_day, day) * 1.0
                        / date_diff('day', p_day, n_day))
                end, 6) as value,
           v is null as is_interp
    from framed
    """,
    tags=("events", "window"),
)
def q_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densify + LINEAR interpolation (SAS: PROC EXPAND
    METHOD=JOIN — straight-line between observed points), the
    companion of q_gap_fill's METHOD=STEP carry-forward.

    Each gap day takes p + (n - p) * elapsed/gap_width between its
    bracketing observed days, found with last(ignorenulls) over the
    preceding frame and first(ignorenulls) over the following frame —
    two frames on ONE user-partitioned sort, no self-join, no
    per-gap subquery. Both engines evaluate the identical arithmetic
    expression on identically-rounded 2dp inputs, so the 6dp-rounded
    interpolants hash-match exactly. Span edges are always observed
    (calendar spans min..max observed day), so neither frame can come
    up empty.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    cal = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    framed = cal.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(w_back).alias("p_v"),
        F.last(obs_day, ignorenulls=True).over(w_back).alias("p_day"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("n_v"),
        F.first(obs_day, ignorenulls=True).over(w_fwd).alias("n_day"),
    )
    frac = F.datediff(F.col("day"), F.col("p_day")) * F.lit(1.0) / F.datediff(
        F.col("n_day"), F.col("p_day")
    )
    return framed.select(
        "user_id",
        "day",
        F.round(
            F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
                F.col("p_v") + (F.col("n_v") - F.col("p_v")) * frac
            ),
            6,
        ).alias("value"),
        F.col("v").isNull().alias("is_interp"),
    )


@query(
    "q_funnel",
    oracle="""
    with s1 as (
        select user_id, min(ts) as t1 from events
        where event_type = 'view' group by user_id
    ),
    s2 as (
        select e.user_id, min(e.ts) as t2
        from events e join s1 using (user_id)
        where e.event_type = 'click' and e.ts > s1.t1
        group by e.user_id
    ),
    s3 as (
        select e.user_id, min(e.ts) as t3
        from events e join s2 using (user_id)
        where e.event_type = 'purchase' and e.ts > s2.t2
        group by e.user_id
    )
    select 'view' as stage, (select count(*) from s1) as users
    union all
    select 'view>click', (select count(*) from s2)
    union all
    select 'view>click>purchase', (select count(*) from s3)
    """,
    tags=("events", "analytics"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order conversion funnel (view -> click -> purchase):
    stage k counts users whose first stage-k event happens AFTER
    their first stage-(k-1) completion — the product-analytics
    workhorse (SAS analog: chained BY-user DATA steps with RETAIN
    first-seen flags). Each stage is one filtered min-aggregation
    joined to the previous stage's per-user frontier: k stages = k
    keyed aggs on progressively SHRINKING user sets, no windows, no
    per-user event arrays — at 100 TB the first filter prunes to the
    stage-relevant events before any shuffle."""
    events = load_table(spark, sf_dir, "events")

    def first_after(event_type: str, prev, prev_ts: str, out_ts: str):
        src = events.filter(F.col("event_type") == event_type)
        if prev is not None:
            src = src.join(prev, "user_id").filter(F.col("ts") > F.col(prev_ts))
        return src.groupBy("user_id").agg(F.min("ts").alias(out_ts))

    s1 = first_after("view", None, "", "t1")
    s2 = first_after("click", s1, "t1", "t2")
    s3 = first_after("purchase", s2, "t2", "t3")
    return (
        s1.agg(F.lit("view").alias("stage"), F.count(F.lit(1)).alias("users"))
        .unionByName(
            s2.agg(F.lit("view>click").alias("stage"), F.count(F.lit(1)).alias("users"))
        )
        .unionByName(
            s3.agg(
                F.lit("view>click>purchase").alias("stage"),
                F.count(F.lit(1)).alias("users"),
            )
        )
    )


@query(
    "q_cohort_retention",
    oracle="""
    with cohorts as (
        select user_id, min(date_trunc('week', ts)) as cohort_week
        from events group by user_id
    ),
    activity as (
        select distinct user_id, date_trunc('week', ts) as week from events
    )
    select c.cohort_week,
           cast(floor(date_diff('day', c.cohort_week, a.week) / 7) as bigint)
               as week_offset,
           cast(count(*) as bigint) as n_users
    from cohorts c join activity a using (user_id)
    group by 1, 2
    """,
    tags=("events", "analytics"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by first-
    activity week, counted once per (cohort, week-offset) they return
    in — the second product-analytics staple. Monday-start weeks via
    date_trunc('week') on BOTH engines; offsets as exact day-diff
    integer division. Shape: two keyed aggs (cohort assignment,
    distinct activity) + one join + one agg — every stage keyed by
    user or (cohort, offset), no windows."""
    events = load_table(spark, sf_dir, "events")
    cohorts = events.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    return (
        cohorts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@query(
    "q_event_transitions",
    oracle="""
    with ordered as (
        select user_id, event_type,
               lag(event_type) over (partition by user_id
                                     order by ts, event_id) as prev_type
        from events
    )
    select prev_type, event_type, cast(count(*) as bigint) as n
    from ordered
    where prev_type is not null
    group by prev_type, event_type
    """,
    tags=("events", "analytics", "window"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition counts between consecutive events per
    user (the Markov-chain prep of sequence modeling; SAS: BY-user
    LAG). One user-partitioned lag + one (prev, curr) agg; event_id
    tiebreak pins simultaneous events on both engines."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@query(
    "q_ab_test",
    oracle="""
    with assigned as (
        select value,
               case when list_reduce(
                      list_transform(range(1,16),
                        j -> strpos('0123456789abcdef',
                                    substr(sha256(cast(user_id as varchar)), j, 1)) - 1),
                      (a,x) -> a*16+x) % 2 = 0
                    then 'A' else 'B' end as arm
        from events where event_type = 'purchase'
    ),
    stats as (
        select arm, count(*) as n, avg(value) as mean,
               var_samp(value) as var
        from assigned group by arm
    )
    select a.n as n_a, b.n as n_b,
           round(a.mean, 6) as mean_a, round(b.mean, 6) as mean_b,
           round(b.mean - a.mean, 6) as lift,
           round((b.mean - a.mean)
                 / sqrt(a.var / a.n + b.var / b.n), 4) as t_stat
    from stats a, stats b
    where a.arm = 'A' and b.arm = 'B'
    """,
    tags=("events", "analytics", "stats"),
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: engine-portable hash assignment of
    users to arms (operators/sampling.hash_bucket — the q_split_hash
    mechanism, sha256-based so the oracle recomputes the identical
    membership), then lift and Welch t-statistic over purchase
    values. One filtered scan -> one 2-group agg -> a 1x1 broadcast
    self-pair; the t-stat rounds at 4dp (its inputs are variance
    RATIOS, where engine summation-order drift is amplified ~1e-5
    past the 6dp rule for plain aggregates)."""
    from sas_etl_spark.operators.sampling import hash_bucket

    events = load_table(spark, sf_dir, "events")
    assigned = events.filter(F.col("event_type") == "purchase").select(
        "value",
        F.when(hash_bucket(F.col("user_id"), 2) == 0, "A").otherwise("B").alias("arm"),
    )
    stats = assigned.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("mean"),
        F.var_samp("value").alias("var"),
    )
    a = stats.filter(F.col("arm") == "A").select(
        F.col("n").alias("n_a"), F.col("mean").alias("mean_a"), F.col("var").alias("var_a")
    )
    b = stats.filter(F.col("arm") == "B").select(
        F.col("n").alias("n_b"), F.col("mean").alias("mean_b"), F.col("var").alias("var_b")
    )
    return a.crossJoin(F.broadcast(b)).select(
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round(F.col("mean_b") - F.col("mean_a"), 6).alias("lift"),
        F.round(
            (F.col("mean_b") - F.col("mean_a"))
            / F.sqrt(F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")),
            4,
        ).alias("t_stat"),
    )


@query(
    "q_autocorr",
    oracle="""
    with o as (
        select user_id, value,
               lag(value) over (partition by user_id
                                order by ts, event_id) as prev
        from events
    )
    select user_id,
           cast(count(prev) as bigint) as n_pairs,
           round(corr(value, prev), 6) as acf1
    from o
    where prev is not null
    group by user_id
    having count(prev) >= 10
    """,
    tags=("events", "stats", "window"),
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series lag-1 autocorrelation (SAS: PROC ARIMA IDENTIFY /
    PROC TIMESERIES — the stationarity screen before any forecasting
    stage): pair each user's event value with its predecessor via a
    PARTITIONED lag window (one keyed sort per series, never a global
    one), then the same mergeable corr aggregate q_corr_stats already
    parity-proves. The n>=10 floor keeps the statistic meaningful and
    the (count, corr) pair deterministic on both engines."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = events.withColumn("prev", F.lag("value").over(w)).filter(
        F.col("prev").isNotNull()
    )
    return (
        o.groupBy("user_id")
        .agg(
            F.count("prev").alias("n_pairs"),
            F.round(F.corr("value", "prev"), 6).alias("acf1"),
        )
        .filter(F.col("n_pairs") >= 10)
    )


# -- activity streaks (gaps and islands) ------------------------------


@query(
    "q_activity_streaks",
    oracle="""
    with days as (
        select distinct user_id, cast(date_trunc('day', ts) as date) as day
        from events
    ),
    anchored as (
        select user_id, day,
               date_diff('day', date '1970-01-01', day)
                 - row_number() over (partition by user_id order by day)
                   as anchor
        from days
    ),
    streaks as (
        select user_id, anchor,
               cast(count(*) as bigint) as streak_len,
               min(day) as streak_start
        from anchored group by user_id, anchor
    ),
    best as (
        select user_id, streak_len, streak_start,
               row_number() over (partition by user_id
                                  order by streak_len desc, streak_start)
                   as rn,
               cast(sum(streak_len) over (partition by user_id) as bigint)
                   as n_active_days
        from streaks
    )
    select user_id, n_active_days,
           streak_len as longest_streak,
           cast(streak_start as timestamp) as streak_start
    from best where rn = 1
    """,
    tags=("events", "window", "analytics"),
)
def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands idiom (product analytics: engagement streaks;
    SAS: BY-user DATA step with RETAINed counters across a date LAG).

    The island key is day_number - row_number (an INTEGER anchor,
    constant within each consecutive run), so islands fall out of one
    partitioned window + one grouped count — no self-joins, no
    recursion. Ties for the longest streak break toward the earliest
    start, deterministically on both engines.

    Scale: distinct (user, day) reduces map-side; both windows
    partition by user (no global sort); per-user streak rows are
    bounded by active days.
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    anchored = days.select(
        "user_id",
        "day",
        (
            F.datediff("day", F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("anchor"),
    )
    streaks = anchored.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("streak_len"),
        F.min("day").alias("streak_start"),
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.desc("streak_len"), F.asc("streak_start")
    )
    wt = Window.partitionBy("user_id")
    best = streaks.select(
        "user_id",
        "streak_len",
        "streak_start",
        F.row_number().over(wb).alias("rn"),
        F.sum("streak_len").over(wt).alias("n_active_days"),
    )
    return best.filter(F.col("rn") == 1).select(
        "user_id",
        "n_active_days",
        F.col("streak_len").alias("longest_streak"),
        # timestamp, not date: Spark DATE surfaces as python objects in
        # Arrow->pandas while DuckDB DATE arrives datetime64 — the
        # driver's column compare needs one dtype on both sides
        F.col("streak_start").cast("timestamp").alias("streak_start"),
    )


# -- sliding-window distinct users (trailing 7 days) ------------------


@query(
    "q_sliding_distinct_users",
    oracle="""
    with du as (
        select distinct cast(date_trunc('day', ts) as date) as day, user_id
        from events
    ),
    spine as (select distinct day from du)
    select cast(s.day as timestamp) as day,
           cast(count(distinct du.user_id) as bigint) as wau
    from spine s
    join du on du.day <= s.day
           and du.day > s.day - 7 * interval 1 day
    group by s.day
    """,
    tags=("events", "window", "analytics"),
)
def q_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day (the WAU curve —
    product analytics' most-watched metric; SAS: a macro loop of PROC
    SQL counts per window).

    COUNT(DISTINCT) over a sliding frame is not a window aggregate in
    any engine — the correct distributed shape is: reduce to distinct
    (day, user) pairs FIRST (map-side combine does the heavy lifting),
    then fan each pair onto the <=7 window anchors it serves via a
    range join against the tiny day spine, then count distinct per
    anchor. Work = active-pairs x 7, never events x 7.

    Scale: the spine is O(days) and broadcasts; the fan-out join is
    row-local per pair; the final distinct agg shuffles (day, user)
    pairs once. The approx twin at extreme cardinality replaces the
    distinct count with an HLL sketch per day merged across the frame
    (mergeability is WHY HLL fits sliding windows).
    """
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    ).distinct()
    spine = du.select(F.col("day").alias("anchor")).distinct()
    fanned = du.join(
        F.broadcast(spine),
        (F.col("day") <= F.col("anchor"))
        & (F.col("day") > F.date_sub(F.col("anchor"), 7)),
    )
    return fanned.groupBy(
        F.col("anchor").cast("timestamp").alias("day")
    ).agg(F.countDistinct("user_id").alias("wau"))


# -- latency-style percentiles per time bucket ------------------------


@query(
    "q_latency_percentiles",
    oracle="""
    select time_bucket(interval 6 hour, ts) as bucket,
           cast(count(*) as bigint) as n,
           round(quantile_cont(value, 0.5), 6) as p50,
           round(quantile_cont(value, 0.95), 6) as p95,
           round(quantile_cont(value, 0.99), 6) as p99,
           round(max(value), 6) as pmax
    from events
    group by 1
    """,
    tags=("events", "agg", "stats"),
)
def q_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95/p99/max per 6-hour bucket — the observability
    latency-dashboard query (SAS: PROC MEANS P50 P95 P99 with a
    formatted time CLASS).

    Exact interpolated percentiles per bucket (both engines
    interpolate identically); the oracle's quantile_cont triple is
    the established q_percentiles parity. Bucketing via date_trunc-
    aligned 6-hour windows matches DuckDB's time_bucket epoch
    alignment (the q_tumbling_counts contract).

    Scale: grouped exact percentiles buffer each bucket's values in
    the percentile ObjectHashAggregate — bounded by bucket width x
    event rate; the constant-state swap is percentile_approx (sketch
    accuracy attested by q_approx_percentile), same plan shape.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = F.window("ts", "6 hours").getField("start").alias("bucket")
    return ev.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.round(F.max("value"), 6).alias("pmax"),
    )


# -- max concurrency (interval stacking) ------------------------------

CONCURRENCY_PAD_MIN = 30


@query(
    "q_max_concurrency",
    oracle=f"""
    with e as (
        select user_id, ts, event_id,
               case when lag(ts) over (partition by user_id
                                       order by ts, event_id) is null
                         or ts - lag(ts) over (partition by user_id
                                               order by ts, event_id)
                            > interval 30 minute
                    then 1 else 0 end as new_s
        from events
    ),
    s as (
        select user_id, ts,
               sum(new_s) over (partition by user_id order by ts, event_id
                                rows unbounded preceding) as sid
        from e
    ),
    sess as (
        select user_id, sid, min(ts) as st,
               max(ts) + interval {CONCURRENCY_PAD_MIN} minute as en
        from s group by user_id, sid
    ),
    spans as (
        select user_id, sid, st, en,
               unnest(generate_series(cast(date_trunc('day', st) as date),
                                      cast(date_trunc('day', en) as date),
                                      interval 1 day))::date as day
        from sess
    ),
    clipped as (
        select user_id, sid, day,
               greatest(st, cast(day as timestamp)) as cs,
               least(en, cast(day as timestamp) + interval 1 day) as ce
        from spans
        where greatest(st, cast(day as timestamp))
              < least(en, cast(day as timestamp) + interval 1 day)
    ),
    deltas as (
        select day, cs as ts, 1 as delta, user_id, sid from clipped
        union all
        select day, ce, -1, user_id, sid from clipped
    ),
    run as (
        select day, delta,
               sum(delta) over (partition by day
                                order by ts, delta, user_id, sid
                                rows unbounded preceding) as conc
        from deltas
    )
    select cast(day as timestamp) as day,
           cast(max(conc) as bigint) as max_concurrency,
           cast(sum(case when delta = 1 then 1 else 0 end) as bigint)
               as n_sessions
    from run group by day
    """,
    tags=("events", "window", "analytics"),
)
def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — interval stacking (capacity
    planning's canonical question; SAS: an event-coded DATA step with
    a RETAINed counter).

    Sessions are the q_sessionize intervals padded by the 30-minute
    inactivity window, half-open [start, last_event + 30min). Each
    interval SPLITS AT DAY BOUNDARIES first (clip to day), so the
    +1/-1 delta timeline and its running sum partition BY DAY — no
    global-order funnel; a year of data is 365 independent timelines.
    At equal timestamps the -1 sorts first (half-open touch points
    don't overlap), and (user, sid) tiebreaks make the running sum's
    order total — engine-identical maxima.

    Scale: the day-split explode is bounded by interval length in
    days (~1-2 here); the per-day window is the only sort. This IS
    the distributed form — the naive single global ordered cumsum
    serializes the planet through one task.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = CONCURRENCY_PAD_MIN * 60 * 1_000_000
    new_s = (
        F.lag("ts").over(w).isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            > gap_us
        )
    ).cast("int")
    s = ev.select(
        "user_id",
        "ts",
        F.sum(new_s).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("sid"),
    )
    sess = s.groupBy("user_id", "sid").agg(
        F.min("ts").alias("st"),
        (
            F.timestamp_micros(F.unix_micros(F.max("ts")) + gap_us)
        ).alias("en"),
    )
    spans = sess.select(
        "user_id",
        "sid",
        "st",
        "en",
        F.explode(
            F.sequence(
                F.to_date(F.date_trunc("day", "st")),
                F.to_date(F.date_trunc("day", "en")),
                F.expr("interval 1 day"),
            )
        ).alias("day"),
    )
    day_ts = F.col("day").cast("timestamp")
    clipped = spans.select(
        "user_id",
        "sid",
        "day",
        F.greatest(F.col("st"), day_ts).alias("cs"),
        F.least(
            F.col("en"), F.timestamp_micros(F.unix_micros(day_ts) + 86_400_000_000)
        ).alias("ce"),
    ).filter(F.col("cs") < F.col("ce"))
    deltas = clipped.select(
        "day", F.col("cs").alias("ts"), F.lit(1).alias("delta"), "user_id", "sid"
    ).unionByName(
        clipped.select(
            "day", F.col("ce").alias("ts"), F.lit(-1).alias("delta"),
            "user_id", "sid",
        )
    )
    w2 = (
        Window.partitionBy("day")
        .orderBy("ts", "delta", "user_id", "sid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = deltas.select(
        "day", "delta", F.sum("delta").over(w2).alias("conc")
    )
    return run.groupBy(F.col("day").cast("timestamp").alias("day")).agg(
        F.max("conc").cast("long").alias("max_concurrency"),
        F.sum((F.col("delta") == 1).cast("int")).cast("long").alias(
            "n_sessions"
        ),
    )


# -- new vs returning users ------------------------------------------


@query(
    "q_new_vs_returning",
    oracle="""
    with du as (
        select distinct user_id,
               cast(date_trunc('day', ts) as date) as day
        from events
    ),
    first_day as (
        select user_id, min(day) as d0 from du group by user_id
    )
    select cast(du.day as timestamp) as day,
           cast(sum(case when du.day = f.d0 then 1 else 0 end) as bigint)
               as n_new,
           cast(sum(case when du.day > f.d0 then 1 else 0 end) as bigint)
               as n_returning
    from du join first_day f on f.user_id = du.user_id
    group by du.day
    """,
    tags=("events", "analytics"),
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New vs returning active users per day (growth analytics'
    second-most-watched split after WAU; SAS: first-seen flags via
    PROC SORT + FIRST.user logic merged back).

    First-seen day per user is one min-agg; the daily split is a
    conditional agg over the distinct (user, day) pairs joined to it.

    Scale: distinct pairs reduce map-side; the first-day table is one
    row per user and joins back on the user key (same partitioning as
    the pair reduce — AQE picks the co-located join); no windows over
    raw events.
    """
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    first_day = du.groupBy("user_id").agg(F.min("day").alias("d0"))
    return (
        du.join(first_day, "user_id")
        .groupBy(F.col("day").cast("timestamp").alias("day"))
        .agg(
            F.sum((F.col("day") == F.col("d0")).cast("int"))
            .cast("long")
            .alias("n_new"),
            F.sum((F.col("day") > F.col("d0")).cast("int"))
            .cast("long")
            .alias("n_returning"),
        )
    )


# -- multi-touch attribution -------------------------------------------

#: Attribution lookback: touches credit a conversion only within this
#: many days before it.
ATTR_LOOKBACK_DAYS = 7
#: Campaign id = json props.k mod this (10 synthetic campaigns).
ATTR_CAMPAIGNS = 10


@query(
    "q_attribution",
    oracle=f"""
    with purch as (
        select event_id as p_id, user_id, ts as p_ts, value
        from events where event_type = 'purchase'
    ),
    touch as (
        select user_id, ts as t_ts, event_id as t_id,
               cast(json_extract_string(props, '$.k') as bigint)
                   % {ATTR_CAMPAIGNS} as campaign
        from events where event_type in ('click', 'view')
    ),
    j as (
        select p.p_id, p.value, t.campaign, t.t_ts, t.t_id,
               count(*) over (partition by p.p_id) as n_t,
               row_number() over (partition by p.p_id
                                  order by t.t_ts desc, t.t_id desc)
                   as rn_last,
               row_number() over (partition by p.p_id
                                  order by t.t_ts asc, t.t_id asc)
                   as rn_first
        from purch p
        join touch t on t.user_id = p.user_id
                    and t.t_ts < p.p_ts
                    and t.t_ts >= p.p_ts - interval {ATTR_LOOKBACK_DAYS} day
    )
    select campaign,
           cast(count(distinct p_id) as bigint) as n_touched_conv,
           round(sum(case when rn_first = 1 then value else 0 end), 2)
               as first_touch_rev,
           round(sum(case when rn_last = 1 then value else 0 end), 2)
               as last_touch_rev,
           round(sum(value / n_t), 2) as linear_rev
    from j
    group by campaign
    """,
    tags=("events", "analytics", "attribution"),
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution — first-touch, last-touch,
    and linear revenue credit per campaign (SAS analog: the classic
    marketing-analytics DATA-step with RETAIN over sorted touchpoints;
    here one declarative plan). Conversions are purchase events;
    touchpoints are click/view events by the same user within a
    {ATTR_LOOKBACK_DAYS}-day lookback; campaign = props.k mod
    {ATTR_CAMPAIGNS}. First/last are picked by (ts, event_id)
    tiebreaks so every window cut is deterministic cross-engine;
    linear splits each conversion's value equally over its touches.

    Scale: the purchase-touch pairing is a USER-keyed equi-join with
    the lookback as a post-join range predicate — it shuffles on
    user_id (never all-pairs), and the pair fan-out is bounded by
    touches-per-user-per-week, the same shape as q_sessionize. The
    per-conversion windows partition by purchase id (millions of
    small partitions, no funnel); the final rollup is one
    map-side-combined agg over {ATTR_CAMPAIGNS} campaigns."""
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        "value",
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        (
            F.get_json_object("props", "$.k").cast("long") % ATTR_CAMPAIGNS
        ).alias("campaign"),
    )
    j = purch.join(
        touch,
        (purch.user_id == touch.user_id)
        & (touch.t_ts < purch.p_ts)
        & (
            touch.t_ts
            >= purch.p_ts - F.expr(f"INTERVAL {ATTR_LOOKBACK_DAYS} DAYS")
        ),
    )
    w = Window.partitionBy("p_id")
    j = (
        j.select("p_id", "value", "campaign", "t_ts", "t_id")
        .withColumn("n_t", F.count(F.lit(1)).over(w))
        .withColumn(
            "rn_last",
            F.row_number().over(w.orderBy(F.desc("t_ts"), F.desc("t_id"))),
        )
        .withColumn(
            "rn_first",
            F.row_number().over(w.orderBy(F.asc("t_ts"), F.asc("t_id"))),
        )
    )
    return j.groupBy("campaign").agg(
        F.countDistinct("p_id").cast("long").alias("n_touched_conv"),
        F.round(
            F.sum(F.when(F.col("rn_first") == 1, F.col("value")).otherwise(0.0)),
            2,
        ).alias("first_touch_rev"),
        F.round(
            F.sum(F.when(F.col("rn_last") == 1, F.col("value")).otherwise(0.0)),
            2,
        ).alias("last_touch_rev"),
        F.round(F.sum(F.col("value") / F.col("n_t")), 2).alias("linear_rev"),
    )


# -- seasonal decomposition --------------------------------------------


@query(
    "q_stl_decompose",
    oracle="""
    with daily as (
        select event_type, cast(ts as date) as d,
               cast(count(*) as bigint) as n
        from events group by 1, 2
    ),
    tr as (
        select event_type, d, n,
               avg(n) over (partition by event_type order by d
                            rows between 3 preceding and 3 following)
                   as trend
        from daily
    ),
    se as (
        select event_type, dayofweek(d) + 1 as dow,
               avg(n - trend) as seasonal
        from tr group by 1, 2
    )
    select t.event_type, cast(t.d as varchar) as d, t.n,
           round(t.trend, 6) as trend,
           round(s.seasonal, 6) as seasonal,
           round(t.n - t.trend - s.seasonal, 6) as resid
    from tr t join se s
      on s.event_type = t.event_type and s.dow = dayofweek(t.d) + 1
    """,
    tags=("events", "timeseries", "stats"),
)
def q_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-trend decomposition of each event type's daily volume
    (STL-lite / classical decomposition — SAS: PROC TIMESERIES
    DECOMP): trend = 7-day centered moving average, seasonal =
    day-of-week mean of the detrended series, residual = the rest.
    The anomaly-detection complement of q_anomaly_days (which flags;
    this EXPLAINS, splitting volume into trend/seasonality/noise).

    Edge days use the partial centered window (identical ROWS-frame
    semantics in both engines); day-of-week alignment: Spark
    dayofweek is 1=Sunday..7, DuckDB 0=Sunday..6, so the oracle adds
    1. All three emitted components are 6dp-rounded; the seasonal
    means consume the RAW trend so both engines round once, at the
    boundary.

    Scale: daily rollup is a map-side-combined count; the centered
    window partitions by series (event_type) over O(days) rows per
    series — the q_mom_growth pattern, no global sort; the seasonal
    join is a broadcast of O(series x 7) rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w7 = (
        Window.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
    )
    tr = daily.withColumn("trend", F.avg("n").over(w7))
    se = (
        tr.groupBy(
            F.col("event_type").alias("se_type"),
            F.dayofweek("d").alias("dow"),
        )
        .agg(F.avg(F.col("n") - F.col("trend")).alias("seasonal"))
    )
    return (
        tr.join(
            F.broadcast(se),
            (F.col("event_type") == F.col("se_type"))
            & (F.dayofweek("d") == F.col("dow")),
        )
        .select(
            "event_type",
            F.col("d").cast("string").alias("d"),
            "n",
            F.round("trend", 6).alias("trend"),
            F.round("seasonal", 6).alias("seasonal"),
            F.round(F.col("n") - F.col("trend") - F.col("seasonal"), 6).alias(
                "resid"
            ),
        )
    )
