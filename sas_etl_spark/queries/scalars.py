"""Scalar-function sweep (SURVEY.md §2.8): string / regex / date /
math / array / JSON families, each exercised end-to-end against the
oracle. Function-semantics edges (DuckDB vs Spark) are resolved in
favor of expressions that are *semantically identical*, noted inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.functions.rowwise import sas_max, sas_sum
from sas_etl_spark.operators.similarity import l2_norm
from sas_etl_spark.registry import query


@query(
    "q_string_funcs",
    oracle="""
    select doc_id,
           upper(source)                         as src_upper,
           length(text)                          as text_len,
           substr(text, 1, 10)                   as prefix10,
           string_split(text, ' ')[1]            as first_word,
           cast(len(string_split(text, ' ')) as bigint) as n_tokens,
           concat_ws('|', lang, source)          as lang_src,
           replace(lang, 'en', 'EN')             as lang_repl
    from documents
    """,
    tags=("scalar", "string"),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family (SAS: UPCASE, LENGTH, SUBSTR, SCAN,
    CATX, TRANWRD). SURVEY.md §2.8.

    SCAN(text, 1) ≙ split+element_at(1) — both 1-based. Spark length()
    returns int, DuckDB BIGINT -> cast long.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.upper("source").alias("src_upper"),
        F.length("text").cast("long").alias("text_len"),
        F.substring("text", 1, 10).alias("prefix10"),
        F.element_at(toks, 1).alias("first_word"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.concat_ws("|", "lang", "source").alias("lang_src"),
        F.regexp_replace("lang", "en", "EN").alias("lang_repl"),
    )


@query(
    "q_regex_extract",
    oracle="""
    select lang,
           cast(sum(case when regexp_matches(text, 'stream.*join') then 1 else 0 end)
                as bigint) as n_stream_join,
           cast(sum(case when regexp_matches(text, '^data')        then 1 else 0 end)
                as bigint) as n_data_start
    from documents
    group by lang
    """,
    tags=("scalar", "regex"),
)
def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicates (SAS: PRXMATCH). SURVEY.md §2.8.

    rlike ≙ regexp_matches: both are unanchored contains-match. The
    patterns avoid engine-divergent syntax (Java regex vs RE2 agree on
    these).
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.sum(F.when(F.col("text").rlike("stream.*join"), 1).otherwise(0))
        .cast("long")
        .alias("n_stream_join"),
        F.sum(F.when(F.col("text").rlike("^data"), 1).otherwise(0))
        .cast("long")
        .alias("n_data_start"),
    )


@query(
    "q_date_funcs",
    oracle="""
    select o_orderkey,
           cast(year(o_orderdate) as bigint)        as o_year,
           cast(month(o_orderdate) as bigint)       as o_month,
           cast(dayofweek(o_orderdate) as bigint)   as o_dow,
           date_trunc('month', o_orderdate)         as month_start,
           cast(date_diff('day', timestamp '1995-01-01 00:00:00', o_orderdate)
                as bigint)                          as days_since_95,
           cast(o_orderdate + interval 3 month as timestamp) as plus3m
    from orders
    """,
    tags=("scalar", "date"),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (SAS: YEAR, MONTH, WEEKDAY, INTNX, DATDIF).
    SURVEY.md §2.8.

    Semantics edges handled: DuckDB dayofweek is 0=Sunday, Spark
    dayofweek is 1=Sunday -> subtract 1; Spark add_months returns
    DATE -> cast back to timestamp to match the interval arithmetic;
    both clamp month-ends identically. datediff(ts) truncates to date
    on both sides.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("o_dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus3m"),
    )


@query(
    "q_math_rowwise",
    oracle="""
    select l_orderkey, l_linenumber,
           round(sqrt(l_extendedprice), 6)          as sqrt_price,
           round(ln(l_extendedprice), 6)            as ln_price,
           cast(floor(l_quantity) as bigint)        as qty_floor,
           cast(ceil(l_discount * 100) as bigint)   as disc_pct_ceil,
           abs(l_quantity - 25)                     as qty_dev,
           l_orderkey % 7                           as key_mod,
           greatest(l_quantity, l_discount * 100, l_tax * 100) as g3,
           l_quantity + coalesce(l_discount, 0) + coalesce(l_tax, 0) as sas_sum3
    from lineitem
    """,
    tags=("scalar", "math"),
)
def q_math_rowwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family + SAS row-wise SUM(of ...) semantics (null-skip).
    SURVEY.md §2.8, §4.3.

    ln/sqrt rounded to 6dp: libm implementations differ in the last
    ulp between JVM and C. DuckDB ``log`` is base-10 — oracle uses
    ``ln``. sas_sum over non-null fixture columns reduces to plain
    coalesce-addition, which is what the oracle mirrors.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.expr("l_orderkey % 7").alias("key_mod"),
        sas_max(F.col("l_quantity"), F.col("l_discount") * 100, F.col("l_tax") * 100).alias("g3"),
        sas_sum("l_quantity", "l_discount", "l_tax").alias("sas_sum3"),
    )


@query(
    "q_array_ops",
    oracle="""
    select vec_id,
           cast(len(embedding) as bigint) as dim,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> cast(x as double) * cast(x as double)))), 6) as l2,
           round(cast(list_max(embedding) as double), 6) as emax,
           round(list_sum(list_transform(embedding, x -> cast(x as double)))
                 / len(embedding), 6) as emean
    from embeddings
    """,
    tags=("scalar", "array"),
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order family over the embedding column (SAS:
    ARRAY + DO loop over variables). SURVEY.md §2.2 #17, §2.8.

    Element arithmetic cast to double on BOTH sides before summing so
    neither engine accumulates in float32. max is order-free (exact);
    sums rounded for associativity drift.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    esum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(l2_norm("embedding"), 6).alias("l2"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("emax"),
        F.round(esum / F.size("embedding"), 6).alias("emean"),
    )


@query(
    "q_json_extract",
    oracle="""
    select event_type,
           round(avg(cast(json_extract_string(props, '$.k') as bigint)), 6) as avg_k,
           max(cast(json_extract_string(props, '$.k') as bigint))           as max_k,
           count(*) as n
    from events
    group by event_type
    """,
    tags=("scalar", "json"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from a string column (SAS has no native JSON
    scalar funcs — libname JSON engine; here get_json_object ≙
    json_extract_string). SURVEY.md §2.8, fixture `events.props`.
    """
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q_string_funcs2",
    oracle="""
    select doc_id,
           lpad(lang, 5, '_')          as lang_pad,
           rpad(source, 8, '.')        as src_pad,
           reverse(lang)               as lang_rev,
           repeat(lang, 3)             as lang_x3,
           translate(lang, 'aeiou', 'AEIOU') as lang_vowels,
           trim(concat(' ', source, ' '))    as src_trim,
           ltrim(concat('xx', source), 'x')  as src_ltrim
    from documents
    """,
    tags=("scalar", "string"),
)
def q_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-family sweep (SAS: REPEAT, REVERSE, TRANSLATE,
    TRIM/STRIP, z-padding formats via LPAD/RPAD). SURVEY.md §2.8."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.lpad("lang", 5, "_").alias("lang_pad"),
        F.rpad("source", 8, ".").alias("src_pad"),
        F.reverse("lang").alias("lang_rev"),
        F.repeat("lang", 3).alias("lang_x3"),
        F.translate("lang", "aeiou", "AEIOU").alias("lang_vowels"),
        F.trim(F.concat(F.lit(" "), F.col("source"), F.lit(" "))).alias("src_trim"),
        F.expr("ltrim('x', concat('xx', source))").alias("src_ltrim"),
    )


@query(
    "q_date_format",
    oracle="""
    select o_orderkey,
           strftime(o_orderdate, '%Y-%m')            as month_label,
           strftime(o_orderdate, '%Y/%m/%d')         as ymd_label,
           cast(strftime(o_orderdate, '%Y') as bigint) as year_str_int
    from orders
    """,
    tags=("scalar", "date"),
)
def q_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date rendering via format strings (SAS: PUT(date, yymmd7.) and
    friends — the format half of the informat/format pair).
    date_format ≙ strftime for these patterns."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("month_label"),
        F.date_format("o_orderdate", "yyyy/MM/dd").alias("ymd_label"),
        F.date_format("o_orderdate", "yyyy").cast("long").alias("year_str_int"),
    )


@query(
    "q_intnx_intck",
    oracle="""
    select o_orderkey,
           cast(date_trunc('month', o_orderdate) + interval 2 month
                as timestamp)                                as intnx_month_b,
           cast(cast(o_orderdate + interval 2 month as date) as timestamp)
               as intnx_month_s,
           cast(last_day(cast(o_orderdate + interval 2 month as date))
                as timestamp)                                as intnx_month_e,
           cast(cast(o_orderdate as date)
                - cast(dayofweek(o_orderdate) as int) + 14
                as timestamp)                                as intnx_week_b,
           cast(date_diff('day', o_orderdate,
                          timestamp '1996-06-15 00:00:00') as bigint)
               as intck_day,
           cast(floor(date_diff('day', date '1800-01-05',
                                cast(timestamp '1996-06-15 00:00:00' as date))
                      / 7)
                - floor(date_diff('day', date '1800-01-05',
                                  cast(o_orderdate as date)) / 7) as bigint)
               as intck_week,
           cast((1996 * 12 + 6)
                - (year(o_orderdate) * 12 + month(o_orderdate)) as bigint)
               as intck_month,
           cast((1996 * 4 + 2)
                - (year(o_orderdate) * 4 + quarter(o_orderdate)) as bigint)
               as intck_qtr
    from orders
    """,
    tags=("scalar", "date"),
)
def q_intnx_intck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAS INTNX (interval advance) and INTCK (boundary count)
    semantics, pinned precisely — SURVEY.md §2.8 date family depth.

    INTNX alignments: 'B' = advance then snap to interval begin
    (month start / week-start Sunday), 'S' = same relative day
    (month-end clamped identically by Spark add_months and DuckDB
    interval arithmetic), 'E' = interval end (last_day). INTCK counts
    BOUNDARY CROSSINGS, not elapsed time — 31 Jan to 1 Feb is one
    month — so months/quarters diff discrete indices (year*12+month)
    and weeks diff Sunday-week ordinals anchored at 1800-01-05 (a
    Sunday); the identical explicit formula runs on both engines,
    sidestepping DuckDB/Spark disagreeing on week-start and
    dayofweek numbering (DuckDB Sunday=0, Spark Sunday=1). All INTNX
    outputs are cast to midnight TIMESTAMP on both sides: Spark DATE
    reaches pandas as python-date objects while DuckDB DATE arrives
    as datetime64, which would break the value compare on type, not
    value.
    """
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    ref = F.lit("1996-06-15").cast("date")
    sunday_epoch = F.lit("1800-01-05").cast("date")
    week_ord = lambda c: F.floor(F.datediff(c, sunday_epoch) / 7)  # noqa: E731
    month_idx = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    qtr_idx = lambda c: F.year(c) * 4 + F.quarter(c)  # noqa: E731
    return orders.select(
        "o_orderkey",
        F.add_months(F.date_trunc("month", d), 2)
        .cast("timestamp")
        .alias("intnx_month_b"),
        F.add_months(d, 2).cast("timestamp").alias("intnx_month_s"),
        F.last_day(F.add_months(d, 2)).cast("timestamp").alias("intnx_month_e"),
        F.date_add(F.date_sub(d.cast("date"), F.dayofweek(d) - 1), 14)
        .cast("timestamp")
        .alias("intnx_week_b"),
        F.datediff(ref, d.cast("date")).cast("long").alias("intck_day"),
        (week_ord(ref) - week_ord(d.cast("date"))).cast("long").alias("intck_week"),
        (F.lit(1996 * 12 + 6) - month_idx(d)).cast("long").alias("intck_month"),
        (F.lit(1996 * 4 + 2) - qtr_idx(d)).cast("long").alias("intck_qtr"),
    )


@query(
    "q_string_distance",
    oracle="""
    select c_custkey,
           levenshtein(c_name,
                       lag(c_name) over (partition by c_nationkey
                                         order by c_custkey)) as dist_prev,
           levenshtein(c_name, 'Customer#000000000') as dist_anchor
    from customer
    """,
    tags=("scalar", "string", "fuzzy"),
)
def q_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance family (SAS: COMPGED / COMPLEV / SPEDIS fuzzy
    matching): Levenshtein distance to the previous name in key order
    and to a fixed anchor. Both engines implement classic unweighted
    Levenshtein, so values match exactly. The lag is partitioned by
    nation (global windows are banned — Exchange SinglePartition, see
    SCALE.md); the distance expressions themselves are per-row and
    embarrassingly parallel, and a real fuzzy-linkage run pairs them
    with a blocking join (the LSH/blocked-join machinery in
    minhash/simhash) rather than any window at all."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    return customer.select(
        "c_custkey",
        F.levenshtein(F.col("c_name"), F.lag("c_name").over(w)).alias("dist_prev"),
        F.levenshtein(F.col("c_name"), F.lit("Customer#000000000")).alias(
            "dist_anchor"
        ),
    )


@query(
    "q_business_days",
    oracle="""
    with j as (
        select l_orderkey, l_linenumber,
               cast(o_orderdate as date) as d1,
               cast(l_shipdate as date) as d2
        from lineitem join orders on l_orderkey = o_orderkey
    ), spans as (
        select l_orderkey, l_linenumber,
               date_diff('day', d1, d2) as n,
               least(d1, d2) as a,
               abs(date_diff('day', d1, d2)) as an,
               case when d2 >= d1 then 1 else -1 end as sgn
        from j
    )
    select l_orderkey, l_linenumber,
           cast(n as bigint) as cal_days,
           cast(sgn * ((an // 7) * 5
                + coalesce(list_sum(list_transform(
                      range(1, an % 7 + 1),
                      i -> case when dayofweek(a + i::int) between 1 and 5
                                then 1 else 0 end)), 0))
                as bigint) as bus_days
    from spans
    """,
    tags=("scalar", "date"),
)
def q_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business days from order to line shipment (SAS:
    INTCK('WEEKDAY', o_orderdate, l_shipdate) — the settlement/SLA
    counter every finance and ops ETL carries). Closed-form weekday
    count in (d1, d2]: full weeks x 5 plus a <=6-step HOF fold over
    the partial week — pure codegen arithmetic, no UDF, no calendar
    table (holiday calendars bolt on as a broadcast anti-join); see
    functions/busdays.py, property-tested against a day-walking
    Python reference over random spans incl. reversed ones. The
    oracle mirrors the identical formula (engine dayofweek encodings
    differ: Spark 1=Sun..7=Sat, DuckDB 0=Sun..6=Sat — each side uses
    its own weekday band). cal_days rides along to pin the raw
    datediff too."""
    from sas_etl_spark.functions.busdays import business_days_between

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        F.col("o_orderdate").cast("date").alias("d1"),
        F.col("l_shipdate").cast("date").alias("d2"),
    )
    return j.select(
        "l_orderkey",
        "l_linenumber",
        F.datediff("d2", "d1").cast("long").alias("cal_days"),
        business_days_between(F.col("d1"), F.col("d2")).alias("bus_days"),
    )


# -- nested JSON parse + array explode -------------------------------


@query(
    "q_json_nested",
    oracle="""
    with j as (
        select event_id,
               '{"user":{"id":' || user_id || ',"meta":' || props
                 || '},"tags":["evt_' || event_type || '","bucket_'
                 || event_id % 3 || '"]}' as payload
        from events where event_id < 1000
    )
    select event_id,
           cast(json_extract(payload, '$.user.id') as bigint) as user_id,
           cast(json_extract(payload, '$.user.meta.k') as bigint) as k,
           unnest(cast(json_extract(payload, '$.tags') as varchar[])) as tag
    from j
    """,
    tags=("scalar", "json"),
)
def q_json_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED JSON parsing with array explosion — the semi-structured
    ingestion shape (event payloads, API dumps): parse once with an
    explicit schema, navigate struct fields, explode the embedded
    array to rows (SAS: libname JSON engine + a DATA step per map —
    far weaker; this is where the engine leapfrogs the reference
    class).

    The nested payload is built deterministically from fixture
    columns (integer fields only — float-to-string rendering differs
    between engines, integers don't), embedding the REAL ``props``
    JSON column one level deep. Spark parses with a typed from_json
    schema; the oracle re-parses the same payloads with DuckDB's
    independent JSON engine — two parsers, one hash.

    Scale: from_json with an explicit schema is a single codegen
    expression (no schema inference scan); the explode is row-local.
    Malformed rows yield nulls (PERMISSIVE) rather than job failure.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    payload = F.concat(
        F.lit('{"user":{"id":'),
        F.col("user_id").cast("string"),
        F.lit(',"meta":'),
        F.col("props"),
        F.lit('},"tags":["evt_'),
        F.col("event_type"),
        F.lit('","bucket_'),
        (F.col("event_id") % 3).cast("string"),
        F.lit('"]}'),
    )
    schema = (
        "user struct<id: bigint, meta: struct<k: bigint>>,"
        " tags array<string>"
    )
    parsed = ev.select(
        "event_id", F.from_json(payload, schema).alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.user.id").alias("user_id"),
        F.col("p.user.meta.k").alias("k"),
        F.explode("p.tags").alias("tag"),
    )


# -- date dimension generation ---------------------------------------


@query(
    "q_date_dim",
    oracle="""
    select cast(d as timestamp) as day,
           cast(year(d) as bigint) as yr,
           cast(quarter(d) as bigint) as qtr,
           cast(month(d) as bigint) as mo,
           cast(dayofweek(d) + 1 as bigint) as dow,
           dayofweek(d) in (0, 6) as is_weekend,
           cast(date_trunc('month', d) as timestamp) as month_start,
           cast(last_day(d) as timestamp) as month_end
    from (select unnest(generate_series(date '2024-01-01',
                                        date '2024-12-31',
                                        interval 1 day))::date as d) t
    """,
    tags=("scalar", "date"),
)
def q_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar (date-dimension) table generation for one year — the
    warehouse spine every reporting join hangs off (SAS: a DO-loop
    DATA step with INTNX-derived attributes).

    Generated from sequence()/explode with derived attributes: year,
    quarter, month, day-of-week (SAS convention, 1=Sunday — Spark's
    dayofweek already is; DuckDB's 0=Sunday is shifted +1 to match),
    weekend flag, month boundaries. No input table at all: the spine
    materializes from constants, identically on both engines.

    Scale: 365 rows from one executor-side sequence explode — the
    generated dimension then BROADCASTS into fact joins (q_gap_fill /
    q_interp_linear build exactly this spine per key at run time).
    """
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-12-31").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("d")
    )
    return spine.select(
        F.col("d").cast("timestamp").alias("day"),
        F.year("d").cast("long").alias("yr"),
        F.quarter("d").cast("long").alias("qtr"),
        F.month("d").cast("long").alias("mo"),
        F.dayofweek("d").cast("long").alias("dow"),
        F.dayofweek("d").isin(1, 7).alias("is_weekend"),
        F.date_trunc("month", "d").alias("month_start"),
        F.last_day("d").cast("timestamp").alias("month_end"),
    )
