"""Corpus-indexing queries: inverted index, skip-gram co-occurrence,
and per-dimension embedding statistics — the IR/representation-
learning prep stages of a corpus pipeline.

SAS analogs are loose (SAS has no IR surface): PROC FREQ over
SCAN-loop outputs for the index and co-occurrence tables, PROC MEANS
over a transposed array for the dimension stats. The Spark forms are
the idiomatic ones: explode/posexplode + aggregation, with plan
shapes that hold at corpus scale (notes per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.registry import query

# -- inverted index ---------------------------------------------------

MIN_DF = 10
POSTING_CAP = 5


@query(
    "q_inverted_index",
    oracle=f"""
    with pairs as (
        select distinct word, doc_id
        from (select doc_id, unnest(string_split(text, ' ')) as word
              from documents) t
    ),
    agg as (
        select word, count(*) as df,
               list(doc_id order by doc_id) as all_postings
        from pairs group by word
    )
    select word, cast(df as bigint) as df,
           array_to_string(list_slice(all_postings, 1, {POSTING_CAP}), ',')
               as postings
    from agg where df >= {MIN_DF}
    """,
    tags=("text", "llm"),
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: per term, document frequency + the first
    {POSTING_CAP} doc ids of its posting list (IR: the index behind
    keyword retrieval; SAS: SCAN-loop OUTPUT + PROC SORT NODUPKEY +
    PROC FREQ).

    Scale: (word, doc_id) pairs dedup map-side via the distinct's
    partial aggregate; posting lists build as sorted arrays per term.
    Real web-scale postings exceed single-task memory — there the cap
    becomes a windowed top-k BEFORE collect (same plan shape, bounded
    state); the df count is exact either way.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).distinct()
    # postings emit as a comma-joined string: the capped head of the
    # sorted posting list, value-identical across engines and friendly
    # to the driver's column-wise row sort (array cells don't order).
    agg = pairs.groupBy("word").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(
            F.transform(
                F.slice(
                    F.sort_array(F.collect_list("doc_id")), 1, POSTING_CAP
                ),
                lambda d: d.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )
    return agg.filter(F.col("df") >= MIN_DF).select(
        "word", "df", "postings"
    )


# -- skip-gram co-occurrence -----------------------------------------

SKIP_WINDOW = 2
TOP_PAIRS = 20


@query(
    "q_skipgrams",
    oracle=f"""
    with pos as (
        select doc_id,
               unnest(generate_series(1, len(string_split(text, ' '))))
                   as pos,
               unnest(string_split(text, ' ')) as word
        from documents
    )
    select p1.word as w1, p2.word as w2, cast(count(*) as bigint) as c
    from pos p1
    join pos p2 on p2.doc_id = p1.doc_id
               and p2.pos > p1.pos and p2.pos <= p1.pos + {SKIP_WINDOW}
    group by p1.word, p2.word
    order by c desc, w1, w2
    limit {TOP_PAIRS}
    """,
    tags=("text", "llm"),
)
def q_skipgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram co-occurrence counts within a +/-{SKIP_WINDOW} token
    window (word2vec/GloVe training prep; SAS: LAG chains + PROC
    FREQ).

    Positions come from ONE posexplode pass; the pair generation is a
    doc-keyed equi-join with a position-range residual — work bounded
    by tokens x window, never tokens^2. Top-20 ties break on the word
    pair for a deterministic limit.

    Scale: the join key is doc_id, so co-occurrence never crosses
    documents — both sides partition identically and AQE can pick a
    shuffle-hash join; the pair agg combines map-side (vocab^2 is
    far smaller than the pair stream).
    """
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "word"),
    )
    p1 = pos.alias("p1")
    p2 = pos.alias("p2")
    joined = p1.join(
        p2,
        (F.col("p2.doc_id") == F.col("p1.doc_id"))
        & (F.col("p2.pos") > F.col("p1.pos"))
        & (F.col("p2.pos") <= F.col("p1.pos") + SKIP_WINDOW),
    )
    return (
        joined.groupBy(
            F.col("p1.word").alias("w1"), F.col("p2.word").alias("w2")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w1"), F.asc("w2"))
        .limit(TOP_PAIRS)
    )


# -- per-dimension embedding statistics ------------------------------


@query(
    "q_embed_dim_stats",
    oracle="""
    with d as (
        select unnest(generate_series(1, len(embedding))) as dim,
               unnest(embedding) as v
        from embeddings
    )
    select dim, cast(count(*) as bigint) as n,
           round(avg(cast(v as double)), 6) as mean,
           round(stddev_samp(cast(v as double)), 6) as std,
           min(v) as vmin, max(v) as vmax
    from d group by dim
    """,
    tags=("similarity", "llm", "quality"),
)
def q_embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics (embedding QA: dead or
    exploding dimensions, normalization drift before indexing; SAS:
    PROC MEANS over a transposed ARRAY).

    posexplode flattens vectors to (dim, value) — 64 groups regardless
    of corpus size, so the agg output is constant and the shuffle
    carries only partial aggregates. min/max stay float32
    (comparison-only, engine-exact); mean/std compute in double and
    round 6dp (summation-order drift ~1e-13 « rounding grain).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        F.posexplode("embedding").alias("dim0", "v")
    ).select((F.col("dim0") + 1).cast("long").alias("dim"), "v")
    return flat.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.col("v").cast("double")), 6).alias("mean"),
        F.round(F.stddev_samp(F.col("v").cast("double")), 6).alias("std"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    )
