"""Corpus quality gates: rule-based document filtering and per-domain
quality pruning — the selection lane of an LLM training-data pipeline
(SURVEY.md §2.9; the Gopher/C4-style heuristic filters and the
"keep the best half of every source" pruning pass that follow scoring).

q_doc_quality (queries/llm.py) SCORES documents; these operators
DECIDE: q_gopher_rules evaluates the multi-rule gate per document, and
q_quality_prune materializes the per-source top-half selection — the
same plan→apply closure the mixture lane got in round 8
(q_mixture_epochs plans, q_mixture_apply executes).

Scale posture: the gate is pure scan-side column expressions (zero
shuffle); pruning aggregates a per-(source, score) HISTOGRAM instead of
ranking rows — the prefix-sum window walks distinct scores per source
(bounded by the score domain, ~1e6 ppm values), never the corpus, so
the few-group window trap (operators/quantiles.py docstring) cannot
appear at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.registry import query

#: Gate thresholds (Rae et al. 2021, Gopher §A1.1, adapted to the
#: fixture's closed-vocabulary text so every rule exercises both
#: branches at sf0.01 — see tests/test_quality_gates.py):
#: token count in [20, 90], mean word length in [4.0, 5.0] chars,
#: >= 2 stopword occurrences, duplicate-word fraction <= 0.6.
GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 90
GOPHER_MIN_WLEN = 4.0
GOPHER_MAX_WLEN = 5.0
GOPHER_MIN_STOPWORDS = 2
GOPHER_MAX_DUP_FRAC = 0.6
_STOPWORDS = ("the", "a", "of", "and", "to")


@query(
    "q_gopher_rules",
    oracle=f"""
    with t as (select doc_id, string_split(text, ' ') as toks, text
               from documents),
    m as (select doc_id,
                 cast(len(toks) as bigint) as n_tokens,
                 length(replace(text, ' ', '')) * 1.0 / len(toks)
                     as mean_wlen,
                 cast(len(list_filter(toks,
                      x -> list_contains({list(_STOPWORDS)!r}, x)))
                     as bigint) as n_stop,
                 1 - len(list_distinct(toks)) * 1.0 / len(toks)
                     as dup_frac
          from t)
    select doc_id, n_tokens,
           round(mean_wlen, 6) as mean_wlen,
           n_stop,
           round(dup_frac, 6) as dup_frac,
           cast(n_tokens between {GOPHER_MIN_TOKENS} and {GOPHER_MAX_TOKENS}
                as int) as ok_len,
           cast(mean_wlen between {GOPHER_MIN_WLEN} and {GOPHER_MAX_WLEN}
                as int) as ok_wlen,
           cast(n_stop >= {GOPHER_MIN_STOPWORDS} as int) as ok_stop,
           cast(dup_frac <= {GOPHER_MAX_DUP_FRAC} as int) as ok_rep,
           cast(n_tokens between {GOPHER_MIN_TOKENS} and {GOPHER_MAX_TOKENS}
                and mean_wlen between {GOPHER_MIN_WLEN} and {GOPHER_MAX_WLEN}
                and n_stop >= {GOPHER_MIN_STOPWORDS}
                and dup_frac <= {GOPHER_MAX_DUP_FRAC} as int) as pass_all
    from m
    """,
    tags=("text", "quality", "llm"),
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style multi-rule document gate (Rae et al. 2021 Table A1;
    the same shape as Dolma's and RefinedWeb's heuristic filters):
    every rule emits its own pass flag PLUS the combined verdict, the
    layout a curation audit needs — "how many documents fail, and on
    which rule" — rather than a bare boolean.

    Rules: token count in [20, 90], mean word length in [4.0, 5.0]
    chars, >= 2 stopword occurrences, duplicate-word fraction <= 0.6
    (module constants above). Flags are computed on the RAW
    metric values (rounding is display-only) with identical integer→
    double divisions on both engines, so boundary comparisons are
    IEEE-bit-identical.

    Scale: the token array is staged ONCE as a named column
    (interpreted HOFs get no CSE — the q_repetition_ratio lesson),
    then everything is one codegen Project per row: zero shuffle, and
    at 100 TB the gate fuses into the scan alongside the other quality
    passes (q_curation_pipeline pattern).
    """
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        "text",
        F.split("text", " ").alias("toks"),
    ).select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        (
            F.length(F.translate("text", " ", ""))
            * F.lit(1.0)
            / F.size("toks")
        ).alias("mean_wlen"),
        F.size(
            F.filter(
                "toks",
                lambda x: x.isin(*_STOPWORDS),
            )
        )
        .cast("long")
        .alias("n_stop"),
        (
            1 - F.size(F.array_distinct("toks")) * F.lit(1.0) / F.size("toks")
        ).alias("dup_frac"),
    )
    ok_len = F.col("n_tokens").between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS)
    ok_wlen = F.col("mean_wlen").between(GOPHER_MIN_WLEN, GOPHER_MAX_WLEN)
    ok_stop = F.col("n_stop") >= GOPHER_MIN_STOPWORDS
    ok_rep = F.col("dup_frac") <= GOPHER_MAX_DUP_FRAC
    return staged.select(
        "doc_id",
        "n_tokens",
        F.round("mean_wlen", 6).alias("mean_wlen"),
        "n_stop",
        F.round("dup_frac", 6).alias("dup_frac"),
        ok_len.cast("int").alias("ok_len"),
        ok_wlen.cast("int").alias("ok_wlen"),
        ok_stop.cast("int").alias("ok_stop"),
        ok_rep.cast("int").alias("ok_rep"),
        (ok_len & ok_wlen & ok_stop & ok_rep).cast("int").alias("pass_all"),
    )


@query(
    "q_quality_prune",
    oracle="""
    with t as (select doc_id, source, string_split(text, ' ') as toks
               from documents),
    sc as (select doc_id, source,
                  len(list_distinct(toks)) * 1000000 // len(toks)
                      as score_ppm
           from t),
    rk as (select *,
                  row_number() over (partition by source
                                     order by score_ppm desc, doc_id) as rn,
                  count(*) over (partition by source) as n
           from sc),
    kept as (select * from rk where rn <= (n + 1) // 2)
    select source,
           cast(max(n) as bigint) as n_total,
           cast(count(*) as bigint) as n_kept,
           cast(min(score_ppm) as bigint) as min_kept_ppm,
           round(avg(score_ppm), 6) as avg_kept_ppm,
           bit_xor(list_reduce(list_transform(range(1, 16),
                     j -> strpos('0123456789abcdef',
                                 substr(sha256(cast(doc_id as varchar)),
                                        j, 1)) - 1),
                   (a, x) -> a * 16 + x)) as id_digest
    from kept group by source
    """,
    tags=("text", "quality", "sample", "llm"),
)
def q_quality_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality pruning: keep the top ceil(n/2) documents of
    every source by lexical-diversity score — the "filter each domain
    to its best half" pass that sits between quality scoring and
    mixture planning in a corpus build (the selection step of
    RefinedWeb/FineWeb-style pipelines, SAS: PROC RANK + subsetting
    WHERE).

    The score is type-token ratio scaled to EXACT integer ppm
    (``distinct_tokens * 1000000 div tokens`` — BIGINT division on
    both engines, so score equality and ordering are engine-exact,
    never float-boundary-dependent). Selection is exact top-k with
    deterministic doc_id tiebreaks at the threshold score.

    The output verifies the SELECTION itself, not just its size: the
    per-source ``bit_xor`` of 60-bit doc_id digests is an
    order-insensitive SET fingerprint — one migrated/mis-kept document
    flips it.

    Scale (the histogram-rank pattern, operators/quantiles.py): rows
    are never ranked. A per-(source, score) histogram aggregates
    map-side; the descending prefix sum walks distinct scores per
    source (<= 1e6 ppm values, independent of corpus size); the
    threshold row is a broadcast-joined 1-row-per-source table; and
    the only row-level window partitions by (source, score) — each
    partition is the handful of docs sharing one exact score, never
    a source's whole corpus. Contrast: a row_number window
    partitioned by ~20 sources at 100 TB is ~5 TB sorted per task.
    """
    docs = load_table(spark, sf_dir, "documents")
    sc = docs.select(
        "doc_id", "source", F.split("text", " ").alias("toks")
    ).select(
        "doc_id",
        "source",
        F.expr(
            "cast(size(array_distinct(toks)) * 1000000L as bigint)"
            " div size(toks)"
        ).alias("score_ppm"),
    )
    hist = sc.groupBy("source", "score_ppm").agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("score_ppm"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "source", "score_ppm", "_c", F.sum("_c").over(w).alias("_cum")
    )
    n_tab = hist.groupBy("source").agg(F.sum("_c").alias("n_total"))
    k_tab = n_tab.select(
        "source", "n_total", F.expr("(n_total + 1) div 2").alias("_k")
    )
    # Threshold score per source: the highest score at which the
    # descending cumulative count first reaches k. Docs strictly above
    # it are all kept; the remainder of the budget comes from the
    # boundary score, doc_id-ascending.
    thr = (
        cum.join(F.broadcast(k_tab), "source")
        .filter(F.col("_cum") >= F.col("_k"))
        .groupBy("source")
        .agg(
            F.max("score_ppm").alias("_thr"),
            F.expr("max_by(_cum - _c, score_ppm)").alias("_n_above"),
            F.first("_k").alias("_k"),
            F.first("n_total").alias("n_total"),
        )
    )
    # One pass over the scored corpus: docs above the threshold keep
    # unconditionally; docs AT it keep by doc_id rank within their
    # (source, score) cell — a window whose partitions are the docs
    # sharing one exact score, tiny by construction, never the corpus.
    scored = sc.join(F.broadcast(thr), "source")
    w_cell = Window.partitionBy("source", "score_ppm").orderBy("doc_id")
    kept = scored.withColumn("_rn", F.row_number().over(w_cell)).filter(
        (F.col("score_ppm") > F.col("_thr"))
        | (
            (F.col("score_ppm") == F.col("_thr"))
            & (F.col("_rn") <= F.col("_k") - F.col("_n_above"))
        )
    )
    digest = F.conv(
        F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 15),
        16,
        10,
    ).cast("long")
    return kept.groupBy("source").agg(
        F.first("n_total").alias("n_total"),
        F.count(F.lit(1)).alias("n_kept"),
        F.min("score_ppm").alias("min_kept_ppm"),
        F.round(F.avg("score_ppm"), 6).alias("avg_kept_ppm"),
        F.bit_xor(digest).alias("id_digest"),
    )


# -- DSIR importance weights ------------------------------------------

#: The target domain whose distribution DSIR selects toward.
DSIR_TARGET = "src0"


@query(
    "q_dsir_weights",
    oracle=f"""
    with tok as (
        select doc_id, source, unnest(string_split(text, ' ')) as term
        from documents
    ),
    raw as (select term, count(*) as cr from tok group by term),
    rawstats as (
        select cast(sum(cr) as double) as nr,
               cast(count(*) as double) as v
        from raw
    ),
    tgt as (
        select term, count(*) as ct from tok
        where source = '{DSIR_TARGET}' group by term
    ),
    tgtstats as (
        select cast(count(*) as double) as nt from tok
        where source = '{DSIR_TARGET}'
    ),
    lr as (
        select raw.term,
               ln((coalesce(ct, 0) + 1) / (nt + v))
               - ln((cr + 1) / (nr + v)) as lr
        from raw left join tgt using (term)
        cross join rawstats cross join tgtstats
    ),
    perdoc as (
        select doc_id, source, round(sum(lr), 6) as w
        from tok join lr using (term)
        group by doc_id, source
    )
    select source,
           cast(count(*) as bigint) as n_docs,
           round(avg(w), 6) as avg_weight,
           cast(sum(case when w > 0 then 1 else 0 end) as bigint)
               as n_selected
    from perdoc
    group by source
    """,
    tags=("llm", "quality", "sample"),
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw-corpus
    document by the log-likelihood ratio of a target-domain unigram LM
    to the raw-corpus unigram LM, then resample toward the target
    distribution. Here the target is the DSIR_TARGET ('src0') source, both
    LMs are add-one-smoothed over the raw vocabulary, and per-doc
    weight w = sum over tokens of ln(p_target(t)) - ln(p_raw(t)),
    rounded 6dp. The per-source readout (mean weight + count with
    w > 0, i.e. docs the resampler favors) is the selection audit: the
    target source must dominate, and sources lexically near it score
    next — exactly the paper's "proxy for the target" behavior. DSIR
    hashes n-grams into a bounded feature space to cap the LM tables;
    the fixture's closed vocabulary IS that bounded space, so exact
    unigram features here have the same table-size posture.

    Scale: both LM tables are vocab-bounded aggregates (map-side
    combined; DSIR's feature hashing caps them at any corpus size) and
    broadcast back onto the token stream; the only corpus-sized
    shuffles are the per-doc weight groupBy and the final per-source
    rollup. No window, no all-pairs anything."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    tok = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("term")
    )
    raw = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cr"))
    rawstats = raw.agg(
        F.sum("cr").cast("double").alias("nr"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    in_target = F.col("source") == DSIR_TARGET
    tgt = (
        tok.filter(in_target)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    tgtstats = tok.filter(in_target).agg(
        F.count(F.lit(1)).cast("double").alias("nt")
    )
    lr = (
        raw.join(tgt, "term", "left")
        .crossJoin(F.broadcast(rawstats))
        .crossJoin(F.broadcast(tgtstats))
        .select(
            "term",
            (
                F.log(
                    (F.coalesce("ct", F.lit(0)) + 1)
                    / (F.col("nt") + F.col("v"))
                )
                - F.log((F.col("cr") + 1) / (F.col("nr") + F.col("v")))
            ).alias("lr"),
        )
    )
    perdoc = (
        tok.join(F.broadcast(lr), "term")
        .groupBy("doc_id", "source")
        .agg(F.round(F.sum("lr"), 6).alias("w"))
    )
    return perdoc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("w"), 6).alias("avg_weight"),
        F.sum((F.col("w") > 0).cast("long")).alias("n_selected"),
    )
