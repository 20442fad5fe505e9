"""Retrieval / serving queries — the search side of an LLM data
platform: Okapi BM25 lexical scoring and reciprocal-rank-fusion
hybrid retrieval (lexical + embedding). SAS has no native analog
(closest: PROC SQL LIKE scans); these are the pipeline-native ops a
corpus index actually serves.

Both queries are pure relational plans: tokenize -> vocab-bounded
aggregations -> broadcast stat/rank tables -> TakeOrderedAndProject.
No UDFs, no collect, no per-query rescans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.registry import query

#: BM25 query terms — drawn from the fixture's closed vocabulary so
#: they match at every SF. Okapi parameters at the textbook defaults.
BM25_TERMS = ("spark", "join", "scan")
BM25_K1, BM25_B = 1.2, 0.75

#: RRF rank-smoothing constant (Cormack et al. 2009's k=60) and the
#: per-modality candidate-list depth feeding the fusion.
RRF_K, RRF_DEPTH = 60, 50

_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

#: Shared oracle CTE block: per-doc BM25 score over the query terms.
#: idf = ln(1 + (N-df+0.5)/(df+0.5)) (the non-negative Lucene form),
#: tf normalized by doc length against the corpus mean.
_BM25_ORACLE_CTES = f"""
    toks as (
        select doc_id, unnest(string_split(text, ' ')) as term
        from documents
    ),
    dl as (
        select doc_id, len(string_split(text, ' ')) as dl from documents
    ),
    stats as (
        -- avgdl from the EXACT integer token-count sum (one double
        -- division of identical integers in every engine) so the mean
        -- is independent of summation order / partitioning
        select count(*) as n,
               cast(sum(dl) as double) / count(*) as avgdl
        from dl
    ),
    tf as (
        select doc_id, term, count(*) as tf
        from toks where term in ({_TERMS_SQL})
        group by doc_id, term
    ),
    df as (select term, count(*) as df from tf group by term),
    bm25 as (
        select tf.doc_id,
               round(sum(
                   ln(1 + (n - df + 0.5) / (df + 0.5))
                   * tf * ({BM25_K1} + 1)
                   / (tf + {BM25_K1}
                          * (1 - {BM25_B} + {BM25_B} * dl.dl / avgdl))
               ), 6) as bm25
        from tf
        join df using (term)
        join dl on dl.doc_id = tf.doc_id
        cross join stats
        group by tf.doc_id
    )
"""


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Okapi BM25 over BM25_TERMS as a DataFrame plan.

    ZERO-SHUFFLE shape (r11 rewrite — VERDICT r10 item 5 profiled the
    old exploded-postings plan as the whole q_bm25/q_rrf_hybrid cold
    cost at sf100: tokenize+explode+two corpus-keyed exchanges +
    5M-row dl join ≈ 9.4 s): with a FIXED small term set, tf per doc
    is a row-local fold, not a corpus-wide (doc, term) aggregation.

    Pass 1 (stats, pure codegen): one scan computing doc count, mean
    token length, and per-term document frequencies via
    array_contains (early-exit, whole-stage codegen) — collapses to
    ONE broadcast row. Pass 2 (scoring): one scan computing the
    |terms| tf counters NATIVELY — tf_i = size(toks) -
    size(array_remove(toks, term_i)) — then the BM25 arithmetic
    against the broadcast stats row. No explode, no (doc, term)
    shuffle, no dl join; the only exchange left is the caller's
    TakeOrderedAndProject.

    r16 optimization (guide §4.1 "prefer built-ins over lambdas"):
    the r11 form folded the token array through one interpreted
    F.aggregate lambda; higher-order functions fall out of
    whole-stage codegen, and the tf-sum>0 filter Catalyst pushes
    below the small-fixture repartition re-evaluated that fold THREE
    more times per pre-shuffle row. The native per-term
    size-array_remove passes stay inside codegen, and the
    zero-matched-docs filter is arrays_overlap(toks, terms) — one
    early-exit traversal, same truth value as the old tf-sum>0.
    Measured sf0.1 noop: 954 -> 586 ms; hash-identical on the full
    score table (not just the top-20 cut). (The r11 note "fold was
    1.5x faster than per-term size(filter)" compared against the
    interpreted F.filter HOF, not against native array_remove.)

    Docs with zero matched terms are dropped, exactly the old
    inner-join semantics; a term with df = 0 keeps a finite idf and
    contributes exactly 0.0, so engines agree bit-for-bit before the
    shared 6dp round. tf values are exact integers either way, and
    the contrib-sum association order is unchanged, so the doubles
    are bit-identical.

    Small-fixture parallelism: a single-file corpus scans as ONE task
    (the sf0.1 fixture is one parquet file), serializing the fold; the
    provably-tiny gated repartition (_estimated_scan_tasks — same
    idiom as cosine_topk_literal's min_tasks) spreads it, and never
    fires at real scale where the scan is already parallel."""
    from sas_etl_spark.operators.similarity import _estimated_scan_tasks

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    min_tasks = spark.sparkContext.defaultParallelism
    est = _estimated_scan_tasks(docs)
    if est is not None and est < min_tasks:
        docs = docs.repartition(min_tasks)
    toks = docs.select("doc_id", F.split("text", " ").alias("_toks"))
    nt = len(BM25_TERMS)
    # avgdl from the EXACT long token-count sum, one double division
    # (ADVICE r11): F.avg over ints folds in DOUBLE, so the min_tasks
    # repartition above could flip a rounding-boundary mean run-to-run;
    # the integer sum is partitioning-independent by construction.
    stats = toks.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size("_toks").cast("long")).alias("_sdl"),
        *[
            F.sum(F.array_contains("_toks", t).cast("long")).alias(f"df{i}")
            for i, t in enumerate(BM25_TERMS)
        ],
    ).withColumn("avgdl", F.col("_sdl").cast("double") / F.col("n"))
    terms_arr = F.array(*[F.lit(t) for t in BM25_TERMS])
    per_doc = toks.filter(F.arrays_overlap("_toks", terms_arr)).select(
        "doc_id",
        F.size("_toks").alias("dl"),
        *[
            (F.size("_toks") - F.size(F.array_remove("_toks", t))).alias(
                f"tf{i}"
            )
            for i, t in enumerate(BM25_TERMS)
        ],
    )
    norm = BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))

    def contrib(i: int):
        tf = F.col(f"tf{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
        )
        return idf * tf * (BM25_K1 + 1) / (tf + norm)

    return per_doc.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        F.round(sum(contrib(i) for i in range(nt)), 6).alias("bm25"),
    )


@query(
    "q_bm25",
    oracle=f"""
    with {_BM25_ORACLE_CTES}
    select doc_id, bm25
    from bm25
    order by bm25 desc, doc_id
    limit 20
    """,
    tags=("text", "retrieval", "llm", "bench_llm"),
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for a fixed term query — the lexical
    retrieval op of a corpus index (what `grep the training set`
    actually means at scale; SAS closest analog: PROC SQL LIKE
    scans, which rescan every document per query).

    Score is the non-negative Lucene idf form with standard
    k1=1.2 / b=0.75 length normalization; both engines sum the same
    <=|terms| contributions per doc and round to 6dp before the cut,
    with doc_id tiebreak (registry LIMIT rule).

    Scale: the term IN-filter reaches the token stream BEFORE the
    (doc, term) shuffle, so postings for non-query terms never leave
    the scan; df and the corpus stats are vocab-bounded/1-row
    broadcasts; top-20 compiles to TakeOrderedAndProject. Serving
    many queries batches the same shape through one plan keyed by
    query_id — the inverted-index variant (corpus_index.py) trades
    this scan for a prebuilt postings table.
    """
    return (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


@query(
    "q_rrf_hybrid",
    oracle=f"""
    with {_BM25_ORACLE_CTES},
    lex as (
        select doc_id,
               row_number() over (order by bm25 desc, doc_id) as r_lex
        from bm25
    ),
    qv as (select embedding as qv from embeddings where vec_id = 0),
    sem_scored as (
        select e.vec_id as doc_id,
               round(cast(list_cosine_similarity(e.embedding, q.qv)
                          as double), 4) as sim
        from embeddings e, qv q
        where e.vec_id <> 0
    ),
    sem as (
        select doc_id,
               row_number() over (order by sim desc, doc_id) as r_sem
        from sem_scored
    ),
    fused as (
        select coalesce(l.doc_id, s.doc_id) as doc_id,
               round(coalesce(1.0 / ({RRF_K} + l.r_lex), 0)
                     + coalesce(1.0 / ({RRF_K} + s.r_sem), 0), 6)
                   as rrf,
               coalesce(l.r_lex, 0) as r_lex,
               coalesce(s.r_sem, 0) as r_sem
        from (select * from lex where r_lex <= {RRF_DEPTH}) l
        full outer join (select * from sem where r_sem <= {RRF_DEPTH}) s
            on l.doc_id = s.doc_id
    )
    select doc_id, rrf, cast(r_lex as bigint) as r_lex,
           cast(r_sem as bigint) as r_sem
    from fused
    order by rrf desc, doc_id
    limit 10
    """,
    tags=("retrieval", "similarity", "llm", "bench_llm"),
)
def q_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion — the standard way
    a modern corpus search combines a lexical (BM25) ranking with an
    embedding-cosine ranking without score calibration (RRF, Cormack
    et al. 2009): score = sum over lists of 1/(k + rank), k=60,
    top-50 candidates per modality, fused top-10.

    The two rankings join on the fixture's doc_id = vec_id identity
    (documents x embeddings); docs ranked by only one modality keep
    that modality's term (full outer join + coalesce, rank 0 marking
    absence in the output). Ranks are deterministic on both engines:
    row_number over (rounded score desc, id) — so the fused scores
    and the final cut hash-match exactly.

    Scale: each modality's candidate list is produced by its own
    scale path (BM25's filtered postings; the ANN operator replaces
    the exact cosine at corpus scale), and the fusion itself touches
    only 2 x RRF_DEPTH rows — broadcastable, output-bounded, one
    TakeOrderedAndProject. The global row_number windows here rank
    CANDIDATE LISTS (bounded), never the corpus.
    """
    from sas_etl_spark.operators.similarity import cosine

    # candidate cut FIRST via orderBy().limit() — TakeOrderedAndProject
    # (per-partition heap + driver merge of DEPTH rows), so the global
    # row_number window only ever ranks the bounded DEPTH-row result,
    # never the corpus-sized score relation in one partition.
    lex = (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(RRF_DEPTH)
        .withColumn(
            "r_lex",
            F.row_number().over(
                Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "r_lex")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    sem = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine("embedding", "qv"), 4).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(RRF_DEPTH)
        .withColumn(
            "r_sem",
            F.row_number().over(
                Window.orderBy(F.desc("sim"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "r_sem")
    )
    return (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (RRF_K + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("r_sem")), F.lit(0.0)),
                6,
            ).alias("rrf"),
            F.coalesce("r_lex", F.lit(0)).cast("long").alias("r_lex"),
            F.coalesce("r_sem", F.lit(0)).cast("long").alias("r_sem"),
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(10)
    )


#: Retrieval-eval knobs: ranking depth, graded-relevance source (how
#: many distinct query terms a doc contains, 0-3), binary-relevance
#: threshold for MRR/recall, and the metric cutoffs.
EVAL_DEPTH = 20
EVAL_REL_GRADE = 2
EVAL_KS = (5, 10, 20)

_KS_SQL = ", ".join(str(k) for k in EVAL_KS)


@query(
    "q_retrieval_eval",
    oracle=f"""
    with {_BM25_ORACLE_CTES},
    grades as (
        select doc_id, cast(least(tf, 3) as int) as g
        from tf where term = '{BM25_TERMS[0]}'
    ),
    ranked as (
        -- inner join: a ranked doc without the graded term simply has
        -- gain 0 and is not binary-relevant, so dropping its row is
        -- value-identical to keeping it at g = 0 for every metric.
        select b.r, g.g
        from (select doc_id,
                     row_number() over (order by bm25 desc, doc_id) as r
              from bm25) b
        join grades g using (doc_id)
        where b.r <= {EVAL_DEPTH}
    ),
    ideal as (
        select row_number() over (order by g desc, doc_id) as r, g
        from grades
        order by g desc, doc_id
        limit {EVAL_DEPTH}
    ),
    nrel as (
        select count(*) as n_rel from grades where g >= {EVAL_REL_GRADE}
    ),
    ks as (select unnest([{_KS_SQL}]) as k),
    got as (
        select k,
               sum((power(2, g) - 1) / log2(r + 1)) as dcg,
               min(case when g >= {EVAL_REL_GRADE} then r end) as first_rel,
               count(*) filter (where g >= {EVAL_REL_GRADE}) as rel_at_k
        from ranked, ks where r <= k group by k
    ),
    best as (
        select k, sum((power(2, g) - 1) / log2(r + 1)) as idcg
        from ideal, ks where r <= k group by k
    )
    select cast(got.k as bigint) as k,
           round(dcg / idcg, 6) as ndcg,
           round(coalesce(1.0 / first_rel, 0), 6) as mrr,
           round(rel_at_k * 1.0 / n_rel, 6) as recall
    from got join best using (k) cross join nrel
    """,
    tags=("retrieval", "llm", "quality"),
)
def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation of the BM25 ranking — nDCG@k,
    MRR@k, and recall@k at k in {5, 10, 20}, the standard IR readout
    (Järvelin & Kekäläinen's graded nDCG; TREC's MRR/recall) that
    closes the retrieval lane: q_bm25 ranks, q_rrf_hybrid fuses, this
    op MEASURES. Relevance is derived deterministically from the
    corpus itself — and INDEPENDENTLY of the ranker, so the metrics
    are discriminative, not tautological: grade = occurrences of the
    FIRST query term capped at 3 (the user's core intent; the other
    terms are query expansion the grade ignores), binary-relevant =
    grade >= 2. Gains follow the graded formula
    (2^g - 1) / log2(rank + 1); IDCG re-ranks by grade.

    Both engines produce identical ranks (6dp-rounded BM25 + doc_id
    tiebreak, the registry LIMIT rule) and round each final metric to
    6dp, so the three-row (k, ndcg, mrr, recall) readout hash-matches.

    Scale: the ranking cut is TakeOrderedAndProject (per-partition
    heap, never a corpus-wide window — the q_rrf_hybrid pattern); the
    grade relation aggregates only postings for the |terms| query
    terms; the ideal ranking cuts the same way on grade; every join
    after the cuts touches <= EVAL_DEPTH rows with the DEPTH side
    broadcast. Metric arithmetic happens on <= 20-row relations."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    grades = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") == BM25_TERMS[0])
        .groupBy("doc_id")
        .agg(F.least(F.count(F.lit(1)), F.lit(3)).cast("int").alias("g"))
    )
    # inner join (vs left-outer, which would force the corpus-sized
    # grades side to build): a ranked doc without the graded term has
    # gain 0 and is not binary-relevant, so dropping its row is
    # value-identical for every metric, and the 20-row side broadcasts.
    ranked = grades.join(
        F.broadcast(
            _bm25_scores(spark, sf_dir)
            .orderBy(F.desc("bm25"), F.asc("doc_id"))
            .limit(EVAL_DEPTH)
            .withColumn(
                "r",
                F.row_number().over(
                    Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
                ),
            )
        ),
        "doc_id",
    ).select("r", "g")
    ideal = (
        grades.orderBy(F.desc("g"), F.asc("doc_id"))
        .limit(EVAL_DEPTH)
        .withColumn(
            "r",
            F.row_number().over(Window.orderBy(F.desc("g"), F.asc("doc_id"))),
        )
        .select("r", "g")
    )
    nrel = grades.filter(F.col("g") >= EVAL_REL_GRADE).agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in EVAL_KS])).alias("k")
    )
    gain = (F.pow(F.lit(2.0), F.col("g")) - 1) / F.log2(F.col("r") + 1)
    rel = F.col("g") >= EVAL_REL_GRADE
    got = (
        ranked.crossJoin(F.broadcast(ks))
        .filter(F.col("r") <= F.col("k"))
        .groupBy("k")
        .agg(
            F.sum(gain).alias("dcg"),
            F.min(F.when(rel, F.col("r"))).alias("first_rel"),
            F.sum(rel.cast("long")).alias("rel_at_k"),
        )
    )
    best = (
        ideal.crossJoin(F.broadcast(ks))
        .filter(F.col("r") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum(gain).alias("idcg"))
    )
    return (
        got.join(best, "k")
        .crossJoin(F.broadcast(nrel))
        .select(
            F.col("k").cast("long").alias("k"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
            F.round(
                F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.round(F.col("rel_at_k") / F.col("n_rel"), 6).alias("recall"),
        )
    )
