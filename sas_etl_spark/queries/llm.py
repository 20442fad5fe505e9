"""LLM-data-pipeline queries (SURVEY.md §2.9): dedup, text analysis,
vector similarity over the documents/embeddings fixtures."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.operators.dedup import exact_dup_counts
from sas_etl_spark.operators.similarity import cosine_topk
from sas_etl_spark.operators.text import top_terms
from sas_etl_spark.registry import query


@query(
    "q_text_tokens",
    oracle="""
    select word, count(*) as c
    from (select unnest(string_split(text, ' ')) as word from documents) t
    group by word
    order by c desc, word
    limit 20
    """,
    tags=("bench", "text"),
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + top-20 terms (SAS: SCAN loop + PROC FREQ).
    SURVEY.md §2.9 #54.

    explode(split) -> partial-agg count; word tiebreak makes the
    limit-20 boundary deterministic on both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    return top_terms(docs, 20)


@query(
    "q_exact_dup",
    oracle="""
    select text, count(*) as c
    from documents
    group by text
    having count(*) > 1
    order by c desc, text
    limit 20
    """,
    tags=("bench", "dedup"),
)
def q_exact_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate documents (LLM dedup #51; SAS: PROC SORT
    DUPOUT / PROC SQL HAVING count>1).

    Groups on raw text here (fixture docs are short); the 100 TB
    variant groups on sha2(text) via exact_dup_counts(hash_col=...) to
    shrink the shuffle — same operator, one flag.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        exact_dup_counts(docs, ["text"])
        .orderBy(F.desc("c"), F.asc("text"))
        .limit(20)
    )


@query(
    "q_knn_cosine",
    oracle="""
    with q as (select embedding as qv from embeddings where vec_id = 0),
    scored as (
        select e.vec_id,
               cast(list_cosine_similarity(e.embedding, q.qv) as double) as sim_raw
        from embeddings e, q
        where e.vec_id <> 0
    )
    select vec_id, round(sim_raw, 4) as sim
    from scored
    order by sim_raw desc
    limit 10
    """,
    tags=("bench", "similarity"),
)
def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors of vector 0 (SURVEY.md §2.9 #53).

    Query vector broadcast -> map-side cosine via zip_with/aggregate
    (JVM codegen, no UDF) -> TakeOrderedAndProject. sim rounded to 4dp
    on both sides: DuckDB computes in float32, Spark in double; raw
    values differ ~1e-7.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    topk = cosine_topk(emb.filter(F.col("vec_id") != 0), qv, k=10, sim_col="sim_raw")
    return topk.select("vec_id", F.round("sim_raw", 4).alias("sim"))
