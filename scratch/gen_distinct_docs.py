"""Generate DISTINCT-content documents fixtures (VERDICT r12 item 5):
/tmp/ddup_sf1 (50k docs) and /tmp/ddup_sf10 (500k docs), same schema
as the stock documents table, but every doc's text is a unique seeded
token sequence — so exact dedup does NOT collapse the corpus and the
dedup/pretrain growth rows measure distinct-corpus scaling, not
replication-collapse. A controlled near-dup structure is planted:
every doc_id % 10 == 7 is a one-token-appended variant of doc_id - 7's
text (Jaccard s/(s+1) >= 0.8 like the attest fixture), giving the
LSH candidate stage real work at a known ~10% rate.

All generation is JVM-side expressions (xxhash64-seeded token picks,
no Python), so the 500k-doc fixture writes in seconds.
"""
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from sas_etl_spark.session import get_spark

VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value",
    "part", "hash", "merge", "sort", "join", "filter", "window",
    "batch", "spark", "order", "data", "column", "small", "line",
    "customer", "query", "shuffle", "broadcast", "index", "list",
    "group", "count", "stage", "task", "plan", "codegen", "arrow",
    "parquet", "stream", "state", "delta", "snapshot",
]
LANGS = ["en", "es", "zh", "de", "fr"]

spark = get_spark("gen_distinct_docs", shuffle_partitions=32)

for dst, n_docs in (("/tmp/ddup_sf1", 50_000), ("/tmp/ddup_sf10", 500_000)):
    base = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    # 20-80 tokens, length seeded by doc id
    n_tok = (F.pmod(F.xxhash64(F.lit(17), "doc_id"), F.lit(61)) + 20)
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    toks = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.element_at(
            vocab,
            (F.pmod(F.xxhash64(F.col("doc_id"), i), F.lit(len(VOCAB))) + 1)
            .cast("int"),
        ),
    )
    docs = base.select(
        "doc_id",
        F.array_join(toks, " ").alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in LANGS]),
            (F.pmod(F.xxhash64(F.lit(3), "doc_id"), F.lit(len(LANGS))) + 1)
            .cast("int"),
        ).alias("lang"),
        F.concat(
            F.lit("src"),
            F.pmod(F.xxhash64(F.lit(5), "doc_id"), F.lit(20)).cast("string"),
        ).alias("source"),
    )
    # plant near-dups: doc_id % 10 == 7 becomes (text of doc_id - 7)
    # + " zzz" — one extra trailing shingle, Jaccard s/(s+1)
    donors = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 7).alias("doc_id"),
        F.concat("text", F.lit(" zzz")).alias("_t2"),
    )
    docs = (
        docs.join(donors, "doc_id", "left")
        .withColumn("text", F.coalesce("_t2", "text"))
        .drop("_t2")
        .withColumn("n_chars", F.length("text"))
    )
    docs.repartition(32).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
    )
    print(dst, spark.read.parquet(f"{dst}/documents.parquet").count())
