"""Generate DISTINCT-content documents fixtures (VERDICT r12 item 5,
text recipe reworked for r13 item 4): /tmp/ddup_sf1 (50k docs) and
/tmp/ddup_sf10 (500k docs), same schema as the stock documents table,
but every doc's text is a unique seeded token sequence — so exact
dedup does NOT collapse the corpus and the dedup/pretrain growth rows
measure distinct-corpus scaling, not replication-collapse. A
controlled near-dup structure is planted: every doc_id % 10 == 7 is a
one-token-appended variant of doc_id - 7's text (Jaccard s/(s+1) >=
0.8 like the attest fixture), giving the LSH candidate stage real
work at a known ~10% rate.

Round-14 rework (VERDICT r13 item 4): the old 40-word short-token
vocab failed the Gopher gates wholesale (no stopwords, mean word
length out of range, dup_frac > 0.6), so q_pretrain_pipeline_prod's
FINAL relation was empty on these fixtures. The text is now a
GATE-PASSING mix by construction: every 5th token is a stopword
(n_stop = n_tok // 5 >= 4 at the 20-token minimum), content tokens
are 5-char seeded syllable words from a 320-word vocab (mean_wlen
lands deterministically in [4.2, 4.6] — content 0.8 x 5 chars plus
stopwords averaging 1-3), and dup_frac stays ~0.2 (64 draws from 320
words). The planted " zzz" variant keeps every gate satisfied too
(one extra 3-char token moves mean_wlen by < 0.07 and n_tokens to at
most 81 < 90).

All generation is JVM-side expressions (xxhash64-seeded token picks,
no Python), so the 500k-doc fixture writes in seconds.
"""
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from sas_etl_spark.session import get_spark

#: 320 distinct 5-char content words: syllable pairs + a closing
#: consonant, deterministic and readable enough to eyeball.
_CONS = "bcdfghklmnprstvz"  # 16
_VOWS = "aeiou"  # 5
VOCAB = [
    _CONS[i % 16] + _VOWS[(i // 16) % 5] + _CONS[(i // 80) % 16]
    + _VOWS[(i // 1280) % 5] + "rstn"[i % 4]
    for i in range(320)
]
assert len(set(VOCAB)) == 320 and all(len(w) == 5 for w in VOCAB)
STOPWORDS = ["the", "a", "of", "and", "to"]
LANGS = ["en", "es", "zh", "de", "fr"]

spark = get_spark("gen_distinct_docs", shuffle_partitions=32)

for dst, n_docs in (("/tmp/ddup_sf1", 50_000), ("/tmp/ddup_sf10", 500_000)):
    base = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    # 20-80 tokens, length seeded by doc id; every 5th token a
    # stopword (positions 5, 10, ... — n_stop = n_tok // 5 >= 4),
    # content tokens 5-char words from the 320-word vocab
    n_tok = (F.pmod(F.xxhash64(F.lit(17), "doc_id"), F.lit(61)) + 20)
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    stops = F.array(*[F.lit(w) for w in STOPWORDS])
    toks = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.when(
            i % 5 == 0,
            F.element_at(
                stops,
                (F.pmod(F.xxhash64(F.col("doc_id"), i, F.lit(23)), F.lit(5)) + 1)
                .cast("int"),
            ),
        ).otherwise(
            F.element_at(
                vocab,
                (F.pmod(F.xxhash64(F.col("doc_id"), i), F.lit(len(VOCAB))) + 1)
                .cast("int"),
            )
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
