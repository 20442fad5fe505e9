"""Round-14 bloom-geometry measurement (VERDICT r13 item 3).

Re-runs the round-13 decontamination economics on the distinct-content
fixtures with m DERIVED by the shipped rule (queries.llm.bloom_m_for:
next pow2 >= 32 bits per distinct eval gram, clamped [2^20, 2^27])
instead of the old fixed 2^20. Reports, per fixture: derived m, bloom
load, survivor grams vs true-hit grams (the FP tail the exact verify
join removes), and walls vs the exact twin. Expectation: survivors ~=
true hits at BOTH scales (the r13 fixed geometry read 43x at sf10).

Run: python scratch/measure_r14_bloom.py   (needs /tmp/ddup_sf{1,10}
from scratch/gen_distinct_docs.py).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from sas_etl_spark.queries.llm import _BLOOM_K, bloom_m_for
from sas_etl_spark.session import get_spark

spark = get_spark(extra_confs={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

from sas_etl_spark.operators.text import token_ngrams

for sf_dir in ("/tmp/ddup_sf1", "/tmp/ddup_sf10"):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % 97 == 7).alias("_is_eval"),
        F.split("text", " ").alias("_toks"),
    )
    grams = toks.select(
        "doc_id",
        "_is_eval",
        F.explode(F.array_distinct(token_ngrams(F.col("_toks"), 13))).alias("gram"),
    )
    eval_grams = grams.filter("_is_eval").select("doc_id", "gram")
    train_grams = grams.filter(~F.col("_is_eval")).select("gram")

    # exact twin: distinct BOTH sides, shuffle join
    t = time.perf_counter()
    exact = (
        eval_grams.join(train_grams.distinct(), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared_grams"))
    )
    n_exact = exact.count()
    t_exact = time.perf_counter() - t

    # bloom path with the SHIPPED derived geometry
    t = time.perf_counter()
    eval_distinct = eval_grams.select("gram").distinct().localCheckpoint(eager=True)
    n_eval = eval_distinct.count()
    m = bloom_m_for(n_eval)

    def positions(col):
        return [F.pmod(F.xxhash64(F.lit(s), col), F.lit(m)) for s in range(_BLOOM_K)]

    bits = (
        eval_distinct.select(F.explode(F.array(*positions("gram"))).alias("bit"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_bits = bits.count()
    surv = train_grams
    for pos in positions("gram"):
        surv = surv.join(F.broadcast(bits), pos == bits["bit"], "left_semi")
    surv = surv.distinct().localCheckpoint(eager=True)
    n_surv = surv.count()
    bloom = (
        eval_grams.join(surv, "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared_grams"))
    )
    n_bloom = bloom.count()
    t_bloom = time.perf_counter() - t
    true_hits = eval_distinct.join(surv, "gram", "left_semi").count()
    assert n_bloom == n_exact
    tail = (n_surv - true_hits) / max(true_hits, 1)
    print(
        f"bloom {sf_dir}: n_eval_grams={n_eval} derived_m=2^{m.bit_length() - 1} "
        f"load={n_bits / m:.3f} survivors={n_surv} true_hit_grams={true_hits} "
        f"fp_tail={tail:.2f}x exact {t_exact:.1f}s bloom {t_bloom:.1f}s "
        f"({n_exact} docs)",
        flush=True,
    )
