"""Round-13 growth rows over the DISTINCT-content fixtures (VERDICT
r12 item 5): q_pretrain_pipeline_prod and the near-dup serve ladder at
/tmp/ddup_sf1 (50k distinct docs) and /tmp/ddup_sf10 (500k) — corpora
where exact dedup does NOT collapse the input, so the measured slope
is distinct-corpus scaling. Run scratch/gen_distinct_docs.py first.
Protocol: one session per run is NOT needed — fresh fn() per sample
gives a fresh plan; floors printed."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from sas_etl_spark.catalog import load_table  # noqa: E402
from sas_etl_spark.registry import queries_map  # noqa: E402
from sas_etl_spark.session import get_spark  # noqa: E402

spark = get_spark("r13-distinct-growth", shuffle_partitions=32,
                  extra_confs={"spark.ui.showConsoleProgress": "false"})
Q = queries_map()

t0 = time.perf_counter()
spark.range(10).toPandas()
print(f"floor_ms={1000 * (time.perf_counter() - t0):.1f}", flush=True)

ONLY = os.environ.get("ONLY", "pretrain,neardup").split(",")

for sf_dir in ("/tmp/ddup_sf1", "/tmp/ddup_sf10"):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    distinct_text = docs.select("text").distinct().count()
    print(f"{sf_dir}: {n} docs, {distinct_text} distinct texts", flush=True)
    if "pretrain" in ONLY:
        t = time.perf_counter()
        out = Q["q_pretrain_pipeline_prod"](spark, sf_dir)
        rows = out.count()
        print(f"{sf_dir}: pretrain_prod {time.perf_counter() - t:.1f}s "
              f"({rows} rows)", flush=True)
    if "neardup" in ONLY:
        from sas_etl_spark.operators.minhash import (
            build_neardup_index,
            neardup_query_index,
        )

        d = f"/tmp/r13_ddup_idx_{os.path.basename(sf_dir)}"
        import shutil

        shutil.rmtree(d, ignore_errors=True)
        master = docs.filter(F.col("doc_id") % 10 != 7).select("doc_id", "text")
        batch = docs.filter(F.col("doc_id") % 10 == 7).select("doc_id", "text")
        t = time.perf_counter()
        build_neardup_index(master, d)
        print(f"{sf_dir}: index build {time.perf_counter() - t:.1f}s",
              flush=True)
        t = time.perf_counter()
        pairs = neardup_query_index(spark, d, batch, master, 0.8).count()
        print(f"{sf_dir}: index serve {time.perf_counter() - t:.1f}s "
              f"({pairs} pairs)", flush=True)
