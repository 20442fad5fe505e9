"""Round-13 measurement: near-dup band-index maintenance economics at
sf1 (/tmp/sf1.0) — the cost shape VERDICT r12 item 1 targets: COW
append rewrites base ∪ batch (O(index)) per ingest; MOR publishes an
O(batch) bands_delta and defers the rewrite to one compaction. Also
reads the serve wall over the uncompacted delta (read-amplification
check)."""
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

SFDIR = os.environ.get("SFDIR", "/tmp/sf1.0")
WORK = os.environ.get("WORK", "/tmp/r13_nd_mor")

from pyspark.sql import functions as F  # noqa: E402

from sas_etl_spark.catalog import load_table  # noqa: E402
from sas_etl_spark.operators.minhash import (  # noqa: E402
    append_neardup_index,
    build_neardup_index,
    neardup_compact,
    neardup_query_index,
)
from sas_etl_spark.session import get_spark  # noqa: E402

spark = get_spark("r13-nd-mor", shuffle_partitions=32,
                  extra_confs={"spark.ui.showConsoleProgress": "false"})

docs = load_table(spark, SFDIR, "documents").select("doc_id", "text")
# master = 90% of the corpus; each ingest batch = a disjoint 2% slice
master = docs.filter(F.col("doc_id") % 10 != 0)
batches = [
    docs.filter((F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 50 == i * 10))
    for i in range(5)
]
print("master docs:", master.count(),
      "batch docs:", [b.count() for b in batches], flush=True)

t0 = time.perf_counter()
spark.range(10).toPandas()
print(f"floor_ms={1000 * (time.perf_counter() - t0):.1f}", flush=True)

for mode in ("cow", "mor"):
    d = os.path.join(WORK, mode)
    shutil.rmtree(d, ignore_errors=True)
    t = time.perf_counter()
    build_neardup_index(master, d)
    print(f"{mode}: build {time.perf_counter() - t:.1f}s", flush=True)
    walls = []
    for b in batches:
        t = time.perf_counter()
        append_neardup_index(b, d, mode=mode)
        walls.append(time.perf_counter() - t)
    print(f"{mode}: 5 appends {[round(w, 2) for w in walls]}", flush=True)
    # serve a probe batch over the current (mor: uncompacted) state
    probe = docs.filter(F.col("doc_id") % 97 == 0)
    t = time.perf_counter()
    n = neardup_query_index(spark, d, probe, docs, threshold=0.8).count()
    print(f"{mode}: serve over state {time.perf_counter() - t:.1f}s "
          f"({n} pairs)", flush=True)
    if mode == "mor":
        t = time.perf_counter()
        neardup_compact(spark, d)
        print(f"mor: compact {time.perf_counter() - t:.1f}s", flush=True)
        t = time.perf_counter()
        n2 = neardup_query_index(spark, d, probe, docs, threshold=0.8).count()
        print(f"mor: serve post-compact {time.perf_counter() - t:.1f}s "
              f"({n2} pairs)", flush=True)
        assert n2 == n
