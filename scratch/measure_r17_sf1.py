"""Round-17 sf1 noop-sink measurements (VERDICT r16 item 3): prove the
r16 + r17 optimization wins at a compute-dominated scale factor, on a
quiet box, against the per-pass job floor.

Measures plan-BUILD ms (driver-side fn() call) and noop EXEC ms
(fresh plan executed to the noop sink) for the r16-optimized lanes
(BM25 / n-gram / mixture / span) and the r17-touched lanes
(token_ngrams consumers), at $SF_DIR (default /tmp/sf1.0 from
scratch/gen_sf1_bench.py; Spark writes table dirs there, so the
fixture layout differs from /root/testdata — load_table handles
both).

Usage: python scratch/measure_r17_sf1.py [out.json]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SF_DIR", "/tmp/sf1.0")
REPS = int(os.environ.get("REPS", "5"))
NAMES = os.environ.get(
    "ONLY",
    "q_bm25,q_ngram_diversity,q_mixture_apply,q_span_dedup,"
    "q_repetition_ratio,q_ngram_contamination,q_bloom_contamination",
).split(",")

from sas_etl_spark.registry import QUERIES, queries_map  # noqa: E402
from sas_etl_spark.session import get_spark  # noqa: E402

queries_map()
spark = get_spark(
    "r17-sf1",
    shuffle_partitions=8,
    extra_confs={"spark.ui.showConsoleProgress": "false"},
)
sc = spark.sparkContext

# warm each plan once (codegen, broadcast, file listing)
for n in NAMES:
    QUERIES[n].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
floor_df = spark.range(10)
floor_df.toPandas()

build = {n: [] for n in NAMES}
noop = {n: [] for n in NAMES}
floors = []
for _ in range(REPS):
    t0 = time.perf_counter()
    floor_df.toPandas()
    floors.append(time.perf_counter() - t0)
    for n in NAMES:
        sc.setJobDescription(f"{n}: build")
        t0 = time.perf_counter()
        df = QUERIES[n].fn(spark, SF_DIR)
        build[n].append(time.perf_counter() - t0)
        sc.setJobDescription(f"{n}: noop")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        noop[n].append(time.perf_counter() - t0)
        sc.setJobDescription(None)

out = {
    "sf_dir": SF_DIR,
    "reps": REPS,
    "floor_ms": round(statistics.median(floors) * 1000, 1),
    "build_ms": {n: round(statistics.median(v) * 1000, 1) for n, v in build.items()},
    "noop_ms": {n: round(statistics.median(v) * 1000, 1) for n, v in noop.items()},
    "noop_all_ms": {n: [round(x * 1000) for x in v] for n, v in noop.items()},
}
print(json.dumps(out, indent=2))
if len(sys.argv) > 1:
    with open(sys.argv[1], "w") as fh:
        json.dump(out, fh, indent=2)
spark.stop()
