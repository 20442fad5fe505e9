"""Cold fresh-plan Spark medians — the round-9 protocol correction.

The r7-era protocol (build the DataFrame once, time repeated
collect()) was adopted to exclude Catalyst re-analysis noise, but a
re-collected DataFrame also REUSES its shuffle map outputs (Spark
keeps the ShuffleDependency's files for the plan's lifetime), so warm
medians exclude scan+shuffle engine work entirely — measured at
sf100: q_ngram_diversity 66.7 s cold vs 66 ms warm. DuckDB re-executes
fully every run, so warm-vs-warm comparisons flatter Spark at any SF
where engine work exceeds the job floor.

This script times each sample on a FRESH DataFrame (new Catalyst plan
-> no shuffle reuse). Re-analysis (~0.1-0.9 s driver-side) is included
— negligible at the SFs where cold numbers matter and the reason this
protocol is wrong for the floor-bound sf0.1 bench (see SCALE.md).

Usage: python scratch/measure_cold_spark.py DIR q_a,q_b[,...] [n]
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

d = sys.argv[1]
names = sys.argv[2].split(",")
N = int(sys.argv[3]) if len(sys.argv) > 3 else 3

from sas_etl_spark.registry import QUERIES, queries_map
from sas_etl_spark.session import get_spark

queries_map()
spark = get_spark(
    "cold_spark", cpus=32, shuffle_partitions=64,
    extra_confs={"spark.driver.maxResultSize": "8g"},
)


def floor():
    t0 = time.perf_counter()
    spark.range(10).collect()
    return time.perf_counter() - t0


floor()
print(f"floor {statistics.median(floor() for _ in range(5)) * 1000:.1f} ms",
      flush=True)
for name in names:
    QUERIES[name].fn(spark, d).toPandas()  # warm OS cache + JIT, discard
    ts = []
    for _ in range(N):
        # Time plan CONSTRUCTION + execution together: DuckDB's twin
        # includes parse/plan, and some operators execute eagerly at
        # build time (ivf's localCheckpoint'd centroids).
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, d).toPandas()  # FRESH plan every sample
        ts.append(time.perf_counter() - t0)
    print(f"{name:22s} cold-median {statistics.median(ts) * 1000:9.1f} ms",
          flush=True)
