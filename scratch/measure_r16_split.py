"""Split each bench query's cold cost into plan-build vs execution.

For every bench/bench_llm query at $SPARK_GRAFT_SF_DIR:
  t_build  — median wall time of spec.fn(spark, sf) (Catalyst analysis
             happens lazily, so this is mostly Python DataFrame-API
             plus any driver-side collects the builder performs)
  t_noop   — median wall time of df.write.format('noop') on a FRESH
             plan built outside the timer (execution incl. optimize/
             codegen, no result fetch to Python)
  t_fetch  — median toPandas() on a resident plan minus noop, i.e.
             the Arrow fetch + final stage re-run residue

REPS samples each, round-robin, floor control per pass.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "5"))

from sas_etl_spark.registry import QUERIES, queries_map  # noqa: E402
from sas_etl_spark.session import get_spark  # noqa: E402

queries_map()
only = set(filter(None, os.environ.get("ONLY", "").split(",")))
specs = {
    n: s
    for n, s in sorted(QUERIES.items())
    if (n in only)
    or (not only and ("bench" in s.tags or "bench_llm" in s.tags))
}

spark = get_spark(
    "r16-split",
    shuffle_partitions=4,
    extra_confs={"spark.ui.showConsoleProgress": "false"},
)
sc = spark.sparkContext

# warm everything once
for n, s in specs.items():
    s.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
floor_df = spark.range(10)
floor_df.toPandas()

build = {n: [] for n in specs}
noop = {n: [] for n in specs}
fetch = {n: [] for n in specs}
floors = []
resident = {n: specs[n].fn(spark, SF_DIR) for n in specs}
for _ in range(REPS):
    t0 = time.perf_counter()
    floor_df.toPandas()
    floors.append(time.perf_counter() - t0)
    for n, s in specs.items():
        sc.setJobDescription(f"{n}: build")
        t0 = time.perf_counter()
        df = s.fn(spark, SF_DIR)
        build[n].append(time.perf_counter() - t0)
        sc.setJobDescription(f"{n}: noop exec")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        noop[n].append(time.perf_counter() - t0)
        sc.setJobDescription(f"{n}: resident fetch")
        t0 = time.perf_counter()
        resident[n].toPandas()
        fetch[n].append(time.perf_counter() - t0)
        sc.setJobDescription(None)

med = lambda xs: statistics.median(xs) * 1000  # noqa: E731
print(f"floor_ms={med(floors):8.1f}   sf={SF_DIR}")
print(f"{'query':28s} {'build_ms':>9s} {'noop_ms':>9s} {'warm_ms':>9s}")
tot_b = tot_n = 0.0
for n in specs:
    b, x, f = med(build[n]), med(noop[n]), med(fetch[n])
    tot_b += b
    tot_n += x
    print(f"{n:28s} {b:9.1f} {x:9.1f} {f:9.1f}")
print(f"{'TOTAL':28s} {tot_b:9.1f} {tot_n:9.1f}")
spark.stop()
