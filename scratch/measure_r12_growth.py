"""Round-12 growth/steady-state measurements (one quiet-box session):
1. q_pretrain_pipeline_prod cold one-shot at sf0.1 / sf1 / sf10 —
   the sub-quadratic LSH edge stage where the exact composite could
   only run sf1 (106.6 s) and sf10 was deliberately not run.
2. q_bm25 sf100 under the amended cold protocol: first fresh-plan
   pass (JIT/scan warmup) vs steady-state median of 3 further
   fresh-plan passes.
Floor control measured in-session; noop sink (no driver fetch)."""
import sys
import time

sys.path.insert(0, "/root/repo")

from sas_etl_spark.registry import QUERIES, queries_map
from sas_etl_spark.session import get_spark

queries_map()
spark = get_spark("r12-growth", cpus=32, shuffle_partitions=32)

t0 = time.perf_counter()
spark.range(10).toPandas()
print(f"floor_ms={1000 * (time.perf_counter() - t0):.1f}", flush=True)


def cold(name, sf_dir):
    t0 = time.perf_counter()
    QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


cold("q_pretrain_pipeline_prod", "/root/testdata/sf0.001")  # JIT warmup
t0 = time.perf_counter()
spark.range(10).toPandas()
print(f"floor_ms={1000 * (time.perf_counter() - t0):.1f}", flush=True)
for sf_dir in ("/root/testdata/sf0.1", "/tmp/sf1.0", "/tmp/sf10"):
    dt = cold("q_pretrain_pipeline_prod", sf_dir)
    print(f"pretrain_prod {sf_dir} cold_s={dt:.2f}", flush=True)

passes = [cold("q_bm25", "/tmp/sf100llm") for _ in range(4)]
import statistics

print(
    f"bm25 sf100 first_pass_s={passes[0]:.2f} "
    f"steady_median_s={statistics.median(passes[1:]):.2f} "
    f"all={['%.2f' % p for p in passes]}",
    flush=True,
)
