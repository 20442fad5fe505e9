"""Round-8 late-addition measurements (quality-selection lane) at
sf0.1 and sf1 (/tmp/sf1.0) vs their DuckDB twins on identical parquet.
Median of 5, warm, plan reused across samples (bench.py protocol),
floor control in-session. Run gen_sf1_bench.py first; never
concurrently with another bench/pytest."""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from sas_etl_spark.catalog import TABLES
from sas_etl_spark.registry import QUERIES, queries_map
from sas_etl_spark.session import get_spark

# q_neardup_apply is EXCLUDED: its edge stage is the exact all-pairs
# scorer (q_dup_clusters class — O(n^2) on 5000+ docs both engines);
# attested at sf0.01, scale lane = LSH edges + linear apply.
NAMES = ["q_gopher_rules", "q_quality_prune", "q_span_dedup",
         "q_reservoir_sample", "q_temperature_mixture"]
N = 5

queries_map()
spark = get_spark("r8c-measure", cpus=32, shuffle_partitions=32)

def med(fn):
    fn()  # warm
    ts = []
    for _ in range(N):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3

floor_df = spark.range(10)
print(f"floor {med(floor_df.collect):.1f} ms")
for sf_dir, label in (("/root/testdata/sf0.1", "sf0.1"), ("/tmp/sf1.0", "sf1")):
    con = duckdb.connect()
    for t in TABLES:
        glob = f"{sf_dir}/{t}.parquet/*.parquet" if label == "sf1" else f"{sf_dir}/{t}.parquet"
        con.execute(f"create view {t} as select * from read_parquet('{glob}')")
    print(f"-- {label}")
    for name in NAMES:
        spec = QUERIES[name]
        df = spec.fn(spark, sf_dir)  # build once (bench protocol)
        s = med(df.collect)
        d = med(lambda: con.execute(spec.oracle).fetchall())
        print(f"{name:22s} spark {s:7.1f} ms   duck {d:8.1f} ms   ratio {s/d:5.2f}x", flush=True)
    con.close()
spark.stop()
