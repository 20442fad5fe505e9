"""Third-decade scale check (VERDICT r8 item 7): the three growth
queries at /tmp/sf100g (orders+events only, gen_sf100_growth.py) —
Spark medians then DuckDB medians, SEQUENTIAL in one process (the
round-7 lesson: never concurrent), floor control in-session.
Usage: python scratch/measure_sf100_growth.py [dir]
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

NAMES = ["q_window_rank", "q_sessionize", "q_dedup_firstlast"]
N = 5
d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100g"


def med(fn, n=N):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


from sas_etl_spark.registry import QUERIES, queries_map
from sas_etl_spark.session import get_spark

queries_map()
# q_window_rank's full-width ranked output is ~13.5M rows (~3 GiB
# serialized) at this scale — raise the driver's result cap for the
# bench harness's own materialization (DuckDB's twin holds the same
# result in the client process).
spark = get_spark(
    "sf100g", cpus=32, shuffle_partitions=64,
    extra_confs={"spark.driver.maxResultSize": "8g"},
)
floor_df = spark.range(10)
print(f"floor {med(floor_df.collect) * 1000:.1f} ms", flush=True)
spark_ms = {}
for name in NAMES:
    df = QUERIES[name].fn(spark, d)
    # Arrow materialization (the bench.py protocol): q_window_rank
    # keeps ~3 rows/customer = 13.5M output rows at this scale, and
    # py4j .collect() spends minutes building Row objects — driver
    # client overhead, not engine work. DuckDB's twin below gets the
    # same treatment (fetch_arrow_table, not Python-object fetchall).
    spark_ms[name] = med(df.toPandas) * 1000
    print(f"{name:20s} spark {spark_ms[name]:9.1f} ms", flush=True)
spark.stop()

import duckdb

con = duckdb.connect()
for t in ("orders", "events"):
    con.execute(
        f"create view {t} as select * from read_parquet('{d}/{t}.parquet/*.parquet')"
    )
for name in NAMES:
    sql = QUERIES[name].oracle
    dms = med(lambda: con.execute(sql).fetch_arrow_table(), n=3) * 1000
    print(
        f"{name:20s} duck {dms:9.1f} ms   ratio {spark_ms[name] / dms:5.2f}x",
        flush=True,
    )
