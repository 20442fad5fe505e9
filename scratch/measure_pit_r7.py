"""Round-7 decomposition of q_point_in_time_join's latency (VERDICT r6
item 3): is the 4.3x-vs-DuckDB gap plan time or the 150k-row Arrow
fetch? Measure both engines twice at sf0.1 — (a) full-result fetch as
the bench does, (b) the same plan under an agg(count, sum) tail that
reduces the fetch to ONE row — and report medians."""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import functions as F

from sas_etl_spark.queries.cdc import q_point_in_time_join
from sas_etl_spark.registry import QUERIES, queries_map
from sas_etl_spark.session import get_spark

SF = "/root/testdata/sf0.1"
N = 7

spark = get_spark("pit-measure", cpus=32, shuffle_partitions=32)

def timed(fn):
    ts = []
    for _ in range(N):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), statistics.median(ts)

df = lambda: q_point_in_time_join(spark, SF)
agg_tail = lambda d: d.agg(
    F.count(F.lit(1)).alias("n"), F.round(F.sum("bal_at_order"), 2).alias("s")
)

full_min, full_med = timed(lambda: df().collect())
agg_min, agg_med = timed(lambda: agg_tail(df()).collect())

queries_map()
sql = QUERIES["q_point_in_time_join"].oracle
con = duckdb.connect()
for t in ("customer", "orders"):
    con.execute(
        f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')"
    )
d_full_min, d_full_med = timed(lambda: con.execute(sql).fetchall())
d_agg_min, d_agg_med = timed(
    lambda: con.execute(
        f"select count(*) as n, round(sum(bal_at_order),2) as s from ({sql})"
    ).fetchall()
)

print(f"spark full  fetch: min {full_min*1e3:7.1f} ms  med {full_med*1e3:7.1f} ms")
print(f"spark agg   tail : min {agg_min*1e3:7.1f} ms  med {agg_med*1e3:7.1f} ms")
print(f"duck  full  fetch: min {d_full_min*1e3:7.1f} ms  med {d_full_med*1e3:7.1f} ms")
print(f"duck  agg   tail : min {d_agg_min*1e3:7.1f} ms  med {d_agg_med*1e3:7.1f} ms")
print(f"plan-time ratio (agg tails, med): {agg_med/d_agg_med:.2f}x")
print(f"full ratio (med): {full_med/d_full_med:.2f}x")
spark.stop()
