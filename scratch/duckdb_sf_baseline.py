"""DuckDB medians on a replicated bench dir (/tmp/sf1.0, /tmp/sf10)
— the baseline twin for the scale-up Spark bench (SCALE.md).
Usage: python scratch/duckdb_sf_baseline.py /tmp/sf10
"""
import statistics, sys, time
sys.path.insert(0, "/root/repo")
import duckdb
from sas_etl_spark.registry import QUERIES, queries_map

queries_map()
bench = {n: s.oracle for n, s in sorted(QUERIES.items()) if "bench" in s.tags}
con = duckdb.connect()
d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"create view {t} as select * from read_parquet('{d}/{t}.parquet/*.parquet')")
total = 0.0
for name, sql in bench.items():
    con.execute(sql).fetchall()  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        rows = con.execute(sql).fetchall()
        ts.append(time.perf_counter() - t0)
    m = statistics.median(ts)
    total += m
    print(f"{name:22s} {m*1000:8.1f} ms  rows {len(rows)}")
print(f"{'TOTAL':22s} {total*1000:8.1f} ms")
