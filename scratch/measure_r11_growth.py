"""Round-11 growth-decade rows (VERDICT r10 item 8): the four round-10
operators that shipped with sf<=0.1 verification, cold fresh-plan
Spark (measure_cold_spark protocol) then DuckDB oracle medians,
SEQUENTIAL in one process. The DuckDB side for q_bpe_train /
q_pretrain_pipeline unrolls the full iteration chain — expect minutes
at sf10.
Usage: python scratch/measure_r11_growth.py /tmp/sf1.0 [names]
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
NAMES = (sys.argv[2].split(",") if len(sys.argv) > 2 else
         ["q_heavy_hitters", "q_bootstrap_ci", "q_bpe_train",
          "q_pretrain_pipeline"])
N = 3

from sas_etl_spark.registry import QUERIES, queries_map
from sas_etl_spark.session import get_spark

queries_map()
spark = get_spark(
    "r11growth", cpus=32, shuffle_partitions=64,
    extra_confs={"spark.ui.showConsoleProgress": "false",
                 "spark.driver.maxResultSize": "8g"},
)
import duckdb

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    for glob in (f"{d}/{t}.parquet", f"{d}/{t}.parquet/*.parquet"):
        try:
            con.execute(
                f"create or replace view {t} as select * from read_parquet('{glob}')")
            con.execute(f"select count(*) from {t}")
            break
        except Exception:
            continue

t0 = time.perf_counter()
spark.read.parquet(f"{d}/orders.parquet").count()
print(f"floor {1000 * (time.perf_counter() - t0):.1f} ms")

for name in NAMES:
    spec = QUERIES[name]
    ts = []
    for _ in range(N):
        t0 = time.perf_counter()
        spec.fn(spark, d).collect()  # fresh plan each sample = cold
        ts.append(time.perf_counter() - t0)
        print(f"  {name} spark sample {ts[-1]:.2f} s", flush=True)
    sm = statistics.median(ts)
    # heavy iterative oracles (bpe_train / pretrain unrolls): one
    # DuckDB sample is enough for an order-of-magnitude twin
    t0 = time.perf_counter()
    con.execute(spec.oracle).fetchall()
    dm = time.perf_counter() - t0
    print(f"{name:22s} spark {sm:8.2f} s   duckdb {dm:8.2f} s   ratio {sm/dm:5.2f}x")
