"""Round-12: scan-side incremental near-dup vs persisted-index serve
at sf1 — quantifies the amortization the index regime buys (the
master signature pass paid once at build instead of per ingest)."""
import sys
import time

sys.path.insert(0, "/root/repo")

from sas_etl_spark.queries.audit_governance import _neardup_fixture
from sas_etl_spark.operators.minhash import (
    build_neardup_index,
    near_dup_pairs_between,
    neardup_query_index,
)
from sas_etl_spark.session import get_spark

SFDIR = "/tmp/sf1.0"
spark = get_spark("r12-neardup-idx", cpus=32, shuffle_partitions=32)
batch, master = _neardup_fixture(spark, SFDIR)
batch.count(); master.count()  # warm scans

t0 = time.perf_counter()
spark.range(10).toPandas()
print(f"floor_ms={1000*(time.perf_counter()-t0):.1f}", flush=True)

for label in ("scan_side_1", "scan_side_2"):
    t0 = time.perf_counter()
    n = near_dup_pairs_between(batch, master, threshold=0.8).count()
    print(f"{label} s={time.perf_counter()-t0:.2f} pairs={n}", flush=True)

t0 = time.perf_counter()
build_neardup_index(master, "/tmp/r12_nd_idx")
print(f"index_build s={time.perf_counter()-t0:.2f}", flush=True)

for label in ("index_serve_1", "index_serve_2"):
    t0 = time.perf_counter()
    n = neardup_query_index(spark, "/tmp/r12_nd_idx", batch, master, 0.8).count()
    print(f"{label} s={time.perf_counter()-t0:.2f} pairs={n}", flush=True)
