#!/usr/bin/env python
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line with per-query median latency.

Protocol matches BASELINE.md: warm session (JVM startup and one
warm-up action excluded), median of 3 timed runs per query, full
result materialization (collect) per run.
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

BENCH_RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from sas_etl_spark.registry import QUERIES, queries_map
    from sas_etl_spark.session import get_spark

    queries_map()
    bench_specs = {n: s for n, s in sorted(QUERIES.items()) if "bench" in s.tags}

    spark = get_spark("sas_etl_spark-bench")

    # Warm up: JVM codegen, parquet footers, OS page cache — parity with
    # DuckDB's warm-connection median-of-3 protocol.
    for spec in bench_specs.values():
        spec.fn(spark, sf_dir).collect()

    per_query: dict[str, float] = {}
    for name, spec in bench_specs.items():
        times = []
        for _ in range(BENCH_RUNS):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).collect()
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
