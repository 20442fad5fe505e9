"""Dump .explain('formatted') for queries into plans/r17/<q>_<tag>.txt.

Usage:
  python scratch/r17_dump_plans.py before            # all bench+bench_llm queries
  ONLY=q_a,q_b python scratch/r17_dump_plans.py after
  ALL=1 python scratch/r17_dump_plans.py before      # every registered query

Plans are built at $SPARK_GRAFT_SF_DIR (default sf0.1) on the bench
session config (shuffle=4, AQE on) so the dumped shape matches what
bench.py executes. Explain only — nothing runs.
"""
import os
import sys

sys.path.insert(0, "/root/repo")

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/plans/r17"
os.makedirs(OUT, exist_ok=True)

from sas_etl_spark.registry import QUERIES, queries_map  # noqa: E402
from sas_etl_spark.session import get_spark  # noqa: E402

queries_map()
only = set(filter(None, os.environ.get("ONLY", "").split(",")))
if only:
    specs = {n: s for n, s in QUERIES.items() if n in only}
elif os.environ.get("ALL"):
    specs = dict(QUERIES)
else:
    specs = {
        n: s
        for n, s in QUERIES.items()
        if "bench" in s.tags or "bench_llm" in s.tags
    }

spark = get_spark("r17-plan-dump", shuffle_partitions=4)
fails = []
for name in sorted(specs):
    try:
        df = specs[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as exc:  # noqa: BLE001
        fails.append((name, repr(exc)[:200]))
        continue
    with open(f"{OUT}/{name}_{TAG}.txt", "w") as fh:
        fh.write(plan)
    print(name, "ok")
for name, err in fails:
    print("FAIL", name, err)
spark.stop()
sys.exit(1 if fails else 0)
