"""Metadata-driven pipelines: ETL jobs defined as DATA, not code.

SAS analog: the macro-driven job pattern — %macros reading control
tables that decide which datasets to read, which WHERE clauses and
derived columns to apply, and which summaries to produce (the
dominant idiom of production SAS ETL; SURVEY.md §1.1 namespaces +
§3.1 lifecycle). Here a pipeline is a JSON-able list of step dicts,
compiled step-by-step into ONE DataFrame plan:

    [{"op": "load",   "table": "lineitem"},
     {"op": "filter", "where": "l_shipdate <= timestamp '...'"},
     {"op": "derive", "cols": {"revenue": "l_extendedprice * (1 - l_discount)"}},
     {"op": "join",   "table": "orders", "on": ["l_orderkey=o_orderkey"], "how": "inner"},
     {"op": "agg",    "by": ["l_returnflag"], "aggs": {"rev": "round(sum(revenue), 2)"}},
     {"op": "select", "cols": ["l_returnflag", "rev"]}]

Everything compiles to `F.expr` column expressions on DataFrames, so
the WHOLE spec becomes one Catalyst logical plan: filters still push
to scans, joins still broadcast small sides, aggs still get map-side
partials — declaring the job as data costs nothing at 100 TB because
no step materializes. Unknown ops and malformed steps raise
immediately with the step index (a control-table typo fails at
compile, not mid-job).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table


def _fail(i: int, step: Mapping, msg: str) -> None:
    raise ValueError(f"pipeline step {i} {dict(step)!r}: {msg}")


def run_pipeline(
    spark: SparkSession, sf_dir: str, steps: Sequence[Mapping]
) -> DataFrame:
    """Compile a step list into one DataFrame plan (no actions run)."""
    df: DataFrame | None = None
    for i, step in enumerate(steps):
        op = step.get("op")
        if op == "load":
            if df is not None:
                _fail(i, step, "load must be the first step")
            df = load_table(spark, sf_dir, step["table"])
            continue
        if df is None:
            _fail(i, step, "pipeline must start with a load step")
        if op == "filter":
            df = df.filter(F.expr(step["where"]))
        elif op == "derive":
            for name, expr in step["cols"].items():
                df = df.withColumn(name, F.expr(expr))
        elif op == "join":
            other = load_table(spark, sf_dir, step["table"])
            conds = []
            for pair in step["on"]:
                left, _, right = pair.partition("=")
                if not right:
                    _fail(i, step, f"join key {pair!r} must be 'left=right'")
                conds.append(df[left.strip()] == other[right.strip()])
            joined = df.join(other, conds[0] if len(conds) == 1 else conds,
                             step.get("how", "inner"))
            df = joined
        elif op == "agg":
            aggs = [F.expr(e).alias(n) for n, e in step["aggs"].items()]
            df = df.groupBy(*[F.col(c) for c in step.get("by", [])]).agg(*aggs)
        elif op == "select":
            df = df.select(*step["cols"])
        elif op == "sort":
            df = df.orderBy(*[F.expr(e) for e in step["by"]])
        elif op == "limit":
            df = df.limit(int(step["n"]))
        else:
            _fail(i, step, f"unknown op {op!r} (known: load/filter/derive/"
                           "join/agg/select/sort/limit)")
    if df is None:
        raise ValueError("empty pipeline")
    return df
