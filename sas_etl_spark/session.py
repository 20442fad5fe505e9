"""SparkSession construction and runtime configuration.

Two use-cases:

1. The driver hands us an already-built SparkSession (``entry(spark)`` /
   ``queries()[name](spark, sf_dir)``). We can only set *runtime* SQL
   confs on it — ``configure()`` applies exactly those.
2. Our own tests/bench build a session from scratch — ``get_spark()``
   applies the full tuned config (memory, UI, AQE) for local[N] mode.

Conf rationale (SURVEY.md §4.2):
- ``session.timeZone=UTC``: fixture timestamps are naive/UTC; DuckDB
  oracle is UTC-naive — pinning avoids value shifts in comparisons.
- ``legacy.parquet.nanosAsLong=true``: tolerated-encoding support —
  if a fixture ships events as parquet ``timestamp[ns]`` (which Spark
  4.x cannot read natively, PARQUET_TYPE_ILLEGAL), this reads nanos as
  long; catalog.normalize_event_ts converts exactly. Current fixtures
  ship ``timestamp[us]``.
- ``parquet.inferTimestampNTZ.enabled=false``: parquet ``timestamp[us]``
  (no UTC-adjust flag) reads directly as canonical TIMESTAMP instead of
  TIMESTAMP_NTZ. Under the pinned UTC session timezone the wall-clock
  values are identical to DuckDB's naive reading (verified both ways),
  and the scan needs NO projected cast — normalize_event_ts becomes a
  no-op on current fixtures, keeping timestamp reads on the vectorized
  fast path with zero extra Project.
- AQE on: runtime partition coalescing + skew-join splitting — the
  100 TB story relies on it, and locally it stops tiny stages from
  drowning in fixed shuffle-partition overhead.
- Arrow on: every Python<->JVM data path (toPandas, pandas UDFs) is
  batched through Arrow, never per-row pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs settable on a live session (spark.conf.set). Applied to the
#: driver's session before any fixture read.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # r16: per-DataFrame-API-call site capture (error-context
    # debugging) costs one extra Py4J RPC + a Python stack walk per
    # call — measured 30-43% of plan-BUILD latency on the heaviest
    # builders (q_rrf_hybrid 809->465 ms). Production posture is off;
    # error messages lose only the "called from <user line>" hint.
    # NOTE: pyspark caches this flag process-wide on first use, so it
    # must be set before the first DataFrame API call (configure()
    # runs inside load_table, ahead of any column expression).
    "spark.python.sql.dataFrameDebugging.enabled": "false",
}


def _ship_package(spark: SparkSession) -> None:
    """Make sas_etl_spark importable on executor Python workers.

    The driver process may run from any cwd with the repo reachable
    only via its own sys.path; executor workers inherit neither. A
    zip of the package added via addPyFile lands on every worker's
    sys.path, so UDF closures that reference package modules resolve.
    One-shot per SparkContext.
    """
    sc = spark.sparkContext
    if getattr(sc, "_sas_etl_pkg_shipped", False):
        return
    try:
        import shutil
        import tempfile

        import sas_etl_spark

        pkg_dir = os.path.dirname(os.path.abspath(sas_etl_spark.__file__))
        zip_base = os.path.join(
            tempfile.mkdtemp(prefix="sas_etl_pkg_"), "sas_etl_spark_pkg"
        )
        zip_path = shutil.make_archive(
            zip_base, "zip", root_dir=os.path.dirname(pkg_dir), base_dir="sas_etl_spark"
        )
        sc.addPyFile(zip_path)
    except Exception:  # packaging is best-effort; hot paths are UDF-free
        pass
    sc._sas_etl_pkg_shipped = True


def configure(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Apply runtime confs needed for oracle parity to a live session.

    Idempotent and safe on a session we don't own: unknown/static confs
    are skipped rather than raising.
    """
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:  # static conf on this build — leave as-is
            pass
    if shuffle_partitions is None:
        # Right-size a session still on Spark's factory default (200):
        # at fixture scale that is ~200 near-empty post-shuffle tasks
        # per stage in the driver's vanilla session. A value set at
        # submit time (--conf / SparkConf) is visible in the
        # SparkContext conf and is ALWAYS preserved, even if it is
        # exactly 200. Only a session whose SQLConf still reads the
        # factory default with no submit-time setting is resized. (A
        # runtime .conf.set of exactly "200" before this call is
        # indistinguishable from the default and will be resized —
        # pass shuffle_partitions explicitly to pin it.) At cluster
        # scale the operator sizes this to bytes/128MiB (SCALE.md).
        try:
            submit_time = spark.sparkContext.getConf().get(
                "spark.sql.shuffle.partitions", None
            )
            if (
                submit_time is None
                and spark.conf.get("spark.sql.shuffle.partitions") == "200"
            ):
                spark.conf.set(
                    "spark.sql.shuffle.partitions",
                    str(max(8, 2 * (os.cpu_count() or 4))),
                )
        except Exception:
            pass
    else:
        try:
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        except Exception:
            pass
    _ship_package(spark)
    return spark


def get_spark(
    app_name: str = "sas_etl_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build a tuned local-mode session.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS, then to the machine's count.
    Local mode is one JVM; ``spark.driver.memory`` is the only memory
    knob that matters.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    if driver_memory is None:
        driver_memory = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    for key, value in (extra_confs or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return configure(spark, shuffle_partitions)
