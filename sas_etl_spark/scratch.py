"""Session-scoped scratch directories for file-writing queries.

Sink queries (CSV/JSON/partitioned-write/split/append) materialize to
disk as part of building their result. Round 1 used a bare
``tempfile.mkdtemp`` per invocation and never cleaned up — every
verify/test run leaked a directory tree. All scratch now lives under
ONE per-application root that is removed at interpreter exit; a
long-lived process embedding us can reclaim it earlier by calling
``cleanup(spark)`` explicitly (nothing hooks session stop — Spark has
no portable Python-side stop callback).

Each call still gets a FRESH subdirectory, so query reruns within a
session stay hermetic (parquet sinks refuse to overwrite, by design).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import SparkSession

#: applicationId -> scratch root (one per Spark app in this process).
_ROOTS: dict[str, str] = {}


def scratch_root(spark: SparkSession) -> str:
    """The per-application scratch root, created lazily."""
    app_id = spark.sparkContext.applicationId
    root = _ROOTS.get(app_id)
    if root is None or not os.path.isdir(root):
        # Reclaim dead-app scratch NOW rather than at interpreter exit
        # (their atexit hooks remain as harmless no-ops) and drop the
        # dict entries — see catalog.evict_dead_app_entries.
        for dead in [a for a in _ROOTS if a != app_id]:
            shutil.rmtree(_ROOTS.pop(dead), ignore_errors=True)
        root = tempfile.mkdtemp(prefix=f"sas_etl_scratch_{app_id}_")
        _ROOTS[app_id] = root
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root


def scratch_dir(spark: SparkSession, name: str) -> str:
    """A fresh, empty scratch subdirectory (``<root>/<name>/<seq>``)."""
    base = os.path.join(scratch_root(spark), name)
    os.makedirs(base, exist_ok=True)
    return tempfile.mkdtemp(prefix="run_", dir=base)


def cleanup(spark: SparkSession) -> None:
    """Remove this application's scratch root immediately."""
    app_id = spark.sparkContext.applicationId
    root = _ROOTS.pop(app_id, None)
    if root:
        shutil.rmtree(root, ignore_errors=True)
