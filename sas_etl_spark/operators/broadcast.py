"""Size-gated broadcast hints.

``F.broadcast(df)`` is an ORDER, not a suggestion: it overrides
``spark.sql.autoBroadcastJoinThreshold`` and ships the whole side to
every executor regardless of size. That is right for genuinely bounded
tables (nation, region, centroid seeds, per-group stat tables) and an
executor-OOM time bomb for anything that scales with the fact data —
customer/supplier/part all grow linearly with SF, so a hard-coded
broadcast that is harmless at sf0.1 kills the job at sf100.

``broadcast_if_small`` keeps the hint DATA-DEPENDENT: it attaches
``F.broadcast`` only when the side's file-scan footprint is provably
under a bound, and otherwise returns the frame unhinted so Catalyst's
own threshold logic and AQE's runtime re-plan (which sees actual
post-shuffle sizes) decide. The estimate is deliberately conservative
in the safe direction:

- It sums the ON-DISK bytes of ``df.inputFiles()`` — the whole base
  table's files, even when ``df`` projects two columns — so it can
  only OVER-estimate, never sneak a big table under the bound.
- When no estimate is possible (non-file source, remote URIs the
  driver cannot stat), it assumes BIG and does not hint.

Used by every query whose broadcast side is an SF-scaling table; the
unconditional ``F.broadcast`` calls that remain in the codebase are on
provably bounded frames only (see the plan audit in
tests/test_plan_audit.py::test_broadcast_gate).
"""

from __future__ import annotations

import os
import urllib.parse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default byte bound: Spark's own autoBroadcastJoinThreshold default.
#: Parquet on-disk bytes under-state in-memory row size (encoding +
#: compression), but the gate compares DISK bytes against a bound meant
#: for them — 10 MiB of parquet is comfortably broadcastable on any
#: executor sized for real work, and the bound can be tightened per
#: call site.
DEFAULT_BROADCAST_BOUND: int = 10 << 20


def estimated_input_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of the file scan feeding ``df``.

    Public API only: ``df.inputFiles()`` (a FileIndex listing — no job,
    no plan->RDD conversion) + a driver-side stat of each file. Returns
    None when no estimate is possible — non-file source, empty listing,
    or URIs the driver cannot stat (hdfs://, s3://) — which callers
    MUST treat as "assume big".
    """
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        parsed = urllib.parse.urlparse(uri)
        if parsed.scheme not in ("file", ""):
            return None
        try:
            total += os.path.getsize(urllib.parse.unquote(parsed.path))
        except OSError:
            return None
    return total


def broadcast_if_small(
    df: DataFrame, bound: int = DEFAULT_BROADCAST_BOUND
) -> DataFrame:
    """``F.broadcast(df)`` iff its scan footprint is provably < bound.

    Above the bound (or when the size is unknowable) the frame comes
    back unhinted: Catalyst's autoBroadcastJoinThreshold and AQE's
    runtime statistics then pick the join strategy from sizes they can
    actually see, and a grown dimension degrades to a shuffled hash
    join instead of an executor OOM.
    """
    size = estimated_input_bytes(df)
    if size is not None and size < bound:
        return F.broadcast(df)
    return df
