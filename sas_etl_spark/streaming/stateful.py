"""Custom stateful streaming operators (SURVEY.md §2.10):
applyInPandasWithState — the streaming analog of a BY-group DATA step
with RETAIN state that survives across micro-batches.

Shipped operator: per-user running counters (events seen, value sum)
emitted once per micro-batch per active user. State is one tiny tuple
per user — bounded by key cardinality, the only safe state shape for
an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, events long, total_value double"
STATE_SCHEMA = "events long, total_value double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful running totals per user over a stream.

    The update function is self-contained (cloudpickle by value): for
    each micro-batch it folds the new rows into (events, total_value)
    state and emits the updated snapshot.
    """

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUSUM_OUTPUT_SCHEMA = (
    "event_type string, d string, n long, cusum double, is_alarm int,"
    " version long"
)
CUSUM_STATE_SCHEMA = "days array<string>, counts array<long>, version long"


def streaming_cusum(
    events: DataFrame,
    baseline_days: int = 14,
) -> DataFrame:
    """Streaming CUSUM change detection per event type — the stateful
    twin of queries/robust_stats.q_cusum, for ingest-time telemetry:
    state is the per-series day->count map (bounded O(days) per key),
    merged across micro-batches; each update re-derives the FULL
    control chart from state and emits it stamped with a monotone
    ``version`` so the final snapshot per key is selectable after an
    update-mode sink accumulates every emission.

    The chart arithmetic REPLICATES the batch query bit-for-bit BY
    CONSTRUCTION: baseline mu/sigma from the first ``baseline_days``
    days are quantized to ppm from exact integer accumulators (count,
    sum, sum of squares — mu6 pure-integer HALF_UP, sigma6 through
    the one float sequence every engine computes identically; numpy
    half-even round must not be used anywhere), then the scaled-integer
    closed-form CUSUM (cumsum minus prefix min in int64) and the pure
    integer alarm compare. The emitted cusum divides by 2e6 and rounds
    at 7dp exactly as the batch side does."""

    def update(key, pdfs, state: GroupState):
        import math

        import numpy as np
        import pandas as pd

        if state.exists:
            days, counts, version = state.get
            acc = dict(zip(list(days), [int(c) for c in counts]))
        else:
            acc, version = {}, 0
        for pdf in pdfs:
            for d, c in pdf["ts"].dt.strftime("%Y-%m-%d").value_counts().items():
                acc[d] = acc.get(d, 0) + int(c)
        version += 1
        days_sorted = sorted(acc)
        state.update((days_sorted, [acc[d] for d in days_sorted], version))

        n = np.array([acc[d] for d in days_sorted], dtype=np.int64)
        # Exact integer accumulators (k, sum, sum of squares) -> the
        # SAME quantization sequence as batch q_cusum and its oracle:
        # mu6 pure-integer HALF_UP, sigma6 through one well-defined
        # float pipeline (int->double via float(), divide, IEEE sqrt,
        # *1e6, floor(x+0.5)) from identical integers — bit-identical
        # by construction, not pinned empirically. float(v)/float(d_)
        # (convert THEN divide) matters: Python's int/int true
        # division is correctly rounded on the exact ratio, which is
        # NOT what the SQL engines' double(v)/double(d) computes.
        base_ints = [int(x) for x in n[:baseline_days]]
        k = len(base_ints)
        s = sum(base_ints)
        q = sum(x * x for x in base_ints)
        mu6 = (2 * s * 1_000_000 + k) // (2 * k)
        if k > 1:
            v = k * q - s * s
            d_ = k * (k - 1)
            sigma6 = math.floor(
                math.sqrt(float(v) / float(d_)) * 1_000_000 + 0.5
            )
        else:
            sigma6 = 0
        dev2 = 2_000_000 * n - 2 * mu6 - sigma6
        c2 = np.cumsum(dev2)
        s2 = c2 - np.minimum.accumulate(c2)
        yield pd.DataFrame(
            {
                "event_type": key[0],
                "d": days_sorted,
                "n": n,
                "cusum": [round(v / 2_000_000.0, 7) for v in s2],
                "is_alarm": (s2 > 8 * sigma6).astype("int32"),
                "version": version,
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_v2(events: DataFrame) -> DataFrame:
    """The same running-totals operator on the Spark 4
    transformWithState API — the successor to applyInPandasWithState:
    named state variables behind a handle (value/list/map state,
    timers, TTL) instead of one opaque tuple, so multi-variable
    operators stop packing state by position. Requires the RocksDB
    state store provider (the only store implementing the new API's
    column families); caller/session must set
    spark.sql.streaming.stateStore.providerClass accordingly.
    Batch-equivalence is pinned by tests/test_stateful_streaming.py
    alongside the v1 twin; the test SKIPS where the runtime cannot
    host the new API's Python state server (it needs a working
    google.protobuf — absent in this container, so the v1
    applyInPandasWithState twin remains the verified-here path).
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            prior = self._totals.get() if self._totals.exists() else (0, 0.0)
            n, total = int(prior[0]), float(prior[1])
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


#: Which implementation lane the last running-user-totals stream
#: actually ran ("v2" = transformWithState, "v1" = the
#: applyInPandasWithState twin, None = never run this process).
#: Observability for the silent v2->v1 degradation (ADVICE r12):
#: both lanes attest the same relation, so without this record (and
#: the paired log warning at the fallback site) a permanent v2
#: regression would stay green and invisible indefinitely.
LAST_TOTALS_LANE: str | None = None


def supports_transform_with_state(spark) -> bool:
    """Capability probe for the Spark 4 transformWithState PYTHON API.
    The Python lane needs (a) the StatefulProcessor API surface, (b) a
    working ``google.protobuf`` (the Python worker talks to the state
    server over protobuf — absent in some minimal images), and (c) the
    RocksDB state store provider class on the JVM classpath (the only
    store implementing the API's column families). Pure import/class
    probes — no stream is started, no config is mutated."""
    try:
        import google.protobuf  # noqa: F401
        from pyspark.sql.streaming import StatefulProcessor  # noqa: F401
    except ImportError:
        return False
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
    except Exception:
        return False
    return True
