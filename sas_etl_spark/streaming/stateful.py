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
