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
