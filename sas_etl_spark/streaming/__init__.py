"""Structured Streaming surface (SURVEY.md §2.10).

The reference class is batch; these builders exist so the event
operators run unchanged as streams: the SAME column expressions used
by the batch queries (q_tumbling_counts / q_sessionize) feed
readStream sources with watermarks. Batch-vs-stream equivalence is
oracle-verified: q_stream_tumbling runs the streaming plan to
completion on the bounded fixture and must hash-match the DuckDB
batch oracle.
"""

from sas_etl_spark.streaming.builders import (
    dedup_within_watermark,
    run_bounded_to_memory,
    run_bounded_to_parquet_sink,
    session_window_agg,
    sliding_agg,
    stream_events,
    stream_table,
    tumbling_agg,
)

__all__ = [
    "stream_events",
    "stream_table",
    "tumbling_agg",
    "sliding_agg",
    "session_window_agg",
    "dedup_within_watermark",
    "run_bounded_to_memory",
    "run_bounded_to_parquet_sink",
]
