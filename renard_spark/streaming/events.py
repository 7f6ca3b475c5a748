"""Streaming event aggregation — the readStream twins of
functions/events (batch IS the correctness oracle for these jobs).

- ``stream_windowed_aggregates``: tumbling event-time windows with a
  watermark — the same ``F.window`` groupBy as the batch path; late
  rows beyond the watermark are dropped by the state store.
- ``stream_sessions``: native ``session_window`` sessionization — the
  state store merges/extends per-user session state incrementally;
  identical expression to ``session_window_aggregates``.
- ``stream_exact_dedup``: cross-batch EXACT deduplication of documents
  by content fingerprint via ``applyInPandasWithState`` — a custom
  stateful operator (the training-data dedup primitive as a stream):
  the first document with a given fingerprint passes, every later
  arrival (same or later micro-batch) is dropped. State per fp is one
  boolean; at production scale pair with a TTL watermark or a periodic
  batch compaction of the fingerprint table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_windowed_aggregates(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            F.col("n").cast("long").alias("n"),
            "total_value",
        )
    )


def stream_sessions(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(
            "user_id",
            F.session_window(ts_col, f"{gap_minutes} minutes").alias("sw"),
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def stream_exact_dedup(
    docs_stream: DataFrame, text_col: str = "text"
) -> DataFrame:
    """→ (doc_id, fp) of first-seen documents only, across micro-batches.

    Keyed by md5(text); GroupState holds a single seen-flag per key.
    Within one micro-batch the smallest doc_id wins (canonical, not
    arrival order, so replays are deterministic)."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    keyed = docs_stream.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.md5(text_col).alias("fp"),
    )

    def dedup(key, pdfs, state: GroupState):
        if state.exists:
            return iter(())
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = pdf["doc_id"].min()
                best = m if best is None else min(best, m)
        if best is None:
            return iter(())
        state.update((True,))
        return iter([pd.DataFrame({"doc_id": [best], "fp": [key[0]]})])

    return keyed.groupBy("fp").applyInPandasWithState(
        dedup,
        outputStructType="doc_id string, fp string",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
