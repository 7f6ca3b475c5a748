"""Event-stream aggregations — batch/streaming-symmetric.

Tumbling event-time windows via ``F.window``: the exact expression
works unchanged under Structured Streaming (readStream → withWatermark
→ the same groupBy) — the batch run here IS the correctness oracle for
the streaming job, which is how the engine treats append-only event
tables at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_aggregates(
    events: DataFrame, window: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """(window_start, event_type, n, total_value) per tumbling window."""
    return (
        events.groupBy(
            F.window(ts_col, window).alias("w"), "event_type"
        )
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


def session_window_aggregates(
    events: DataFrame, gap_minutes: int = 30, ts_col: str = "ts"
) -> DataFrame:
    """Per-user sessions via Spark's native ``session_window`` — the
    streaming-capable twin of ``sessionize``: the identical expression
    runs under Structured Streaming (after withWatermark), where the
    state store merges windows incrementally. Session membership is
    identical to the gaps-and-islands path INCLUDING the boundary: an
    event exactly ``gap`` after its predecessor merges (adjacent
    session windows coalesce), matching ``sessionize``'s strict
    ``> gap`` split — asserted by an exact-gap fixture test.

    → (user_id, session_start, session_end, n_events) where
    session_end = max event ts (not the window's +gap horizon)."""
    return (
        events.groupBy(
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


def sessionize(
    events: DataFrame, gap_minutes: int = 30, ts_col: str = "ts"
) -> DataFrame:
    """Per-user sessionization (gaps-and-islands over event time):
    (user_id, session_id, session_start, session_end, n_events).
    The batch twin of applyInPandasWithState session windows."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(ts_col)
    # NTZ → timestamp → epoch seconds (truncated, matching SQL epoch())
    sec = F.col(ts_col).cast("timestamp").cast("long")
    marked = events.withColumn(
        "_new",
        (sec - F.lag(sec).over(w) > gap_minutes * 60).cast("int"),
    ).withColumn(
        "session_id",
        F.coalesce(
            F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
            F.lit(0),
        ),
    )
    return marked.groupBy("user_id", "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
