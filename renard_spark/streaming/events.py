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


def stream_interval_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    bound: str = "4 hours",
    watermark: str = "30 days",
) -> DataFrame:
    """Watermarked stream-stream INTERVAL join (the attribution /
    media-grounding primitive as a stream): right rows join left rows
    with the same ``key`` whose timestamp falls in
    ``[left_ts, left_ts + bound]``.

    Spark plans this as StreamingSymmetricHashJoin: BOTH sides keep
    keyed state, each arriving row probes the other side's state, and
    the time-range condition + watermarks bound how long state is
    retained — left rows age out ``bound`` past the right watermark,
    right rows at their own watermark. That eviction is what makes the
    operator runnable forever at corpus scale; the watermark therefore
    also sets the correctness contract: a row arriving later than
    ``watermark`` behind the stream's max event time may miss matches
    (exactly the late-data rule of the batch oracle's windowed twins).
    Replay gates pick a watermark wider than the corpus's time span so
    stream output == the batch interval join, bit-exact, while still
    exercising cross-micro-batch state matching.

    Both inputs must be pre-projected to disjoint column names apart
    from ``key`` (the dup key column from the right side is dropped).
    """
    lw = left_stream.withWatermark(left_ts, watermark)
    rw = right_stream.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {bound}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])


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


def stream_funnel(
    events_stream: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming twin of ``functions/events.funnel_levels``: per-user
    windowFunnel state carried across micro-batches. → (user_id, level)
    emitted once per (user, batch); level is monotone non-decreasing,
    so the per-user MAX over all emissions equals the batch operator's
    answer — PROVIDED micro-batches arrive in event-time order (the
    log-replay contract; out-of-order events *within* a batch are
    sorted here, late events across batch boundaries are not replayed).

    State is exactly the batch fold's accumulator: k chain-start
    micro-timestamps (−1 = level unreached), the max-start greedy that
    is exact for the ∃-chain semantics. The per-user per-batch Python
    fold is the same declared imperative seam as the stateful dedup —
    Arrow-batched via applyInPandasWithState, state size k longs."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct")
    k = len(steps)
    window_us = int(window_seconds) * 1_000_000

    ts = F.col(ts_col)
    if dict(events_stream.dtypes).get(ts_col) == "timestamp_ntz":
        ts = ts.cast("timestamp")
    step = F.array_position(
        F.array(*[F.lit(s) for s in steps]), F.col(type_col)
    )
    keyed = (
        events_stream.select(
            F.col(user_col).cast("string").alias("user_id"),
            F.unix_micros(ts).alias("us"),
            step.cast("int").alias("step"),
        )
        .filter(F.col("step") > 0)
    )

    def fold(key, pdfs, state: GroupState):
        tm = list(state.get[0]) if state.exists else [-1] * k
        rows = []
        for pdf in pdfs:
            rows.extend(zip(pdf["us"].tolist(), pdf["step"].tolist()))
        if not rows:
            return iter(())
        rows.sort()
        for t, s in rows:
            i = s - 1
            if i == 0:
                tm[0] = max(tm[0], t)
            elif tm[i - 1] >= 0 and t - tm[i - 1] <= window_us:
                tm[i] = max(tm[i], tm[i - 1])
        state.update((tm,))
        level = sum(1 for v in tm if v >= 0)
        return iter(
            [pd.DataFrame({"user_id": [key[0]], "level": [level]})]
        )

    return keyed.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType="user_id string, level int",
        stateStructType="tm array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
