"""Streaming twins of the event/dedup operators: the batch result is
the oracle for every streaming job (stream==batch equality through a
file source with availableNow)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from renard_spark.functions import events as fevents
from renard_spark.streaming.events import (
    stream_exact_dedup,
    stream_sessions,
    stream_windowed_aggregates,
)

EVENTS_SCHEMA = (
    "user_id string, event_type string, ts timestamp, value double"
)


def _events_fixture(spark):
    base = dt.datetime(2026, 1, 1, 8, 0, 0)
    rows = []
    for u in range(6):
        t = base + dt.timedelta(minutes=7 * u)
        for i in range(15):
            # gaps of 11 (in-session) or 47 (session break) minutes
            t = t + dt.timedelta(minutes=47 if i % 5 == 4 else 11)
            rows.append((f"u{u}", f"e{i % 3}", t, float(i)))
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


def test_session_window_matches_gaps_and_islands(spark):
    ev = _events_fixture(spark)
    native = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in fevents.session_window_aggregates(ev, 30).collect()
    }
    gai = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in fevents.sessionize(ev, 30).drop("session_id").collect()
    }
    assert native == gai


def test_session_window_boundary_agreement(spark):
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    ev = spark.createDataFrame(
        [("u", "e", base, 0.0),
         ("u", "e", base + dt.timedelta(minutes=30), 1.0),
         ("u", "e", base + dt.timedelta(minutes=61), 2.0)],
        EVENTS_SCHEMA,
    )
    # exactly-gap pair MERGES on both paths (adjacent session windows
    # coalesce; gaps-and-islands splits strictly on > gap); the
    # 31-minute gap splits on both
    assert fevents.session_window_aggregates(ev, 30).count() == 2
    assert fevents.sessionize(ev, 30).count() == 2


def _run_stream(spark, inp, ck, out_name, build):
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(inp)
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(out_name)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(out_name)


def test_stream_windows_match_batch(spark, tmp_path):
    ev = _events_fixture(spark)
    inp = str(tmp_path / "ev")
    ev.coalesce(2).write.parquet(inp)

    # append-mode windows only emit when the watermark passes them: add
    # a far-future flush row (dropped from comparison) to close all
    flush = spark.createDataFrame(
        [("flush", "flush", dt.datetime(2027, 1, 1), 0.0)], EVENTS_SCHEMA
    )
    flush.write.mode("append").parquet(inp)

    got = _run_stream(
        spark, inp, str(tmp_path / "ck1"), "win_out",
        lambda s: stream_windowed_aggregates(s, "1 hour", "0 seconds"),
    ).filter("event_type <> 'flush'")
    want = fevents.windowed_event_aggregates(ev, "1 hour")
    key = lambda r: (r.window_start, r.event_type, r.n, round(r.total_value, 6))
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_stream_sessions_match_batch(spark, tmp_path):
    ev = _events_fixture(spark)
    inp = str(tmp_path / "ev2")
    ev.coalesce(2).write.parquet(inp)
    flush = spark.createDataFrame(
        [("flush", "flush", dt.datetime(2027, 1, 1), 0.0)], EVENTS_SCHEMA
    )
    flush.write.mode("append").parquet(inp)

    got = _run_stream(
        spark, inp, str(tmp_path / "ck2"), "sess_out",
        lambda s: stream_sessions(s, 30, "0 seconds"),
    ).filter("user_id <> 'flush'")
    want = fevents.session_window_aggregates(ev, 30)
    key = lambda r: (r.user_id, r.session_start, r.session_end, r.n_events)
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_stream_exact_dedup_across_batches(spark, tmp_path):
    inp = str(tmp_path / "docs")
    spark.createDataFrame(
        [("1", "alpha beta"), ("2", "alpha beta"), ("3", "unique one")],
        "doc_id string, text string",
    ).coalesce(1).write.parquet(inp)
    # second file arrives as a later micro-batch with a cross-batch dup
    spark.createDataFrame(
        [("4", "alpha beta"), ("5", "another text")],
        "doc_id string, text string",
    ).coalesce(1).write.mode("append").parquet(inp)

    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    q = (
        stream_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {(r.doc_id, r.fp) for r in spark.table("dedup_out").collect()}
    doc_ids = {d for d, _ in got}
    # one doc per distinct text; within-batch dup '2' and cross-batch
    # dup '4' both dropped
    assert doc_ids == {"1", "3", "5"}
    assert len(got) == 3


def test_incremental_dedup_state_is_order_independent(spark):
    """The (min keep_id, sum n) merge is a commutative monoid: any
    batch split/order reaches the same fixpoint — the property that
    lets stream_dedup share the batch oracle."""
    from renard_spark.streaming.dedup import (
        batch_fingerprints, merge_dedup_state,
    )

    rows = [
        (7, "xx"), (3, "xx"), (5, "yy"), (1, "xx"), (9, "zz"), (2, "yy"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    batches_a = [df.filter(f"doc_id in ({ids})") for ids in ("7,3", "5,1", "9,2")]
    batches_b = [df.filter(f"doc_id in ({ids})") for ids in ("9,1", "2,7", "5,3")]

    def fold(batches):
        state = None
        for b in batches:
            state = merge_dedup_state(state, batch_fingerprints(b))
        return sorted(tuple(r) for r in state.collect())

    want = sorted(
        tuple(r)
        for r in batch_fingerprints(df).collect()
    )
    assert fold(batches_a) == fold(batches_b) == want


def test_incremental_dedup_replay_idempotent(spark, tmp_path):
    """Re-running the stream over the same input + checkpoint leaves
    the final state identical (versions are overwrite+skip)."""
    from renard_spark.streaming.dedup import run_incremental_dedup

    docs = spark.createDataFrame(
        [(i, f"text {i % 4}") for i in range(12)],
        "doc_id long, text string",
    )
    in_dir = str(tmp_path / "in")
    docs.repartition(3).write.parquet(in_dir)
    work = str(tmp_path / "work")

    def run():
        sdf = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        return sorted(
            tuple(r)
            for r in run_incremental_dedup(spark, sdf, work).collect()
        )

    first = run()
    second = run()  # no new files: state untouched, same final version
    assert first == second
    assert len(first) == 4 and sum(n for _, _, n in first) == 12


def test_stream_funnel_matches_batch(spark, tmp_path):
    """Two event-time-ordered micro-batches; per-user MAX emitted level
    must equal the batch funnel on the full data — including a chain
    that only completes with the second batch's purchase."""
    base = dt.datetime(2026, 1, 1, 8, 0, 0)
    early, late = [], []
    # u0: view+click early, purchase late (cross-batch chain completes)
    early += [("u0", "view", base, 0.0),
              ("u0", "click", base + dt.timedelta(seconds=30), 0.0)]
    late += [("u0", "purchase", base + dt.timedelta(seconds=70), 0.0)]
    # u1: full chain early but span > window once purchase arrives late
    early += [("u1", "view", base, 0.0)]
    late += [("u1", "click", base + dt.timedelta(seconds=200), 0.0),
             ("u1", "purchase", base + dt.timedelta(seconds=260), 0.0)]
    # u2: click only
    early += [("u2", "click", base, 0.0)]
    steps, window_s = ["view", "click", "purchase"], 100

    inp = str(tmp_path / "fev")
    spark.createDataFrame(early, EVENTS_SCHEMA).coalesce(1).write.parquet(inp)
    spark.createDataFrame(late, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(inp)

    from renard_spark.streaming.events import stream_funnel

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    q = (
        stream_funnel(stream, steps, window_s)
        .writeStream.format("memory")
        .queryName("funnel_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckf"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r.user_id: r.lvl
        for r in spark.table("funnel_out")
        .groupBy("user_id")
        .agg(F.max("level").alias("lvl"))
        .collect()
    }
    full = spark.createDataFrame(early + late, EVENTS_SCHEMA)
    want = {
        r.user_id: r.level
        for r in fevents.funnel_levels(full, steps, window_s).collect()
    }
    assert want == {"u0": 3, "u1": 1, "u2": 0}
    assert got == want
