"""Event-stream aggregations — batch/streaming-symmetric.

Tumbling event-time windows via ``F.window``: the exact expression
works unchanged under Structured Streaming (readStream → withWatermark
→ the same groupBy) — the batch run here IS the correctness oracle for
the streaming job, which is how the engine treats append-only event
tables at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def asof_join(
    left: DataFrame, right: DataFrame, on: str = "user_id",
    ts_col: str = "ts", right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """AS-OF join: for every left row, attach the LATEST right row with
    the same ``on`` key and right.ts <= left.ts (strictly the most
    recent at-or-before match; left rows with no prior right row get
    NULLs) — the standard point-in-time enrichment Spark has no native
    operator for.

    Spark-first shape (NOT a per-key loop, NOT a range self-join):
    tag both inputs, UNION them, and run ONE window pass per key
    ordered by (ts, side) — `last(right_value, ignorenulls)` over
    rows-unbounded-preceding gives every left row the most recent
    right payload in a single shuffle keyed by ``on``. Right rows
    sort BEFORE left rows at equal ts (side 0 < 1) so ties match
    at-or-before semantics. Scales as one shuffle of |L|+|R| rows;
    skewed keys fall to AQE like any window-by-key op.

    Right rows must be unique per (on, ts) — with duplicates the
    winner among equal timestamps is unspecified (pre-aggregate with
    max_by first), matching ASOF JOIN semantics elsewhere.
    """
    from pyspark.sql import Window

    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in (on, ts_col)
        ]
    l_tag = left.withColumn("_side", F.lit(1)).withColumn(
        "_rts", F.lit(None).cast(right.schema[ts_col].dataType)
    )
    for c in right_cols:
        l_tag = l_tag.withColumn(
            f"_p_{c}", F.lit(None).cast(right.schema[c].dataType)
        )
    r_tag = right.select(
        on,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.col(ts_col).alias("_rts"),
        *[F.col(c).alias(f"_p_{c}") for c in right_cols],
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    u = l_tag.unionByName(r_tag.select(l_tag.columns))
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u
    for c in right_cols:
        out = out.withColumn(
            f"{c}{suffix}", F.last(f"_p_{c}", ignorenulls=True).over(w)
        )
    out = out.withColumn(
        f"{ts_col}{suffix}", F.last("_rts", ignorenulls=True).over(w)
    )
    return out.filter(F.col("_side") == 1).drop(
        "_side", "_rts", *[f"_p_{c}" for c in right_cols]
    )


def range_join_buckets(
    points: DataFrame, intervals: DataFrame, on: str = "user_id",
    ts_col: str = "ts", start_col: str = "start", end_col: str = "end",
    bucket: str = "1 hour",
) -> DataFrame:
    """Interval (range) join: every (point, interval) pair with the
    same key and start <= ts < end — expressed as a BUCKETED equi-join
    so Catalyst never falls back to a broadcast-nested-loop range
    join: each interval explodes to the (typically few) time buckets
    it overlaps, points map to their one bucket, and the join runs on
    (key, bucket) with the exact range predicate applied after. Cost
    is |points| + Σ interval-spans/bucket rows through ONE shuffle —
    the classic scalable range-join strategy.
    """
    b = F.expr(f"INTERVAL {bucket}")
    p = points.withColumn(
        "_bkt", F.window(ts_col, bucket)["start"]
    )
    # explode the sequence EXPRESSION directly (not a bound alias):
    # see dedup.shingles — an alias child lets InferFiltersFromGenerate
    # duplicate the window/sequence computation into a pushed filter
    i = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.window(start_col, bucket)["start"],
                # end is exclusive: an interval ending exactly on a
                # bucket boundary does not reach into that bucket
                F.window(
                    F.col(end_col) - F.expr("INTERVAL 1 microsecond"),
                    bucket,
                )["start"],
                b,
            )
        ),
    )
    joined = p.join(i, [on, "_bkt"]).filter(
        (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("_bkt")


def hypertable_rollup(
    events: DataFrame, ts_col: str = "ts",
) -> DataFrame:
    """Multi-grain time rollup (the hypertable continuous-aggregate
    shape): per (event_type, grain ∈ {hour, day}) counts and value
    sums in ONE pass — Spark GROUPING SETS, so the map-side partial
    aggregation is shared across grains instead of re-scanning per
    grain. → (grain, bucket, event_type, n, total_value)."""
    hour = F.date_trunc("hour", ts_col)
    day = F.date_trunc("day", ts_col)
    base = events.select(
        hour.alias("_h"), day.alias("_d"), "event_type", "value"
    )
    base.createOrReplaceTempView("_roll_base")
    return base.sparkSession.sql(
        """
        SELECT CASE WHEN grouping(_d) = 1 THEN 'hour' ELSE 'day' END
                 AS grain,
               coalesce(_h, _d) AS bucket, event_type,
               count(*) AS n, sum(value) AS total_value
        FROM _roll_base
        GROUP BY GROUPING SETS ((_h, event_type), (_d, event_type))
        """
    )


def sliding_event_aggregates(
    events: DataFrame, window: str = "1 hour",
    slide: str = "15 minutes", ts_col: str = "ts",
) -> DataFrame:
    """(window_start, event_type, n, total_value) per SLIDING window —
    Spark's native ``window(ts, dur, slide)``: each event lands in
    dur/slide overlapping windows (epoch-aligned), the hot-aggregate
    shape of rate monitoring / rolling quality dashboards. Works
    unchanged on a streaming frame with a watermark; the explode factor
    is the fixed dur/slide constant, never data-dependent."""
    return (
        events.groupBy(
            F.window(ts_col, window, slide).alias("w"), "event_type"
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


def rolling_features(
    events: DataFrame, k: int = 5,
    key_col: str = "user_id", ts_col: str = "ts",
    val_col: str = "value", id_col: str = "event_id",
) -> DataFrame:
    """Per-key rolling features over the previous ``k`` events
    (exclusive of the current one) → (id, key, ts, value, roll_n,
    roll_sum, roll_mean, roll_max, delta_prev):

    the standard feature-engineering window of an event pipeline
    (recent activity level, deviation from recent behavior). ONE
    shuffle keyed by ``key_col``; the frame is ROWS-based so results
    are layout-invariant given the deterministic (ts, id) order.
    Events with no history get roll_n = 0 and NULL mean/max/delta."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-k, -1)
    )
    wlag = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    return events.select(
        id_col, key_col, ts_col, val_col,
        F.count(val_col).over(w).cast("long").alias("roll_n"),
        F.sum(val_col).over(w).alias("roll_sum"),
        F.avg(val_col).over(w).alias("roll_mean"),
        F.max(val_col).over(w).alias("roll_max"),
        (F.col(val_col) - F.lag(val_col).over(wlag)).alias("delta_prev"),
    )


def typed_props(
    events: DataFrame,
    fields: dict[str, str],
    props_col: str = "props",
) -> DataFrame:
    """Schema-on-read for the semi-structured JSON payload column:
    parse ``props_col`` with an explicit field→type schema
    (``from_json``, JVM-side — never a Python json.loads) and surface
    each field as a typed top-level column. Unparseable rows and
    missing keys yield NULLs (standard permissive semantics), so a
    malformed payload can be quarantined with one IS NULL filter
    rather than killing the job. Narrow: pipelines into the scan.

    At 100 TB the payload column is where event tables hide most of
    their bytes; an explicit schema keeps parsing vectorized and lets
    column pruning drop the raw JSON string immediately after this
    projection.
    """
    schema = ", ".join(f"{k} {t}" for k, t in fields.items())
    parsed = events.withColumn("_p", F.from_json(F.col(props_col), schema))
    keep = [c for c in events.columns if c != props_col]
    return parsed.select(
        *keep, *[F.col(f"_p.{k}").alias(k) for k in fields]
    )


def event_gaps(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Inter-arrival time per user → (user_col, id_col, gap_us): exact
    integer microseconds since the same user's previous event (NULL on
    the user's first event) — the dwell-time / activity-cadence
    primitive behind sessionization thresholds and bot detection.

    ONE window partitioned by the user key (millions of small
    partitions — the scalable kind, unlike an empty partitionBy), with
    (ts, event_id) ordering so simultaneous events break ties
    deterministically. Microsecond integers (``unix_micros``) keep the
    arithmetic exact and engine-portable — double epoch seconds lose
    sub-microsecond bits at 2^52. TIMESTAMP_NTZ columns are cast to
    TIMESTAMP first (the engine pins the session timezone to UTC in
    session.py, so the cast is a linear epoch mapping).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    ts = F.col(ts_col)
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        ts = ts.cast("timestamp")
    us = F.unix_micros(ts)
    return events.select(
        user_col, id_col,
        (us - F.lag(us).over(w)).cast("long").alias("gap_us"),
    )


def funnel_levels(
    events: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Window funnel (the ClickHouse ``windowFunnel`` analytic) →
    (user_col, level): the deepest prefix of ``steps`` each user
    completed as a time-ordered chain whose total span fits inside
    ``window_seconds``. Chain semantics: timestamps non-decreasing
    (t1 ≤ … ≤ tl, tl − t1 ≤ window), ``steps`` must be distinct.

    Distributed shape: filter to funnel types (narrow — non-funnel
    events never shuffle), ONE groupBy(user) collecting the (ts, step)
    list, then a pure-JVM ``aggregate`` fold over the sorted array.
    The fold keeps, per level, the MAXIMUM chain-start time over all
    chains reaching that level — a later start strictly dominates
    (more window slack for every deeper step), so greedy-max is exact
    for the ∃-chain semantics, unlike the earliest-start greedy.
    Sorting by (ts, step) makes equal-timestamp chains well-defined:
    lower steps fold first, so a same-instant s1→s2 chain is counted.
    Per-user state is k longs — millions of users cost nothing; a
    single user's event list is bounded by their funnel-type events
    only.
    """
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct")
    k = len(steps)
    window_us = int(window_seconds) * 1_000_000
    ts = F.col(ts_col)
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        ts = ts.cast("timestamp")
    step = F.array_position(
        F.array(*[F.lit(s) for s in steps]), F.col(type_col)
    )
    ev = (
        events.select(
            F.col(user_col),
            F.unix_micros(ts).alias("_us"),
            step.cast("int").alias("_step"),
        )
        .filter(F.col("_step") > 0)
    )
    per_user = ev.groupBy(user_col).agg(
        F.sort_array(F.collect_list(F.struct("_us", "_step"))).alias("_evs")
    )

    def fold(acc, x):
        # slot i (0-based) = best (max) chain-start time among chains
        # reaching level i+1; element_at is 1-based, so element_at(acc, i)
        # is the previous level's slot (guarded: only reached when i >= 1).
        return F.transform(
            acc,
            lambda v, i: F.when(x["_step"] != i + 1, v).otherwise(
                F.when(i == F.lit(0), F.greatest(v, x["_us"])).otherwise(
                    F.when(
                        F.element_at(acc, i).isNotNull()
                        & (
                            (x["_us"] - F.element_at(acc, i))
                            <= F.lit(window_us)
                        ),
                        F.greatest(v, F.element_at(acc, i)),
                    ).otherwise(v)
                )
            ),
        )

    level = F.aggregate(
        F.col("_evs"),
        F.array_repeat(F.lit(None).cast("long"), k),
        fold,
        lambda acc: F.size(F.filter(acc, lambda v: v.isNotNull())),
    )
    return per_user.select(
        user_col, level.cast("int").alias("level")
    )


def retention_cohorts(
    events: DataFrame,
    period: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention → (cohort, offset, n_users): users grouped by
    the period of their first activity, counted at each later period
    they came back (offset 0 = the cohort's own size). ``period`` is
    'day' or 'week' (date_trunc buckets, Monday weeks — identical in
    DuckDB/Trino), offsets are exact integer day-diffs divided by the
    period length, so the table is engine-portable.

    Shape: one (user, period) distinct (map-side partial), one min-agg
    for the cohort assignment, one broadcast-size join back (the
    per-user cohort row is 1 row/user — Spark will hash-join on the
    user key; AQE may broadcast at small scale), one final count
    aggregation. No windows, no skew risk beyond the user key itself.
    """
    if period not in ("day", "week"):
        raise ValueError("period must be 'day' or 'week'")
    days = 1 if period == "day" else 7
    p = F.date_trunc(period, F.col(ts_col)).cast("date")
    act = events.select(
        F.col(user_col).alias("_u"), p.alias("_p")
    ).distinct()
    first = act.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    joined = act.join(first, "_u")
    return (
        joined.groupBy(
            F.col("_cohort").alias("cohort"),
            (F.datediff(F.col("_p"), F.col("_cohort")) / days)
            .cast("int")
            .alias("offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def gapfill_locf(
    events: DataFrame,
    bucket: str = "hour",
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Dense time-bucketed series with gap filling + last-observation-
    carried-forward (the TimescaleDB ``time_bucket_gapfill`` +
    ``locf`` pair) → (key, bucket_start, n, vmax, vmax_locf): every
    (series key × bucket) in the corpus' [min, max] bucket range gets
    a row; empty buckets carry n = 0, NULL vmax, and the previous
    non-NULL vmax via an IGNORE NULLS running ``last``.

    Shape: one (key, bucket) aggregation; the spine is a 1-row global
    min/max scalar broadcast-crossed with the distinct key table, then
    a narrow ``sequence`` explode — spine size = |keys| × |buckets|,
    never a function of event count. The LOCF window partitions by the
    series key (many small partitions). The carried metric is ``max``
    deliberately: order-independent, so the filled table value-hashes
    identically on any engine/layout (a carried float *sum* would not).
    """
    ts = F.col(ts_col)
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        ts = ts.cast("timestamp")
    b = F.date_trunc(bucket, ts)
    agg = events.groupBy(
        F.col(key_col).alias("key"), b.alias("bucket_start")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.max(val_col).alias("_vmax"),
    )
    bounds = events.select(
        F.min(b).alias("_lo"), F.max(b).alias("_hi")
    )
    keys = events.select(F.col(key_col).alias("key")).distinct()
    spine = keys.crossJoin(F.broadcast(bounds)).select(
        "key",
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"interval 1 {bucket}"))
        ).alias("bucket_start"),
    )
    filled = spine.join(agg, ["key", "bucket_start"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        "key",
        "bucket_start",
        F.coalesce("_n", F.lit(0)).cast("long").alias("n"),
        F.col("_vmax").alias("vmax"),
        F.last("_vmax", ignorenulls=True).over(w).alias("vmax_locf"),
    )


def activity_streaks(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Longest consecutive-day activity streak per user → (user_col,
    n_active_days, longest_streak): the gaps-and-islands pattern. One
    distinct on (user, day), one user-keyed window row_number, one
    island aggregation — island identity is the engine-portable
    integer ``days-since-epoch − row_number`` (constant within a
    consecutive run), never date arithmetic on interval types.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    act = events.select(
        F.col(user_col).alias("u"), day.alias("d")
    ).distinct()
    w = Window.partitionBy("u").orderBy("d")
    isl = act.select(
        "u", "d",
        (
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("isl"),
    )
    runs = isl.groupBy("u", "isl").agg(
        F.count(F.lit(1)).cast("long").alias("run")
    )
    return runs.groupBy(F.col("u").alias(user_col)).agg(
        F.sum("run").cast("long").alias("n_active_days"),
        F.max("run").cast("long").alias("longest_streak"),
    )


def rate_anomalies(
    events: DataFrame,
    trailing: int = 24,
    bucket: str = "hour",
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Trailing-window rate anomaly score per (series, bucket) →
    (key, bucket_start, n, z): each bucket's event count against the
    mean/std of the previous ``trailing`` buckets of the same series
    (NULL z until a full trailing window exists, or when the trailing
    counts are constant). One aggregation + one series-keyed window.

    The moments come from exact integer Σn and Σn² over the frame —
    not a float ``stddev`` window agg — so mean/var are single
    divisions of exact operands and the score reproduces bit-for-bit
    across engines and partition layouts; z is rounded to 6 dp on top.
    Sample variance (n−1) matches the usual control-chart convention.
    """
    ts = F.col(ts_col)
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        ts = ts.cast("timestamp")
    agg = events.groupBy(
        F.col(key_col).alias("key"),
        F.date_trunc(bucket, ts).alias("bucket_start"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_start")
        .rowsBetween(-trailing, -1)
    )
    cnt = F.count(F.lit(1)).over(w)
    s1 = F.sum("n").over(w)
    s2 = F.sum(F.col("n") * F.col("n")).over(w)
    mean = s1.cast("double") / cnt
    var = (s2.cast("double") - s1.cast("double") * s1 / cnt) / (cnt - 1)
    z = (F.col("n") - mean) / F.sqrt(var)
    return agg.select(
        "key", "bucket_start", "n",
        F.round(
            F.when((cnt == trailing) & (var > 0), z), 6
        ).alias("z"),
    )


def scd2_versions(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type-2 build → (key, attr,
    valid_from, valid_to, is_current): collapse an observation log
    into validity intervals, one row per consecutive run of the same
    attribute value per key. Change detection is null-safe
    (IS DISTINCT FROM), ties on ts break by ``id_col`` so the version
    chain is deterministic; the open version has NULL valid_to.

    One key-partitioned window ordering serves the lag (change
    detection) and the lead (interval close) — a single shuffle on the
    dimension key, the canonical warehouse shape.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    prev = F.lag(attr_col).over(w)
    changed = F.lag(F.lit(1)).over(w).isNull() | ~F.col(
        attr_col
    ).eqNullSafe(prev)
    starts = df.select(
        key_col, ts_col, id_col, attr_col, changed.alias("_chg")
    ).filter(F.col("_chg"))
    w2 = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    return starts.select(
        F.col(key_col),
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition table over per-user event
    sequences → (cur, nxt, n, p): how often each event type follows
    each other, with the row-normalized probability — the
    product-analytics "next step" matrix. One user-keyed lead window +
    one (cur, nxt) count; the per-cur normalizer rides a window over
    the |types|² count table (tiny by construction). p divides two
    exact integers → engine-reproducible.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    pairs = events.select(
        F.col(type_col).alias("cur"),
        F.lead(type_col).over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    counts = pairs.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = Window.partitionBy("cur")
    return counts.select(
        "cur", "nxt", "n",
        (F.col("n").cast("double") / F.sum("n").over(tot)).alias("p"),
    )


def active_users(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    grains: tuple[str, ...] = ("day", "week", "month"),
) -> DataFrame:
    """DAU/WAU/MAU in one pass → (grain, bucket, n_users): exact
    distinct users per bucket at every requested grain. Each event
    explodes to |grains| (grain, bucket) rows map-side, then ONE
    grouped exact distinct — the partial-dedup happens before the
    shuffle, so the wire carries (grain, bucket, user) distincts, not
    raw events.
    """
    g = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(gr).alias("grain"),
                    F.date_trunc(gr, F.col(ts_col)).alias("bucket"),
                )
                for gr in grains
            ]
        )
    ).alias("g")
    return (
        events.select(F.col(user_col).alias("u"), g)
        .select("u", "g.grain", "g.bucket")
        .groupBy("grain", "bucket")
        .agg(F.count_distinct("u").cast("long").alias("n_users"))
    )
