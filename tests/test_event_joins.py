"""as-of join / bucketed range join / multi-grain rollup hand cases."""

from datetime import datetime

from pyspark.sql import functions as F

from renard_spark.functions import events as fevents


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_hand_case(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),  # before any right -> NULL
            (2, 10, _ts("2024-01-01T12:00:00")),  # matches r1 (11:00)
            (3, 10, _ts("2024-01-01T13:00:00")),  # ties r2 exactly -> r2
            (4, 20, _ts("2024-01-01T12:00:00")),  # other user -> r3
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (101, 10, _ts("2024-01-01T11:00:00"), 5.0),
            (102, 10, _ts("2024-01-01T13:00:00"), 7.0),
            (103, 20, _ts("2024-01-01T01:00:00"), 9.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = fevents.asof_join(
        left, right, on="user_id", ts_col="ts",
        right_cols=["event_id", "value"],
    )
    got = {r.event_id: (r.event_id_r, r.value_r) for r in out.collect()}
    assert got == {
        1: (None, None), 2: (101, 5.0), 3: (102, 7.0), 4: (103, 9.0)
    }
    assert out.count() == left.count()  # left join: every left row kept


def test_range_join_buckets_hand_case(spark):
    points = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:30:00")),  # inside iv A
            (2, 10, _ts("2024-01-01T11:10:00")),  # inside iv A (2nd bucket)
            (3, 10, _ts("2024-01-01T11:30:00")),  # == A.end -> excluded
            (4, 10, _ts("2024-01-01T09:59:59")),  # before A
            (5, 20, _ts("2024-01-01T10:30:00")),  # other user, no iv
        ],
        "event_id long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(7, 10, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:30:00"))],
        "iv_id long, user_id long, start timestamp, end timestamp",
    )
    out = fevents.range_join_buckets(
        points, intervals, on="user_id", ts_col="ts", bucket="1 hour"
    )
    assert sorted(r.event_id for r in out.collect()) == [1, 2]


def test_range_join_end_on_bucket_boundary(spark):
    # interval ending exactly on a bucket edge must NOT explode into
    # that bucket (end-exclusive), and a point at end-1us still joins
    points = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T10:59:59.999999")),
         (2, 10, _ts("2024-01-01T11:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(7, 10, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00"))],
        "iv_id long, user_id long, start timestamp, end timestamp",
    )
    out = fevents.range_join_buckets(points, intervals, bucket="1 hour")
    assert sorted(r.event_id for r in out.collect()) == [1]


def test_hypertable_rollup_hand_case(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:10:00"), "click", 1.0),
            (2, _ts("2024-01-01T10:50:00"), "click", 2.0),
            (3, _ts("2024-01-01T11:10:00"), "click", 4.0),
            (4, _ts("2024-01-02T00:10:00"), "view", 8.0),
        ],
        "event_id long, ts timestamp, event_type string, value double",
    )
    out = fevents.hypertable_rollup(ev)
    got = {
        (r.grain, r.bucket.isoformat(), r.event_type): (r.n, r.total_value)
        for r in out.collect()
    }
    assert got[("hour", "2024-01-01T10:00:00", "click")] == (2, 3.0)
    assert got[("hour", "2024-01-01T11:00:00", "click")] == (1, 4.0)
    assert got[("day", "2024-01-01T00:00:00", "click")] == (3, 7.0)
    assert got[("day", "2024-01-02T00:00:00", "view")] == (1, 8.0)
    assert got[("hour", "2024-01-02T00:00:00", "view")] == (1, 8.0)
    assert len(got) == 5  # 3 hour groups + 2 day groups


def test_rolling_features_window_semantics(spark):
    from renard_spark.functions.events import rolling_features

    rows = [
        (1, "2024-01-01 00:00:00", 10, 1.0),
        (2, "2024-01-01 00:01:00", 10, 2.0),
        (3, "2024-01-01 00:02:00", 10, 4.0),
        (4, "2024-01-01 00:03:00", 10, 8.0),
        (5, "2024-01-01 00:00:30", 20, 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "value")
    got = {r.event_id: r for r in rolling_features(ev, k=2).collect()}
    # first event per user: empty frame
    assert got[1].roll_n == 0 and got[1].roll_mean is None
    assert got[1].delta_prev is None
    # frame is the previous k events, EXCLUSIVE of the current row
    assert got[3].roll_n == 2 and got[3].roll_mean == 1.5
    assert got[4].roll_n == 2 and got[4].roll_sum == 6.0  # 2+4, 1 aged out
    assert got[4].roll_max == 4.0 and got[4].delta_prev == 4.0
    # user isolation
    assert got[5].roll_n == 0
