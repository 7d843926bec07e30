"""Edge-case semantics + plan shape for operators/temporal.py."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from medical_ocr_service_spark.operators.temporal import as_of_join, sessionize


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_inclusive_equal_ts_and_no_match(spark):
    probe = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),  # exactly at build ts -> match
            (2, 10, _ts("2024-01-01T09:59:59")),  # before any build -> NULL
            (3, 10, _ts("2024-01-01T11:30:00")),  # between builds -> 10:00 row
            (4, 99, _ts("2024-01-01T12:00:00")),  # key with no builds -> NULL
        ],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    build = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T10:00:00"), 1.5),
            (10, _ts("2024-01-01T12:00:00"), 2.5),
        ],
        "user_id long, ts timestamp_ntz, value double",
    )
    out = {
        r["event_id"]: (r["asof_ts"], r["asof_value"])
        for r in as_of_join(probe, build, on="user_id").collect()
    }
    assert out[1] == (_ts("2024-01-01T10:00:00"), 1.5)  # <= is inclusive
    assert out[2] == (None, None)
    assert out[3] == (_ts("2024-01-01T10:00:00"), 1.5)
    assert out[4] == (None, None)


def test_asof_duplicate_build_ts_resolves_to_max_payload(spark):
    probe = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T10:00:01"))],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    build = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T10:00:00"), 1.0),
            (10, _ts("2024-01-01T10:00:00"), 7.0),  # tied ts: max payload wins
        ],
        "user_id long, ts timestamp_ntz, value double",
    )
    row = as_of_join(probe, build, on="user_id").collect()[0]
    assert row["asof_value"] == 7.0


def test_asof_single_exchange_no_join(spark):
    probe = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T10:00:00"))],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    build = spark.createDataFrame(
        [(10, _ts("2024-01-01T09:00:00"), 1.0)],
        "user_id long, ts timestamp_ntz, value double",
    )
    plan = as_of_join(probe, build, on="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan  # union-and-scan, not a range join
    # exactly ONE exchange: hashpartitioning(user_id) feeding the merge scan
    assert plan.count("Exchange") == 1, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_sessionize_gap_boundary(spark):
    t0 = _ts("2024-01-01T00:00:00")
    rows = [
        (1, 7, t0),
        (2, 7, t0 + dt.timedelta(minutes=30)),            # exactly 30' -> same
        (3, 7, t0 + dt.timedelta(minutes=60, seconds=1)),  # 30'01" gap -> new
        (4, 8, t0),                                        # other key
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp_ntz")
    out = sessionize(df, key="user_id", ts="ts", tiebreak="event_id").collect()
    by = {(r["user_id"], r["session_id"]): r for r in out}
    assert set(by) == {(7, 1), (7, 2), (8, 1)}
    assert by[(7, 1)]["n_events"] == 2
    assert by[(7, 1)]["duration_us"] == 30 * 60 * 1_000_000
    assert by[(7, 2)]["n_events"] == 1
    assert by[(7, 2)]["duration_us"] == 0
    assert by[(8, 1)]["n_events"] == 1


def test_sessionize_partial_agg_before_final_exchange(spark):
    df = spark.createDataFrame(
        [(i, i % 3, _ts("2024-01-01T00:00:00") + dt.timedelta(minutes=i)) for i in range(30)],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    plan = sessionize(df)._jdf.queryExecution().executedPlan().toString()
    # the final (key, session_id) aggregate must map-side combine so the
    # second exchange ships per-session partials, not raw events
    assert "partial_count" in plan or "partial" in plan.lower(), plan


def test_range_join_boundaries_and_multi_bucket(spark):
    from medical_ocr_service_spark.operators.temporal import range_join

    # bucket_minutes=60: the 10:30->13:30 interval spans 4 hourly buckets;
    # matches must come through exactly one bucket each (no dup rows).
    intervals = spark.createDataFrame(
        [
            (100, 1, _ts("2024-01-01T10:30:00"), _ts("2024-01-01T13:30:00")),
            (200, 1, _ts("2024-01-02T00:00:00"), _ts("2024-01-02T00:00:00")),  # empty
            (300, 2, _ts("2024-01-01T10:30:00"), _ts("2024-01-01T13:30:00")),  # other key
        ],
        "window_id long, user_id long, lo timestamp_ntz, hi timestamp_ntz",
    )
    points = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01T10:30:00")),  # == lo -> inclusive
            (2, 1, _ts("2024-01-01T13:30:00")),  # == hi -> exclusive
            (3, 1, _ts("2024-01-01T12:59:59")),  # mid-interval, bucket 2
            (4, 1, _ts("2024-01-01T10:29:59")),  # just before lo
            (5, 2, _ts("2024-01-02T00:00:00")),  # empty interval never matches
        ],
        "point_id long, user_id long, ts timestamp_ntz",
    )
    rows = range_join(points, intervals, on="user_id", bucket_minutes=60).collect()
    got = sorted((r["point_id"], r["window_id"]) for r in rows)
    assert got == [(1, 100), (3, 100)]


def test_range_join_no_nested_loop_join(spark):
    from medical_ocr_service_spark.operators.temporal import range_join

    intervals = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00"))],
        "window_id long, user_id long, lo timestamp_ntz, hi timestamp_ntz",
    )
    points = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T10:30:00"))],
        "point_id long, user_id long, ts timestamp_ntz",
    )
    plan = (
        range_join(points, intervals, on="user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
