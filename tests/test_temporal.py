"""Temporal operators: distributed as-of join and gap sessionization
(operators/temporal.py). Oracle-grade pinning happens via the driver
contract (`asof_join` / `sessionize` queries vs DuckDB); these tests pin
the edge semantics: inclusive ts equality, deterministic tie-break, rows
with no predecessor, gap boundary inclusivity, and session numbering."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row

from fsharp_data_validation_spark.operators.temporal import asof_join, sessionize

T0 = datetime(2026, 1, 1, 12, 0, 0)


def ts(sec):
    return T0 + timedelta(seconds=sec)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: clicks at 0, 10, 10 (tie), 30; errors at 5, 10, 20, 40
        Row(event_id=100, user_id=1, event_type="click", ts=ts(0)),
        Row(event_id=101, user_id=1, event_type="click", ts=ts(10)),
        Row(event_id=102, user_id=1, event_type="click", ts=ts(10)),
        Row(event_id=103, user_id=1, event_type="click", ts=ts(30)),
        Row(event_id=200, user_id=1, event_type="error", ts=ts(5)),
        Row(event_id=201, user_id=1, event_type="error", ts=ts(10)),
        Row(event_id=202, user_id=1, event_type="error", ts=ts(20)),
        Row(event_id=203, user_id=1, event_type="error", ts=ts(40)),
        # user 2: an error BEFORE any click -> no match
        Row(event_id=300, user_id=2, event_type="error", ts=ts(1)),
        Row(event_id=301, user_id=2, event_type="click", ts=ts(2)),
        Row(event_id=302, user_id=2, event_type="error", ts=ts(3)),
    ]
    return spark.createDataFrame(rows)


def test_asof_join_semantics(spark, events):
    errors = events.filter("event_type = 'error'").select("event_id", "user_id", "ts")
    clicks = events.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    out = {
        r["event_id"]: r["event_id_asof"]
        for r in asof_join(
            errors, clicks, by=["user_id"], right_cols=["event_id"], tie_col="event_id"
        ).collect()
    }
    assert out[200] == 100  # plain latest-before
    # inclusive equality + deterministic tie-break: ts=10 has clicks 101,102
    assert out[201] == 102
    assert out[202] == 102
    assert out[203] == 103
    assert out[300] is None  # no predecessor -> NULL, row kept
    assert out[302] == 301
    assert len(out) == 6  # every left row survives


def test_sessionize_boundaries(spark):
    rows = [
        # user 7: events at 0s, 100s (same session @gap 120), 221s (new:
        # gap 121 > 120), 341s (same: gap exactly 120 is NOT a new session)
        Row(event_id=1, user_id=7, ts=ts(0)),
        Row(event_id=2, user_id=7, ts=ts(100)),
        Row(event_id=3, user_id=7, ts=ts(221)),
        Row(event_id=4, user_id=7, ts=ts(341)),
        # user 8: single event -> single session of one
        Row(event_id=5, user_id=8, ts=ts(50)),
    ]
    df = spark.createDataFrame(rows)
    out = {
        (r["user_id"], r["session_no"]): (
            r["n_events"],
            r["session_start"],
            r["session_end"],
            r["duration_us"],
        )
        for r in sessionize(df, "user_id", "ts", "event_id", gap_seconds=120).collect()
    }
    assert out[(7, 1)] == (2, ts(0), ts(100), 100_000_000)
    assert out[(7, 2)] == (2, ts(221), ts(341), 120_000_000)
    assert out[(8, 1)] == (1, ts(50), ts(50), 0)
    assert len(out) == 3


def test_interval_join_bounds_buckets_and_keys(spark):
    """Pins: inclusive start AND end, intervals spanning multiple buckets,
    points outside every interval dropped, key isolation, duplicate match
    when intervals overlap."""
    from pyspark.sql import Row
    from fsharp_data_validation_spark.operators.temporal import interval_join

    points = spark.createDataFrame(
        [
            Row(pid=1, k="a", ts=ts(0)),      # == start (inclusive)
            Row(pid=2, k="a", ts=ts(7200)),   # == end, 2 buckets later
            Row(pid=3, k="a", ts=ts(7201)),   # 1s past end -> no match
            Row(pid=4, k="b", ts=ts(10)),     # right time, wrong key
            Row(pid=5, k="a", ts=ts(3600)),   # mid-interval, bucket boundary
        ]
    )
    intervals = spark.createDataFrame(
        [
            Row(iid=100, k="a", start_ts=ts(0), end_ts=ts(7200)),
            Row(iid=101, k="a", start_ts=ts(3600), end_ts=ts(3700)),  # overlap
        ]
    )
    out = interval_join(
        points, intervals, by=["k"], point_ts="ts",
        start_col="start_ts", end_col="end_ts", bucket_seconds=3600,
    )
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [(1, 100), (2, 100), (5, 100), (5, 101)]
