"""Time-series resample + gap-fill: semantics on hand-built frames and
plan shape (no global-calendar cross join)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gcpdatapipelines_spark.operators.timeseries import gapfill_ffill, resample_sum

T0 = dt.datetime(2024, 1, 1)


def _d(days):
    return T0 + dt.timedelta(days=days)


def _events(spark):
    rows = [
        # user 1: days 0, 1, 4 observed (gaps at 2, 3)
        (1, _d(0), 10.0),
        (1, _d(0) + dt.timedelta(hours=3), 2.5),
        (1, _d(1), 1.0),
        (1, _d(4), 7.0),
        # user 2: single day — no gaps, single-point grid
        (2, _d(2), 5.0),
    ]
    return spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP, value DOUBLE")


def test_resample_sum_daily(spark):
    obs = resample_sum(_events(spark), "user_id", "ts", "value", unit="day")
    got = {(r.user_id, r.bucket.day): r.v for r in obs.collect()}
    assert got[(1, 1)] == 12.5  # two same-day events summed
    assert got[(1, 2)] == 1.0
    assert got[(1, 5)] == 7.0
    assert got[(2, 3)] == 5.0
    assert len(got) == 4


def test_gapfill_fills_only_interior_gaps_and_ffills(spark):
    obs = resample_sum(_events(spark), "user_id", "ts", "value", unit="day")
    out = gapfill_ffill(obs, "user_id", unit="day").orderBy("user_id", "bucket")
    rows = [(r.user_id, r.bucket.day, r.value, r.is_gap) for r in out.collect()]
    assert rows == [
        (1, 1, 12.5, False),
        (1, 2, 1.0, False),
        (1, 3, 1.0, True),  # gap forward-filled from day 2
        (1, 4, 1.0, True),
        (1, 5, 7.0, False),
        (2, 3, 5.0, False),  # span is the key's own range: no padding
    ]


def test_gapfill_value_never_null_first_point_observed(spark):
    obs = resample_sum(_events(spark), "user_id", "ts", "value", unit="day")
    out = gapfill_ffill(obs, "user_id", unit="day")
    assert out.filter(F.col("value").isNull()).count() == 0


def test_gapfill_plan_no_cartesian(spark):
    obs = resample_sum(_events(spark), "user_id", "ts", "value", unit="day")
    plan = gapfill_ffill(obs, "user_id", unit="day")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gapfill_hour_unit(spark):
    rows = [(1, T0, 1.0), (1, T0 + dt.timedelta(hours=2), 3.0)]
    df = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP, value DOUBLE")
    obs = resample_sum(df, "user_id", "ts", "value", unit="hour")
    out = gapfill_ffill(obs, "user_id", unit="hour").orderBy("bucket")
    got = [(r.bucket.hour, r.value, r.is_gap) for r in out.collect()]
    assert got == [(0, 1.0, False), (1, 1.0, True), (2, 3.0, False)]
