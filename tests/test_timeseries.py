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


# ---------------------------------------------------------------------------
# merge_intervals (gaps-and-islands)
# ---------------------------------------------------------------------------

from gcpdatapipelines_spark.operators.timeseries import (  # noqa: E402
    merge_intervals,
    rolling_zscore,
    seasonal_index,
)


def _m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_merge_intervals_basic_islands(spark):
    rows = [
        # user 1: 0,10,25 chain (each within 30m of the last) then 120 alone
        (1, _m(0), 1),
        (1, _m(10), 2),
        (1, _m(25), 3),
        (1, _m(120), 4),
        # user 2: single event
        (2, _m(5), 5),
    ]
    df = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP, event_id BIGINT")
    out = merge_intervals(df, "user_id", "ts", "event_id").orderBy(
        "user_id", "started_at"
    )
    got = [
        (r.user_id, r.started_at.minute, r.ended_at.minute, r.n_events)
        for r in out.collect()
    ]
    assert got == [(1, 0, 25, 3), (1, 0, 0, 1), (2, 5, 5, 1)]


def test_merge_intervals_chain_extends_past_first_gap(spark):
    # 0 -> 25 -> 50: each hop < 30m though 50 is > 30m from 0; one island.
    rows = [(1, _m(0), 1), (1, _m(25), 2), (1, _m(50), 3)]
    df = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP, event_id BIGINT")
    out = merge_intervals(df, "user_id", "ts", "event_id")
    assert out.count() == 1
    r = out.first()
    assert (r.started_at.minute, r.ended_at.minute, r.n_events) == (0, 50, 3)


def test_merge_intervals_plan_single_shuffle_family(spark):
    rows = [(1, _m(0), 1)]
    df = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP, event_id BIGINT")
    plan = (
        merge_intervals(df, "user_id", "ts", "event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "Join" not in plan  # pure window + agg, never a self-join


# ---------------------------------------------------------------------------
# seasonal_index
# ---------------------------------------------------------------------------


def test_seasonal_index_values(spark):
    rows = [
        ("a", T0.replace(hour=1), 10.0),
        ("a", T0.replace(hour=1), 30.0),  # hour 1 mean 20
        ("a", T0.replace(hour=2), 10.0),  # hour 2 mean 10; overall mean 50/3
    ]
    df = spark.createDataFrame(rows, "event_type STRING, ts TIMESTAMP, value DOUBLE")
    out = {r.grain: r for r in seasonal_index(df, "event_type", "ts", "value").collect()}
    overall = 50.0 / 3.0
    assert out[1].season_idx == round(20.0 / overall, 6)
    assert out[2].season_idx == round(10.0 / overall, 6)
    assert out[1].n_obs == 2 and out[2].n_obs == 1


# ---------------------------------------------------------------------------
# rolling_zscore
# ---------------------------------------------------------------------------


def test_rolling_zscore_flags_spike_only(spark):
    # 12 steady values then one large spike; priors-only window means the
    # spike cannot mask itself.
    rows = [("a", _m(i), i, 10.0 + (i % 2) * 0.2) for i in range(12)]
    rows.append(("a", _m(12), 12, 50.0))
    df = spark.createDataFrame(
        rows, "event_type STRING, ts TIMESTAMP, event_id BIGINT, value DOUBLE"
    )
    out = rolling_zscore(df, "event_type", "ts", "event_id", "value").collect()
    assert len(out) == 1
    assert out[0].value == 50.0 and out[0].zscore > 3


def test_rolling_zscore_zero_variance_and_min_obs_guard(spark):
    # constant series: variance 0 -> never scored, never raises
    rows = [("a", _m(i), i, 5.0) for i in range(15)]
    df = spark.createDataFrame(
        rows, "event_type STRING, ts TIMESTAMP, event_id BIGINT, value DOUBLE"
    )
    assert rolling_zscore(df, "event_type", "ts", "event_id", "value").count() == 0
    # fewer than min_obs priors: nothing scored even with variance
    rows2 = [("a", _m(i), i, float(i)) for i in range(5)]
    df2 = spark.createDataFrame(
        rows2, "event_type STRING, ts TIMESTAMP, event_id BIGINT, value DOUBLE"
    )
    assert rolling_zscore(df2, "event_type", "ts", "event_id", "value").count() == 0


# ---------------------------------------------------------------------------
# period_over_period
# ---------------------------------------------------------------------------

from gcpdatapipelines_spark.operators.timeseries import period_over_period  # noqa: E402


def test_period_over_period_weekly(spark):
    rows = [
        ("a", _d(0), 10.0),
        ("a", _d(1), 10.0),   # period 0 of this span: 20
        ("a", _d(8), 30.0),   # next week: 30 -> +50%
        ("a", _d(22), 15.0),  # skips a week; change vs last OBSERVED period
    ]
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP, v DOUBLE")
    out = sorted(
        period_over_period(df, "k", "ts", "v", period_days=7).collect(),
        key=lambda r: r.period,
    )
    assert [r.psum for r in out] == [20.0, 30.0, 15.0]
    assert out[0].pop_pct is None
    assert out[1].pop_pct == 0.5
    assert out[2].pop_pct == -0.5


# ---------------------------------------------------------------------------
# changepoint_single
# ---------------------------------------------------------------------------

from gcpdatapipelines_spark.operators.timeseries import changepoint_single  # noqa: E402


def test_changepoint_finds_the_level_shift(spark):
    # 10 points at ~1.0 then 10 at ~5.0: split belongs at position 10
    rows = [("a", _m(i), i, 1.0 + (i % 3) * 0.01) for i in range(10)]
    rows += [("a", _m(10 + i), 10 + i, 5.0 + (i % 3) * 0.01) for i in range(10)]
    df = spark.createDataFrame(
        rows, "event_type STRING, ts TIMESTAMP, event_id BIGINT, value DOUBLE"
    )
    r = changepoint_single(df, "event_type", "ts", "event_id", "value").first()
    assert r.split_pos == 10
    assert abs(r.mean_left - 1.01) < 0.01 and abs(r.mean_right - 5.01) < 0.01
    assert r.shift > 3.9


def test_changepoint_respects_min_seg(spark):
    rows = [("a", _m(i), i, float(i)) for i in range(12)]
    df = spark.createDataFrame(
        rows, "event_type STRING, ts TIMESTAMP, event_id BIGINT, value DOUBLE"
    )
    r = changepoint_single(df, "event_type", "ts", "event_id", "value", min_seg=5).first()
    assert 5 <= r.split_pos <= 7  # only positions 5..7 are candidates


def test_merge_intervals_agrees_with_session_window(spark, sf_dir):
    """The batch gaps-and-islands operator and Spark's session_window
    partition events into IDENTICAL sessions (same starts, same
    sizes) — pins that the two tiers (batch interval merge, streaming
    sessionizer) implement one semantics."""
    from gcpdatapipelines_spark.io import read_table

    ev = read_table(spark, sf_dir, "events")
    ours = {
        (r.user_id, r.started_at): r.n_events
        for r in merge_intervals(ev, "user_id", "ts", "event_id").collect()
    }
    sw = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("started_at"),
            "n_events",
        )
    )
    theirs = {(r.user_id, r.started_at): r.n_events for r in sw.collect()}
    assert ours == theirs


from gcpdatapipelines_spark.operators.timeseries import seasonal_anomaly  # noqa: E402


def test_seasonal_anomaly_respects_the_daily_cycle(spark):
    """A value that is normal FOR ITS HOUR must not flag even if it is
    2x the global mean; the same raw value in a low hour must flag."""
    rows = []
    eid = 0
    for i in range(30):
        rows.append(("a", dt.datetime(2024, 1, 1 + i % 5, 1, i), eid, 200.0 + i % 3))
        eid += 1
        rows.append(("a", dt.datetime(2024, 1, 1 + i % 5, 2, i), eid, 100.0 + i % 3))
        eid += 1
    # spike: hour-2 observation at the hour-1 level (2x its hour mean)
    rows.append(("a", dt.datetime(2024, 1, 6, 2, 30), 9001, 200.0))
    # control: hour-1 observation at the hour-1 level (in-cycle, benign)
    rows.append(("a", dt.datetime(2024, 1, 6, 1, 30), 9002, 200.0))
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    out = seasonal_anomaly(
        df, "event_type", "ts", "event_id", "value", min_obs=30
    ).collect()
    flagged = {r["event_id"] for r in out}
    assert 9001 in flagged
    assert 9002 not in flagged
    spike = [r for r in out if r["event_id"] == 9001][0]
    assert spike["zscore"] > 3.0


from gcpdatapipelines_spark.operators.timeseries import cusum_alarms  # noqa: E402


def test_cusum_catches_small_persistent_shift(spark):
    """A +1-sigma sustained shift must alarm even though no single
    point is a 3-sigma outlier (the case rolling z-score misses);
    the pre-shift stretch must stay quiet."""
    rows = []
    # reference: 60 points alternating 99/101 (mu=100, sigma~1)
    for i in range(60):
        rows.append(("m", dt.datetime(2024, 1, 1, 0, i), i, 99.0 + 2 * (i % 2)))
    # shift: 20 points alternating 100/102 (mu+1, ~1 sigma up, never extreme)
    for i in range(20):
        rows.append(("m", dt.datetime(2024, 1, 1, 1, i), 100 + i, 100.0 + 2 * (i % 2)))
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    out = cusum_alarms(df, "event_type", "ts", "event_id", "value").collect()
    assert out, "sustained small shift must trip the CUSUM limit"
    # every alarm is inside the shifted stretch
    assert all(r["event_id"] >= 100 for r in out)


def test_cusum_quiet_on_stationary_data(spark):
    rows = [
        ("m", dt.datetime(2024, 1, 1, 0, i), i, 99.0 + 2 * (i % 2))
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    assert cusum_alarms(df, "event_type", "ts", "event_id", "value").count() == 0


def test_cusum_period_reset_bounds_state(spark):
    """The fold is scoped to the monitoring period: a shift split
    across a period boundary restarts accumulation — alarms (if any)
    must come from within one period's own fold, which is what keeps
    per-group state bounded at scale."""
    rows = []
    # 40 reference points, all inside epoch-week floor(19726/7)=2818
    for i in range(40):
        rows.append(("m", dt.datetime(2024, 1, 4, 0, i), i, 99.0 + 2 * (i % 2)))
    # epoch-week boundary: day 19732 (Jan 10) is week 2818, day 19733
    # (Jan 11) is week 2819. Two shifted points on each side: each
    # 2-point run accumulates ~2.5 < h~4.5; an unreset 4-point run
    # would reach ~5.0 > h and alarm.
    for i in range(2):
        rows.append(("m", dt.datetime(2024, 1, 10, 23, 58 + i), 200 + i, 102.0))
    for i in range(2):
        rows.append(("m", dt.datetime(2024, 1, 11, 0, i), 300 + i, 102.0))
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    out = cusum_alarms(df, "event_type", "ts", "event_id", "value").collect()
    assert out == []
