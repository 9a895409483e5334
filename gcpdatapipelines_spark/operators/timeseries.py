"""Time-series regularization: per-key calendar resampling with
gap-filling and forward-fill.

The standard shape between an irregular event log and anything that
wants a dense series (forecasting features, rate-of-change windows,
charting): aggregate to a fixed calendar grain, materialize the
missing grain points per key, and carry the last observation forward.
No reference analogue (the reference's log pipeline stops at per-visit
duration, pipeline.py:44-71) — this is training-data-pipeline surface.

Scale shape: ONE shuffle on the key for the grain aggregate; the grid
is generated per key with ``sequence()`` + ``explode`` (narrow — no
driver-side calendar, no cross join against a date dimension), the
observed/grid join is keyed on (key, grain) so it co-partitions with
the aggregate, and the forward-fill is a window pass sharing that same
partitioning. Per-key grid length is bounded by the key's own time
span — a key observed for a day does not pay for the corpus' full
range (the cross-join-against-global-calendar anti-pattern does, and
also breaks partition pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_sum(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    unit: str = "day",
    decimal_type: str = "decimal(18,6)",
) -> DataFrame:
    """(key, bucket, v): per-key per-grain sum of ``value_col`` with an
    EXACT decimal sum cast back to double (engines' double sums
    reassociate; decimal sums are associative — NOTES.md MONEY SUMS).
    ``unit``: any date_trunc grain ('hour', 'day', 'week', ...)."""
    return (
        df.groupBy(
            F.col(key), F.date_trunc(unit, F.col(ts_col)).alias("bucket")
        )
        .agg(F.sum(F.col(value_col).cast(decimal_type)).cast("double").alias("v"))
    )


def resample_ohlc(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Per-key per-grain OHLC bar: open/close are the first/last raw
    values in (ts, tiebreak) order, high/low are max/min, plus an
    event count and an EXACT decimal volume sum. The downsampling
    shape behind candlestick charts, rate-of-change features, and
    metric rollups over irregular logs.

    Determinism: open/close pick via ``min_by``/``max_by`` on a
    zero-padded ``(epoch_micros, tiebreak)`` string key — strings
    compare identically in every engine, and the padding makes
    lexicographic order equal numeric order, so same-timestamp events
    resolve the same way everywhere (struct-valued arg_min is not
    portable). All four price columns are COPIES of raw doubles
    (never arithmetic), so parity is exact by construction; the
    volume sum is decimal-exact then cast back (NOTES.md MONEY SUMS).

    Scale shape: ONE partial+final hash aggregate on (key, grain) —
    min_by/max_by carry a single (value, key-string) pair per group
    through the map-side combine, so the shuffle moves one row per
    (key, grain), not per event."""
    sort_key = F.concat(
        F.lpad(F.unix_micros(F.col(ts_col)).cast("string"), 20, "0"),
        F.lpad(F.col(tiebreak_col).cast("string"), 12, "0"),
    )
    return df.groupBy(
        F.col(key), F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    ).agg(
        F.min_by(F.col(value_col), sort_key).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(F.col(value_col), sort_key).alias("close"),
        F.count("*").alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double").alias("vsum"),
    )


def gapfill_ffill(
    observed: DataFrame,
    key: str,
    bucket_col: str = "bucket",
    value_col: str = "v",
    unit: str = "day",
) -> DataFrame:
    """Densify a per-key per-grain series over each key's own
    [min(bucket), max(bucket)] span and forward-fill missing grains.

    Returns (key, bucket, value, is_gap): ``value`` is the observed
    grain value or the most recent preceding observation (forward-
    fill never invents arithmetic, it copies a value — so parity with
    any other engine is exact by construction); ``is_gap`` marks the
    filled rows. The first grid point per key is always observed, so
    ``value`` is never NULL.

    Plan shape: per-key bounds are one partial-aggregable groupBy; the
    grid explodes ``sequence(min, max, interval 1 <unit>)`` (narrow);
    the grid⋈observed join and the fill window both run on (key,
    bucket) — AQE coalesces the three same-key exchanges. Keys with
    pathological spans (one event in 1970, one today) should be
    span-capped upstream; the grid is per-key-linear, never global.
    """
    interval = F.expr(f"interval 1 {unit}")
    bounds = observed.groupBy(key).agg(
        F.min(bucket_col).alias("__mn"), F.max(bucket_col).alias("__mx")
    )
    grid = bounds.select(
        key,
        F.explode(
            F.sequence(F.col("__mn"), F.col("__mx"), interval)
        ).alias(bucket_col),
    )
    joined = grid.join(observed, on=[key, bucket_col], how="left")
    w = (
        Window.partitionBy(key)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key,
        F.col(bucket_col),
        F.last(F.col(value_col), ignorenulls=True).over(w).alias("value"),
        F.col(value_col).isNull().alias("is_gap"),
    )
