"""Round-5 operators: distributed prefix scan, Misra-Gries heavy
hitters, higher-moment stats, autocorrelation — python-model parity
and the scale-shape contracts."""

from __future__ import annotations

import math
import random
from decimal import Decimal

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_running_total_scan_matches_global_window(spark):
    """The two-phase prefix scan must equal the naive single-partition
    global window bit-for-bit (decimal sums both ways), on data big
    enough to span several range partitions."""
    from gcpdatapipelines_spark.operators.windows import running_total_scan

    rng = random.Random(7)
    rows = [(i, Decimal(rng.randint(-500, 1000)) / 100) for i in range(500)]
    df = spark.createDataFrame(rows, "id BIGINT, v DECIMAL(10,2)")

    got = {
        r["id"]: r["cum"]
        for r in running_total_scan(
            df, [F.col("v").desc(), F.col("id")], "v", num_partitions=7
        ).collect()
    }
    w = Window.orderBy(F.col("v").desc(), F.col("id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {r["id"]: r["cum"] for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert got == want


def test_running_total_scan_single_partition_degenerate(spark):
    from gcpdatapipelines_spark.operators.windows import running_total_scan

    df = spark.createDataFrame([(1, Decimal("2.00")), (2, Decimal("3.00"))], "id BIGINT, v DECIMAL(10,2)")
    got = sorted(
        (r["id"], r["cum"])
        for r in running_total_scan(df, [F.col("id")], "v", num_partitions=1).collect()
    )
    assert got == [(1, Decimal("2.00")), (2, Decimal("5.00"))]


def test_heavy_hitters_exact_on_skewed_data(spark):
    """MG candidates + exact recount == plain GROUP BY ... HAVING, on a
    Zipf-ish corpus with distinct values >> the k-1 counters (so the
    summaries really decrement), across an adversarial partitioning."""
    from gcpdatapipelines_spark.operators.skew import heavy_hitters

    rng = random.Random(11)
    # ~60 distinct items, zipf-ish counts; k=12 -> 11 counters
    vals = [int(rng.paretovariate(1.2)) % 60 for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "x BIGINT").repartition(9)

    k = 12
    got = {(r["item"], r["n"]) for r in heavy_hitters(df, F.col("x"), k=k).collect()}
    n = len(vals)
    counts: dict = {}
    for v in vals:
        counts[str(v)] = counts.get(str(v), 0) + 1
    want = {(v, c) for v, c in counts.items() if c * k > n}
    assert got == want
    assert want  # the fixture must actually contain heavy hitters


def test_skew_kurtosis_matches_python_moments(spark):
    from gcpdatapipelines_spark.operators.agg import skew_kurtosis_per_key

    rng = random.Random(3)
    vals = [round(rng.expovariate(0.05), 2) for _ in range(400)]
    df = spark.createDataFrame([("g", Decimal(str(v))) for v in vals], "k STRING, v DECIMAL(7,2)")
    row = skew_kurtosis_per_key(df, "k", F.col("v")).collect()[0]

    n = len(vals)
    m1 = sum(vals) / n
    m2 = sum(v * v for v in vals) / n - m1 * m1
    m3 = sum(v**3 for v in vals) / n - 3 * m1 * (sum(v * v for v in vals) / n) + 2 * m1**3
    m4 = (
        sum(v**4 for v in vals) / n
        - 4 * m1 * (sum(v**3 for v in vals) / n)
        + 6 * m1 * m1 * (sum(v * v for v in vals) / n)
        - 3 * m1**4
    )
    assert row["n"] == n
    assert abs(row["mean"] - m1) < 1e-4
    assert abs(row["skewness"] - m3 / math.sqrt(m2**3)) < 1e-4
    assert abs(row["kurtosis_excess"] - (m4 / (m2 * m2) - 3.0)) < 1e-4
    # an exponential sample is right-skewed with positive excess kurtosis
    assert row["skewness"] > 0.5


def test_autocorrelation_matches_numpy(spark):
    import datetime as dt

    import numpy as np

    from gcpdatapipelines_spark.operators.timeseries import autocorrelation

    rng = random.Random(5)
    # AR(1)-ish series: strong positive lag-1 autocorrelation
    x, series = 50.0, []
    for _ in range(300):
        x = 0.8 * x + 0.2 * 50 + rng.gauss(0, 5)
        series.append(round(x, 2))
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("s", t0 + dt.timedelta(minutes=i), i, v) for i, v in enumerate(series)],
        "k STRING, ts TIMESTAMP, eid BIGINT, v DOUBLE",
    )
    out = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in autocorrelation(df, "k", "ts", "eid", "v", max_lag=3).collect()
    }
    arr = np.array(series)
    for lag in (1, 2, 3):
        a, b = arr[lag:], arr[:-lag]
        want = np.corrcoef(a, b)[0, 1]
        n_pairs, acf = out[lag]
        assert n_pairs == len(series) - lag
        assert abs(acf - want) < 1e-4
    assert out[1][1] > 0.5  # AR(1) signal present
