"""Round-5 operators: distributed prefix scan, Misra-Gries heavy
hitters, higher-moment stats, autocorrelation — python-model parity
and the scale-shape contracts."""

from __future__ import annotations

import pytest

import math
import random
from decimal import Decimal

from pyspark.sql import Window
from pyspark.sql import functions as F

# Heavyweight parity/property sweep: slow tier (see conftest).
pytestmark = pytest.mark.slow



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


def test_chi2_independence_matches_python(spark):
    from gcpdatapipelines_spark.operators.agg import chi2_independence

    rng = random.Random(13)
    rows = [
        (rng.choice("abc"), rng.choice(["x", "y"]) if rng.random() < 0.8 else "x")
        for _ in range(600)
    ]
    df = spark.createDataFrame(rows, "r STRING, c STRING")
    got = chi2_independence(df, "r", "c").collect()[0]

    from collections import Counter

    obs = Counter(rows)
    rt = Counter(r for r, _ in rows)
    ct = Counter(c for _, c in rows)
    n = len(rows)
    chi2 = sum(
        (o - rt[r] * ct[c] / n) ** 2 / (rt[r] * ct[c] / n)
        for (r, c), o in obs.items()
    )
    assert got["n"] == n
    assert got["dof"] == (len(rt) - 1) * (len(ct) - 1)
    assert abs(got["chi2"] - chi2) < 1e-3


def test_mann_whitney_matches_python(spark):
    """U and tie-corrected z against a direct python rank computation
    (with tied values so the tie machinery is exercised)."""
    from gcpdatapipelines_spark.operators.agg import mann_whitney_u

    rng = random.Random(17)
    a = [round(rng.gauss(50, 10), 1) for _ in range(120)]
    b = [round(rng.gauss(55, 10), 1) for _ in range(140)]
    df = spark.createDataFrame(
        [(v, False) for v in a] + [(v, True) for v in b], "v DOUBLE, isb BOOLEAN"
    )
    got = mann_whitney_u(df, F.col("isb"), "v").collect()[0]

    allv = sorted(a + b)
    # average ranks
    import collections

    first = {}
    cnt = collections.Counter(allv)
    pos = 1
    for v in sorted(cnt):
        first[v] = pos
        pos += cnt[v]
    avg_rank = {v: first[v] + (cnt[v] - 1) / 2 for v in cnt}
    ra = sum(avg_rank[v] for v in a)
    na, nb = len(a), len(b)
    n = na + nb
    u = ra - na * (na + 1) / 2
    tie = sum(c**3 - c for c in cnt.values())
    var = (na * nb / 12) * ((n + 1) - tie / (n * (n - 1)))
    z = (u - na * nb / 2) / math.sqrt(var)
    assert got["n_a"] == na and got["n_b"] == nb
    assert abs(got["u_stat"] - u) < 0.6
    assert abs(got["z"] - z) < 1e-3


def test_kaplan_meier_textbook_example(spark):
    """Classic small example with deaths, censoring, and ties."""
    from gcpdatapipelines_spark.operators.timeseries import kaplan_meier

    # (duration, observed): deaths at 1 (x2), 3; censored at 2, 3, 4
    rows = [(1, 1), (1, 1), (2, 0), (3, 1), (3, 0), (4, 0)]
    df = spark.createDataFrame(rows, "duration BIGINT, observed INT")
    out = {r["duration"]: r for r in kaplan_meier(df).collect()}

    # t=1: risk 6, d 2 -> S = 4/6
    # t=2: risk 4, d 0 -> S unchanged
    # t=3: risk 3, d 1 -> S = 4/6 * 2/3
    # t=4: risk 1, d 0 -> S unchanged
    assert out[1]["n_risk"] == 6 and out[1]["n_events"] == 2
    assert abs(out[1]["survival"] - 4 / 6) < 1e-6
    assert out[2]["n_risk"] == 4 and out[2]["n_censored"] == 1
    assert abs(out[2]["survival"] - 4 / 6) < 1e-6
    assert out[3]["n_risk"] == 3 and out[3]["n_events"] == 1
    assert abs(out[3]["survival"] - (4 / 6) * (2 / 3)) < 1e-6
    assert out[4]["n_risk"] == 1
    assert abs(out[4]["survival"] - (4 / 6) * (2 / 3)) < 1e-6


def test_bfs_levels_matches_python(spark):
    from collections import deque

    from gcpdatapipelines_spark.operators.graph import bfs_levels

    rng = random.Random(23)
    nodes = list(range(40))
    edges = {tuple(sorted(rng.sample(nodes, 2))) for _ in range(70)}
    edf = spark.createDataFrame(sorted(edges), "u BIGINT, v BIGINT")
    src = spark.createDataFrame([(0,)], "node BIGINT")

    got = {r["node"]: r["depth"] for r in bfs_levels(edf, src, max_depth=4).collect()}

    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    want, q = {0: 0}, deque([0])
    while q:
        u = q.popleft()
        if want[u] >= 4:
            continue
        for v in adj.get(u, []):
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)
    assert got == want


def test_binary_hamming_recall_vs_bruteforce(spark):
    """The 1-bit + rerank path must recover most true top-10 neighbors
    (recall@10 >= 0.6 on random-ish data with rerank=50)."""
    from gcpdatapipelines_spark.io import read_table
    from gcpdatapipelines_spark.operators.similarity import (
        binary_hamming_topk,
        brute_force_topk,
    )
    from tests.conftest import SF_SMOKE

    emb = read_table(spark, SF_SMOKE, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {
        (r["q_id"], r["vec_id"])
        for r in brute_force_topk(emb, qs, k=10).collect()
    }
    approx = {
        (r["q_id"], r["vec_id"])
        for r in binary_hamming_topk(emb, qs, k=10, rerank=50).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"recall@10 = {recall}"
