"""Round-6 operators: mutual information / Cramér's V, CUPED
adjustment, WoE/IV encoding, theta-sketch set ops, snapshot drift —
python-model parity and determinism contracts."""

from __future__ import annotations

import pytest

import math
import random
from decimal import Decimal

from pyspark.sql import functions as F

# Heavyweight parity/property sweep: slow tier (see conftest).
pytestmark = pytest.mark.slow



# ---------------------------------------------------------------------------
# mutual_info_cramers_v
# ---------------------------------------------------------------------------


def _mi_fixture(spark):
    rows = []
    # deterministic dependent joint: r in {a,b,c}, c skewed per r
    counts = {("a", "x"): 30, ("a", "y"): 10, ("b", "x"): 5,
              ("b", "y"): 40, ("c", "x"): 20, ("c", "y"): 20}
    for (r, c), n in counts.items():
        rows += [(r, c)] * n
    return spark.createDataFrame(rows, "r STRING, c STRING"), counts


def test_mutual_info_matches_python_model(spark):
    from gcpdatapipelines_spark.operators.agg import mutual_info_cramers_v

    df, counts = _mi_fixture(spark)
    got = mutual_info_cramers_v(df, "r", "c").collect()[0]

    n = sum(counts.values())
    rt = {}
    ct = {}
    for (r, c), o in counts.items():
        rt[r] = rt.get(r, 0) + o
        ct[c] = ct.get(c, 0) + o
    mi = sum(
        (o / n) * math.log(o * n / (rt[r] * ct[c]))
        for (r, c), o in counts.items()
    )
    chi2 = sum(
        (o - rt[r] * ct[c] / n) ** 2 / (rt[r] * ct[c] / n)
        for (r, c), o in counts.items()
    )
    v = math.sqrt(chi2 / (n * (min(len(rt), len(ct)) - 1)))
    assert got["n"] == n
    assert abs(got["mi_nats"] - mi) < 1e-5
    assert abs(got["cramers_v"] - v) < 1e-5


def test_mutual_info_zero_when_independent(spark):
    from gcpdatapipelines_spark.operators.agg import mutual_info_cramers_v

    # perfectly independent joint: every (r, c) cell count = rt*ct/n
    rows = []
    for r, nr in [("a", 2), ("b", 3)]:
        for c, nc in [("x", 4), ("y", 6)]:
            rows += [(r, c)] * (nr * nc)
    df = spark.createDataFrame(rows, "r STRING, c STRING")
    got = mutual_info_cramers_v(df, "r", "c").collect()[0]
    assert abs(got["mi_nats"]) < 1e-9
    assert abs(got["cramers_v"]) < 1e-9


def test_mutual_info_deterministic_under_partitioning(spark):
    from gcpdatapipelines_spark.operators.agg import mutual_info_cramers_v

    df, _ = _mi_fixture(spark)
    a = mutual_info_cramers_v(df, "r", "c").collect()[0]
    b = mutual_info_cramers_v(df.repartition(13), "r", "c").collect()[0]
    assert a == b


# ---------------------------------------------------------------------------
# cuped_adjusted_means
# ---------------------------------------------------------------------------


def _cuped_fixture(spark):
    rng = random.Random(11)
    rows = []
    for i in range(400):
        arm = "t" if i % 2 else "c"
        x = Decimal(rng.randint(0, 10000)) / 100
        noise = Decimal(rng.randint(-2000, 2000)) / 100
        lift = Decimal("5.00") if arm == "t" else Decimal("0.00")
        y = (x * 2 + noise + lift).quantize(Decimal("0.01"))
        rows.append((i, arm, x, y))
    return (
        spark.createDataFrame(
            rows, "unit BIGINT, arm STRING, x DECIMAL(18,2), y DECIMAL(18,2)"
        ),
        rows,
    )


def test_cuped_matches_python_model(spark):
    from gcpdatapipelines_spark.operators.agg import cuped_adjusted_means

    df, rows = _cuped_fixture(spark)
    got = {r["arm"]: r for r in cuped_adjusted_means(df, "x", "y", "arm").collect()}

    xs = [float(r[2]) for r in rows]
    ys = [float(r[3]) for r in rows]
    n = len(rows)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum(x * y for x, y in zip(xs, ys)) / n - mx * my
    var = sum(x * x for x in xs) / n - mx * mx
    theta = cov / var
    for arm in ("t", "c"):
        sub = [(float(r[2]), float(r[3])) for r in rows if r[1] == arm]
        mean_y = sum(y for _, y in sub) / len(sub)
        mean_x = sum(x for x, _ in sub) / len(sub)
        adj = mean_y - theta * (mean_x - mx)
        assert abs(got[arm]["mean_y"] - mean_y) < 1e-4
        assert abs(got[arm]["mean_y_adj"] - adj) < 1e-4
        assert abs(got[arm]["theta"] - theta) < 1e-4
    # rho2 in (0, 1]: x strongly predicts y by construction
    assert 0.5 < got["t"]["rho2"] <= 1.0


def test_cuped_preserves_weighted_mean(spark):
    """CUPED shifts each arm by theta·(mx_arm - mx); the unit-weighted
    average of adjusted means equals the raw overall mean (the
    adjustment is mean-zero overall), so no aggregate lift is
    invented."""
    from gcpdatapipelines_spark.operators.agg import cuped_adjusted_means

    df, rows = _cuped_fixture(spark)
    got = cuped_adjusted_means(df, "x", "y", "arm").collect()
    n = sum(r["n_units"] for r in got)
    w_adj = sum(r["mean_y_adj"] * r["n_units"] for r in got) / n
    my = sum(float(r[3]) for r in rows) / len(rows)
    assert abs(w_adj - my) < 1e-4


def test_cuped_reduces_arm_gap_noise(spark):
    """With y ≈ 2x + lift, the adjusted treatment-control gap must be
    closer to the planted lift (5.0) than the raw gap is (x imbalance
    between arms is the noise CUPED removes)."""
    from gcpdatapipelines_spark.operators.agg import cuped_adjusted_means

    df, _ = _cuped_fixture(spark)
    got = {r["arm"]: r for r in cuped_adjusted_means(df, "x", "y", "arm").collect()}
    raw_gap = got["t"]["mean_y"] - got["c"]["mean_y"]
    adj_gap = got["t"]["mean_y_adj"] - got["c"]["mean_y_adj"]
    assert abs(adj_gap - 5.0) <= abs(raw_gap - 5.0) + 1e-9


# ---------------------------------------------------------------------------
# woe_iv
# ---------------------------------------------------------------------------


def test_woe_iv_matches_python_model(spark):
    from gcpdatapipelines_spark.operators.features import woe_iv

    counts = {"A": (30, 70), "B": (60, 40), "C": (10, 90)}
    rows = []
    for cat, (ev, ne) in counts.items():
        rows += [(cat, True)] * ev + [(cat, False)] * ne
    df = spark.createDataFrame(rows, "cat STRING, ev BOOLEAN")
    got = {r["cat"]: r for r in woe_iv(df, "cat", F.col("ev")).collect()}

    et = sum(ev for ev, _ in counts.values())
    nt = sum(ne for _, ne in counts.values())
    iv = 0.0
    for cat, (ev, ne) in counts.items():
        woe = math.log((ev / et) / (ne / nt))
        term = (ev / et - ne / nt) * woe
        iv += term
        assert abs(got[cat]["woe"] - woe) < 1e-5
        assert abs(got[cat]["iv_term"] - term) < 1e-5
    for r in got.values():
        assert abs(r["iv_total"] - iv) < 1e-5


def test_woe_iv_drops_zero_class_categories(spark):
    from gcpdatapipelines_spark.operators.features import woe_iv

    rows = [("A", True)] * 5 + [("A", False)] * 5 + [("Z", True)] * 4
    df = spark.createDataFrame(rows, "cat STRING, ev BOOLEAN")
    out = woe_iv(df, "cat", F.col("ev")).collect()
    assert [r["cat"] for r in out] == ["A"]
    # balanced A: woe == 0, iv == 0
    assert out[0]["woe"] == 0.0 and out[0]["iv_total"] == 0.0


# ---------------------------------------------------------------------------
# kmv_setops
# ---------------------------------------------------------------------------


def test_kmv_setops_exact_regime_and_accuracy(spark):
    """Sets smaller than k: theta = 1.0, every estimate IS the exact
    count. Overlap structure: A = 0..149, B = 100..249."""
    from gcpdatapipelines_spark.operators.sketches import kmv_setops

    a = spark.range(0, 150).select(F.col("id").alias("ka"))
    b = spark.range(100, 250).select(F.col("id").alias("kb"))
    got = {r["op"]: r for r in kmv_setops(a, b, "ka", "kb", k=256).collect()}
    assert got["a"]["exact"] == 150 and got["b"]["exact"] == 150
    assert got["union"]["exact"] == 250 and got["intersect"]["exact"] == 50
    for r in got.values():
        assert r["estimate"] == float(r["exact"])
        assert r["rel_err"] == 0.0


def test_kmv_setops_sketch_regime_bounds(spark):
    """Sets much larger than k: estimates within ~5 sigma of truth
    (sigma ≈ exact/sqrt(k-2)) and the inclusion-exclusion identity
    holds approximately."""
    from gcpdatapipelines_spark.operators.sketches import kmv_setops

    a = spark.range(0, 6000).select(F.col("id").alias("ka"))
    b = spark.range(3000, 9000).select(F.col("id").alias("kb"))
    got = {r["op"]: r for r in kmv_setops(a, b, "ka", "kb", k=256).collect()}
    for op, exact in [("a", 6000), ("b", 6000), ("union", 9000),
                      ("intersect", 3000)]:
        assert got[op]["exact"] == exact
        sigma = exact / math.sqrt(254)
        assert abs(got[op]["estimate"] - exact) < 5 * sigma, (op, got[op])


def test_kmv_setops_disjoint_intersection_zero(spark):
    from gcpdatapipelines_spark.operators.sketches import kmv_setops

    a = spark.range(0, 3000).select(F.col("id").alias("ka"))
    b = spark.range(50000, 53000).select(F.col("id").alias("kb"))
    got = {r["op"]: r for r in kmv_setops(a, b, "ka", "kb", k=128).collect()}
    assert got["intersect"]["exact"] == 0
    assert got["intersect"]["estimate"] == 0.0


# ---------------------------------------------------------------------------
# snapshot_drift
# ---------------------------------------------------------------------------


def test_snapshot_drift_identical_snapshots(spark):
    from gcpdatapipelines_spark.operators.quality import snapshot_drift

    df = spark.createDataFrame(
        [(1, "x", Decimal("1.50")), (2, None, Decimal("2.50")), (3, "y", None)],
        "id BIGINT, s STRING, v DECIMAL(18,2)",
    )
    out = snapshot_drift(df, df, ["id", "s", "v"]).collect()
    assert len(out) == 12  # 3 columns x 4 metrics
    for r in out:
        assert r["before"] == r["after"], r


def test_snapshot_drift_detects_shift(spark):
    from gcpdatapipelines_spark.operators.quality import snapshot_drift

    a = spark.createDataFrame([(1, "x"), (2, "y")], "id BIGINT, s STRING")
    b = spark.createDataFrame([(5, "x"), (6, None)], "id BIGINT, s STRING")
    rows = {(r["column"], r["metric"]): r for r in
            snapshot_drift(a, b, ["id", "s"]).collect()}
    assert rows[("id", "min")]["before"] == "1"
    assert rows[("id", "min")]["after"] == "5"
    assert rows[("id", "max")]["after"] == "6"
    assert rows[("s", "null_rate")]["before"] == "0.0"
    assert rows[("s", "null_rate")]["after"] == "0.5"
    assert rows[("s", "n_distinct")]["after"] == "1"


# ---------------------------------------------------------------------------
# holt_winters_state
# ---------------------------------------------------------------------------


def _hw_python(xs, m=7, alpha=0.5, beta=0.3, gamma=0.2):
    mean1 = sum(xs[:m]) / m
    mean2 = sum(xs[m:2 * m]) / m
    l, b = mean1, (mean2 - mean1) / m
    s = [x - mean1 for x in xs[:m]]
    for x in xs[m:]:
        s0 = s[0]
        lp = alpha * (x - s0) + (1 - alpha) * (l + b)
        bp = beta * (lp - l) + (1 - beta) * b
        sp = gamma * (x - lp) + (1 - gamma) * s0
        l, b = lp, bp
        s = s[1:] + [sp]
    return l, b, s[0]


def test_holt_winters_matches_python_model(spark):
    from gcpdatapipelines_spark.operators.timeseries import holt_winters_state

    xs = [10.0 + (i % 7) * 2.0 + i * 0.1 for i in range(30)]
    rows = [("k", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k STRING, d BIGINT, v DOUBLE")
    got = holt_winters_state(df, "k", "d", "v", period=7).collect()[0]
    l, b, s = _hw_python(xs)
    assert got["n"] == 30
    assert abs(got["level"] - l) < 1e-6
    assert abs(got["trend"] - b) < 1e-6
    assert abs(got["season_next"] - s) < 1e-6
    assert abs(got["forecast_1"] - (l + b + s)) < 1e-6


def test_holt_winters_requires_two_periods(spark):
    from gcpdatapipelines_spark.operators.timeseries import holt_winters_state

    rows = [("short", i, float(i)) for i in range(13)]
    df = spark.createDataFrame(rows, "k STRING, d BIGINT, v DOUBLE")
    assert holt_winters_state(df, "k", "d", "v", period=7).count() == 0


def test_holt_winters_tracks_planted_seasonality(spark):
    """On a pure weekly pattern with zero trend, the one-step forecast
    must be close to the next planted value."""
    from gcpdatapipelines_spark.operators.timeseries import holt_winters_state

    pattern = [5.0, 8.0, 2.0, 9.0, 4.0, 7.0, 3.0]
    xs = pattern * 8  # 56 days
    rows = [("k", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k STRING, d BIGINT, v DOUBLE")
    got = holt_winters_state(df, "k", "d", "v", period=7).collect()[0]
    assert abs(got["forecast_1"] - pattern[0]) < 0.5


def test_holt_winters_deterministic_under_partitioning(spark):
    from gcpdatapipelines_spark.operators.timeseries import holt_winters_state

    xs = [10.0 + (i % 7) + i * 0.05 for i in range(40)]
    rows = [("k", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k STRING, d BIGINT, v DOUBLE")
    a = holt_winters_state(df, "k", "d", "v", period=7).collect()
    b = holt_winters_state(
        df.repartition(11), "k", "d", "v", period=7
    ).collect()
    assert a == b


# ---------------------------------------------------------------------------
# salted_join
# ---------------------------------------------------------------------------


def test_salted_join_equals_plain_join_on_skewed_keys(spark):
    from gcpdatapipelines_spark.operators.joins import salted_join

    # hot key 0 carries half the fact rows
    fact = spark.createDataFrame(
        [(i, 0 if i % 2 == 0 else i % 50) for i in range(2000)],
        "row_id BIGINT, k BIGINT",
    )
    dim = spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], "k BIGINT, attr STRING"
    )
    got = sorted(
        (r["row_id"], r["attr"])
        for r in salted_join(fact, dim, "k", "row_id", nsalts=8).collect()
    )
    want = sorted(
        (r["row_id"], r["attr"]) for r in fact.join(dim, "k").collect()
    )
    assert got == want


def test_salted_join_spreads_hot_key_across_salts(spark):
    """Rows of ONE hot key must land in several salt buckets — the
    whole point; salting by the key itself would collapse to one."""
    from pyspark.sql import functions as F

    fact = spark.createDataFrame(
        [(i, 0) for i in range(1000)], "row_id BIGINT, k BIGINT"
    )
    salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("row_id")), F.lit(8)).cast("int")
    )
    n_buckets = salted.select("__salt").distinct().count()
    assert n_buckets == 8


# ---------------------------------------------------------------------------
# hll_merge_audit
# ---------------------------------------------------------------------------


def test_hll_merge_registers_equal_and_estimate_sane(spark):
    from gcpdatapipelines_spark.operators.sketches import hll_merge_audit

    a = spark.range(0, 4000).selectExpr("id AS ka")
    b = spark.range(3000, 8000).selectExpr("id AS kb")
    got = hll_merge_audit(a, b, "ka", "kb", p=9).collect()[0]
    assert got["registers_equal"] is True
    assert got["n_register_mismatch"] == 0
    assert got["merged_estimate"] == got["direct_estimate"]
    assert got["n_exact"] == 8000
    # p=9 -> ~4.6% stderr; 5 sigma bound
    assert abs(got["merged_estimate"] - 8000) < 8000 * 0.23


# ---------------------------------------------------------------------------
# rake_keywords
# ---------------------------------------------------------------------------


def test_rake_matches_python_model(spark):
    from gcpdatapipelines_spark.operators.text import rake_keywords

    docs = [
        (1, "deep learning of the deep neural network"),
        (2, "neural network training and deep learning"),
    ]
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    got = {
        r["phrase"]: (r["n_occur"], r["rake_score"])
        for r in rake_keywords(df, "doc_id", "text", top=10).collect()
    }

    # phrases: doc1 -> [deep learning], [deep neural network]
    #          doc2 -> [neural network training], [deep learning]
    phrases = [
        ["deep", "learning"],
        ["deep", "neural", "network"],
        ["neural", "network", "training"],
        ["deep", "learning"],
    ]
    freq, deg = {}, {}
    for p in phrases:
        for w in p:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(p)
    score = {w: deg[w] / freq[w] for w in freq}
    want = {}
    for p in phrases:
        text = " ".join(p)
        s = round(sum(score[w] for w in p), 6)
        n, _ = want.get(text, (0, s))
        want[text] = (n + 1, s)
    assert got == want


def test_rake_top_k_ordering(spark):
    from gcpdatapipelines_spark.operators.text import rake_keywords

    docs = [(i, "alpha beta gamma of delta") for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    out = rake_keywords(df, "doc_id", "text", top=1).collect()
    assert len(out) == 1
    # "alpha beta gamma" (len 3, score 9) beats "delta" (score 1)
    assert out[0]["phrase"] == "alpha beta gamma"
    assert out[0]["n_occur"] == 5


# ---------------------------------------------------------------------------
# point_in_interval_join
# ---------------------------------------------------------------------------


def test_point_in_interval_equals_naive_inequality(spark):
    from gcpdatapipelines_spark.operators.joins import point_in_interval_join

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(i, base + dt.timedelta(hours=7 * i)) for i in range(60)],
        "pid BIGINT, ts TIMESTAMP",
    )
    ivs = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 4)),
            (2, dt.datetime(2024, 1, 8), dt.datetime(2024, 1, 8)),
            (3, dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 15)),
        ],
        "iid BIGINT, s TIMESTAMP, e TIMESTAMP",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in point_in_interval_join(pts, "ts", ivs, "s", "e").collect()
    )
    want = sorted(
        (r["pid"], r["iid"])
        for r in pts.crossJoin(ivs)
        .filter(
            (F.col("ts") >= F.col("s"))
            & (F.col("ts") < F.col("e") + F.expr("interval 1 day"))
        )
        .collect()
    )
    assert got == want and len(want) > 0


def test_point_in_interval_plan_is_hash_join(spark):
    """The bucketed form must compile to a hash/merge EQUI join — the
    naive inequality form is nested-loop."""
    from gcpdatapipelines_spark import plans as P
    from gcpdatapipelines_spark.operators.joins import point_in_interval_join

    import datetime as dt

    pts = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2, 5))], "pid BIGINT, ts TIMESTAMP"
    )
    ivs = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 9))],
        "iid BIGINT, s TIMESTAMP, e TIMESTAMP",
    )
    plan = P.formatted_plan(point_in_interval_join(pts, "ts", ivs, "s", "e"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# seasonal_decompose_weekday
# ---------------------------------------------------------------------------


def test_seasonal_decompose_recovers_planted_pattern(spark):
    """Planted weekday offsets on a flat base: the recovered seasonal
    components equal the (centered) planted offsets where the moving
    window is full."""
    from gcpdatapipelines_spark.operators.timeseries import (
        seasonal_decompose_weekday,
    )

    import datetime as dt
    from decimal import Decimal

    offsets = [3, -2, 5, 0, -4, 1, -3]  # sums to 0
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(days=i), Decimal(100 + offsets[i % 7]))
        for i in range(35)
    ]
    df = spark.createDataFrame(rows, "d TIMESTAMP, v DECIMAL(18,6)")
    got = {
        r["slot"]: r["seasonal"]
        for r in seasonal_decompose_weekday(df, "d", "v", period=7).collect()
    }
    for i, off in enumerate(offsets):
        day = base + dt.timedelta(days=i)
        slot = day.isoweekday() % 7 + 1  # Spark dayofweek: Sunday=1
        assert abs(got[slot] - off) < 1e-6, (slot, off, got)


def test_seasonal_components_sum_to_zero_on_balanced_series(spark):
    from gcpdatapipelines_spark.operators.timeseries import (
        seasonal_decompose_weekday,
    )

    import datetime as dt
    from decimal import Decimal

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(days=i), Decimal(50 + (i * 13) % 9))
        for i in range(42)
    ]
    df = spark.createDataFrame(rows, "d TIMESTAMP, v DECIMAL(18,6)")
    out = seasonal_decompose_weekday(df, "d", "v", period=7).collect()
    # each slot observed equally often over full weeks of a detrended
    # series -> components nearly cancel
    assert abs(sum(r["seasonal"] for r in out)) < 1.0


# ---------------------------------------------------------------------------
# two_proportion_ztest
# ---------------------------------------------------------------------------


def test_two_prop_ztest_matches_python_model(spark):
    from gcpdatapipelines_spark.operators.agg import two_proportion_ztest

    rows = (
        [("a", True)] * 40 + [("a", False)] * 60
        + [("b", True)] * 25 + [("b", False)] * 75
    )
    df = spark.createDataFrame(rows, "arm STRING, s BOOLEAN")
    got = two_proportion_ztest(
        df, F.col("arm") == "a", F.col("s")
    ).collect()[0]
    pa, pb = 0.4, 0.25
    pool = 65 / 200
    z = (pa - pb) / math.sqrt(pool * (1 - pool) * (1 / 100 + 1 / 100))
    assert got["n_a"] == 100 and got["x_b"] == 25
    assert abs(got["z"] - z) < 1e-3


def test_two_prop_ztest_degenerate_rates_null_z(spark):
    from gcpdatapipelines_spark.operators.agg import two_proportion_ztest

    rows = [("a", True)] * 10 + [("b", True)] * 10
    df = spark.createDataFrame(rows, "arm STRING, s BOOLEAN")
    got = two_proportion_ztest(df, F.col("arm") == "a", F.col("s")).collect()[0]
    assert got["p_a"] == 1.0 and got["p_b"] == 1.0 and got["z"] is None


# ---------------------------------------------------------------------------
# matryoshka_prefix_audit
# ---------------------------------------------------------------------------


def test_matryoshka_norm_fractions(spark):
    from gcpdatapipelines_spark.operators.similarity import (
        matryoshka_prefix_audit,
    )

    # vector with all mass in first 8 dims vs spread evenly over 32
    front = [1.0] * 8 + [0.0] * 24
    flat = [1.0] * 32
    df = spark.createDataFrame(
        [(1, front, 0), (2, flat, 1)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>, label INT",
    )
    got = {
        (r["group"], r["dims"]): r["mean_norm_frac"]
        for r in matryoshka_prefix_audit(
            df, label_col="label", prefix_dims=(8, 16, 32)
        ).collect()
    }
    assert got[("0", 8)] == 1.0
    assert abs(got[("1", 8)] - math.sqrt(8 / 32)) < 1e-6
    assert abs(got[("1", 16)] - math.sqrt(16 / 32)) < 1e-6
    assert got[("1", 32)] == 1.0
    # fractions are monotone in dims
    assert got[("1", 8)] <= got[("1", 16)] <= got[("1", 32)]


# ---------------------------------------------------------------------------
# modularity
# ---------------------------------------------------------------------------


def test_modularity_two_cliques(spark):
    """Two disjoint triangles with perfect labels: Q = 2·(3/6 − (6/12)²)
    = 0.5 — the textbook value."""
    from gcpdatapipelines_spark.operators.graph import modularity

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6)],
        "u BIGINT, v BIGINT",
    )
    labels = spark.createDataFrame(
        [(n, 1 if n <= 3 else 2) for n in range(1, 7)],
        "node BIGINT, label BIGINT",
    )
    out = modularity(edges, labels).collect()
    assert all(abs(r["q_total"] - 0.5) < 1e-9 for r in out)
    for r in out:
        assert r["n_nodes"] == 3 and r["intra_edges"] == 3
        assert r["deg_sum"] == 6
        assert abs(r["term"] - 0.25) < 1e-9


def test_modularity_single_community_is_zero(spark):
    """Everything in one community: e_c = m and d_c = 2m ⇒ Q = 0."""
    from gcpdatapipelines_spark.operators.graph import modularity

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "u BIGINT, v BIGINT"
    )
    labels = spark.createDataFrame(
        [(n, 0) for n in range(1, 5)], "node BIGINT, label BIGINT"
    )
    out = modularity(edges, labels).collect()
    assert len(out) == 1
    assert abs(out[0]["q_total"]) < 1e-9


def test_modularity_penalizes_split_communities(spark):
    """Splitting a clique across labels must lower Q vs keeping it
    whole."""
    from gcpdatapipelines_spark.operators.graph import modularity

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6)],
        "u BIGINT, v BIGINT",
    )
    good = spark.createDataFrame(
        [(n, 1 if n <= 3 else 2) for n in range(1, 7)],
        "node BIGINT, label BIGINT",
    )
    bad = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2), (4, 2), (5, 2), (6, 1)],
        "node BIGINT, label BIGINT",
    )
    q_good = modularity(edges, good).collect()[0]["q_total"]
    q_bad = modularity(edges, bad).collect()[0]["q_total"]
    assert q_good > q_bad


# ---------------------------------------------------------------------------
# forecast_backtest_holt
# ---------------------------------------------------------------------------


def test_forecast_backtest_matches_python_model(spark):
    from gcpdatapipelines_spark.operators.timeseries import (
        forecast_backtest_holt,
    )

    xs = [10.0, 12.0, 11.0, 14.0, 13.5, 15.0, 16.2, 15.8, 17.0, 18.1]
    df = spark.createDataFrame([("k", xs)], "k STRING, arr ARRAY<DOUBLE>")
    got = forecast_backtest_holt(df, "k", "arr", n_backtests=5).collect()[0]

    def holt_fc(prefix, a=0.5, b=0.3):
        l, tr = prefix[0], prefix[1] - prefix[0]
        for x in prefix[2:]:
            nl = a * x + (1 - a) * (l + tr)
            tr = b * (nl - l) + (1 - b) * tr
            l = nl
        return l + tr

    n = len(xs)
    aes, apes = [], []
    for c in range(max(2, n - 5), n):
        fc = holt_fc(xs[:c])
        aes.append(round(abs(fc - xs[c]), 9))
        apes.append(round(abs(fc - xs[c]) / abs(xs[c]), 9))
    assert got["n_backtests"] == 5
    assert abs(got["mae"] - sum(aes) / len(aes)) < 1e-6
    assert abs(got["mape"] - sum(apes) / len(apes)) < 1e-6


def test_forecast_backtest_converges_on_linear_series(spark):
    """The seed convention (level=x0, trend=x1-x0) lags a linear
    series by one step, so the backtest error decays geometrically
    with the training-prefix length rather than being exactly zero:
    a longer-prefix cutoff must beat a shorter one, and the overall
    MAPE must be sub-percent by 10+ points of history."""
    from gcpdatapipelines_spark.operators.timeseries import (
        forecast_backtest_holt,
    )

    xs = [float(3 + 2 * i) for i in range(15)]
    short = spark.createDataFrame([("k", xs[:10])], "k STRING, arr ARRAY<DOUBLE>")
    full = spark.createDataFrame([("k", xs)], "k STRING, arr ARRAY<DOUBLE>")
    mae_short = forecast_backtest_holt(
        short, "k", "arr", n_backtests=1
    ).collect()[0]["mae"]
    got = forecast_backtest_holt(
        full, "k", "arr", n_backtests=1
    ).collect()[0]
    assert got["mae"] < mae_short
    assert got["mape"] < 0.01


# ---------------------------------------------------------------------------
# partition_digest
# ---------------------------------------------------------------------------


def test_partition_digest_order_and_partitioning_invariant(spark):
    from gcpdatapipelines_spark.operators.quality import partition_digest

    rows = [(i % 4, i, f"s{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "part_key INT, id BIGINT, s STRING")
    cols = [F.col("id").cast("string"), F.col("s")]
    a = {
        (r["part"], r["n_rows"], r["digest"])
        for r in partition_digest(df, F.col("part_key"), cols).collect()
    }
    b = {
        (r["part"], r["n_rows"], r["digest"])
        for r in partition_digest(
            df.repartition(13).sort(F.col("s").desc()), F.col("part_key"), cols
        ).collect()
    }
    assert a == b and len(a) == 4


def test_partition_digest_detects_single_row_change(spark):
    from gcpdatapipelines_spark.operators.quality import partition_digest

    rows = [(1, i, f"s{i}") for i in range(50)]
    df1 = spark.createDataFrame(rows, "p INT, id BIGINT, s STRING")
    rows2 = list(rows)
    rows2[17] = (1, 17, "CHANGED")
    df2 = spark.createDataFrame(rows2, "p INT, id BIGINT, s STRING")
    cols = [F.col("id").cast("string"), F.col("s")]
    d1 = partition_digest(df1, F.col("p"), cols).collect()[0]["digest"]
    d2 = partition_digest(df2, F.col("p"), cols).collect()[0]["digest"]
    assert d1 != d2


def test_partition_digest_merge_property(spark):
    """digest(A ∪ B) == digest(A) XOR digest(B) for disjoint halves —
    the mergeability that makes the digest table incrementally
    maintainable."""
    from gcpdatapipelines_spark.operators.quality import partition_digest

    rows = [(1, i, f"s{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "p INT, id BIGINT, s STRING")
    cols = [F.col("id").cast("string"), F.col("s")]
    full = partition_digest(df, F.col("p"), cols).collect()[0]["digest"]
    da = partition_digest(
        df.filter(F.col("id") < 50), F.col("p"), cols
    ).collect()[0]["digest"]
    db = partition_digest(
        df.filter(F.col("id") >= 50), F.col("p"), cols
    ).collect()[0]["digest"]
    assert full == da ^ db


# ---------------------------------------------------------------------------
# quantile_sketch_bottomk
# ---------------------------------------------------------------------------


def test_quantile_sketch_error_bound(spark):
    """k=512 sample quantiles of a 20k-row group must land within a
    few sample-rank standard errors of the exact quantiles: for
    U(0,1000) data the p50 estimate stays within ~3*1000/(2*sqrt(k))
    ~= 66 of the truth."""
    from gcpdatapipelines_spark.operators.sketches import (
        quantile_sketch_bottomk,
    )

    rows = [("g", i, (i * 37) % 20000 / 20.0) for i in range(20000)]
    df = spark.createDataFrame(rows, "grp STRING, id BIGINT, v DOUBLE")
    got = quantile_sketch_bottomk(
        df, "grp", "v", F.col("id"), k=512
    ).collect()[0]
    assert got["n_rows"] == 20000 and got["n_sample"] == 512
    for tag in ("p25", "p5", "p75", "p95"):
        assert abs(got[f"{tag}_est"] - got[f"{tag}_exact"]) < 70.0, (
            tag,
            got,
        )


def test_quantile_sketch_mergeability(spark):
    """bottom-k(A union B) == bottom-k(bottom-k(A) union bottom-k(B)):
    sketching shards independently then merging gives the identical
    sample, hence identical estimates."""
    from gcpdatapipelines_spark.operators.sketches import (
        quantile_sketch_bottomk,
    )

    rows = [("g", i, float((i * 131) % 9973)) for i in range(8000)]
    df = spark.createDataFrame(rows, "grp STRING, id BIGINT, v DOUBLE")
    a = df.filter(F.col("id") < 4000)
    b = df.filter(F.col("id") >= 4000)

    def with_u(frame):
        u = (
            F.conv(
                F.substring(
                    F.md5(F.col("id").cast("string").cast("binary")), 1, 15
                ),
                16,
                10,
            ).cast("long")
            / F.lit(float(1 << 60))
        ).alias("__u")
        return frame.select("grp", "v", u)

    def rank_k(frame, k=256):
        from pyspark.sql import Window

        w = Window.partitionBy("grp").orderBy("__u")
        return (
            frame.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )

    direct = {
        (r["grp"], r["v"], round(r["__u"], 15))
        for r in rank_k(with_u(df)).collect()
    }
    merged = {
        (r["grp"], r["v"], round(r["__u"], 15))
        for r in rank_k(
            rank_k(with_u(a)).unionByName(rank_k(with_u(b)))
        ).collect()
    }
    assert direct == merged and len(direct) == 256


def test_quantile_sketch_small_group_is_exact(spark):
    """A group smaller than k samples every row: estimates equal the
    exact quantiles bit-for-bit."""
    from gcpdatapipelines_spark.operators.sketches import (
        quantile_sketch_bottomk,
    )

    rows = [("g", i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "grp STRING, id BIGINT, v DOUBLE")
    got = quantile_sketch_bottomk(
        df, "grp", "v", F.col("id"), k=512
    ).collect()[0]
    assert got["n_sample"] == 100
    for tag in ("p25", "p5", "p75", "p95"):
        assert got[f"{tag}_est"] == got[f"{tag}_exact"], got


# ---------------------------------------------------------------------------
# join_size_estimate
# ---------------------------------------------------------------------------


def test_join_size_estimate_exact_at_full_rate(spark):
    """rate=1.0 samples every key: the estimate IS the exact
    product-sum and rel_err == 0."""
    from gcpdatapipelines_spark.operators.profile import join_size_estimate

    l = spark.createDataFrame(
        [(i % 10, i) for i in range(300)], "k INT, x BIGINT"
    )
    r = spark.createDataFrame(
        [(i % 7, i) for i in range(200)], "k INT, y BIGINT"
    )
    got = join_size_estimate(l, "k", r, "k", rate=1.0).collect()[0]
    exact = l.join(r, "k").count()
    assert got["exact_join_rows"] == exact
    assert got["est_join_rows"] == float(exact)
    assert got["rel_err"] == 0.0


def test_join_size_estimate_concentrates(spark):
    """With many keys of similar weight, a 20% key sample lands
    within ~35% of the truth (unbiased; error ~ 1/sqrt(sampled
    keys))."""
    from gcpdatapipelines_spark.operators.profile import join_size_estimate

    l = spark.createDataFrame(
        [(i % 500, i) for i in range(5000)], "k INT, x BIGINT"
    )
    r = spark.createDataFrame(
        [(i % 500, i) for i in range(3000)], "k INT, y BIGINT"
    )
    got = join_size_estimate(l, "k", r, "k", rate=0.2).collect()[0]
    assert got["exact_join_rows"] == l.join(r, "k").count()
    assert got["n_keys_sampled"] > 50
    assert got["rel_err"] < 0.35, got


def test_join_size_estimate_disjoint_keys_is_zero(spark):
    """No overlapping keys: estimate 0, exact 0 guarded against
    divide-by-zero is not required (exact>0 in catalog); here assert
    the estimator returns 0 sampled product mass."""
    from gcpdatapipelines_spark.operators.profile import join_size_estimate

    l = spark.createDataFrame([(i, i) for i in range(100)], "k INT, x BIGINT")
    r = spark.createDataFrame(
        [(i + 1000, i) for i in range(100)], "k INT, y BIGINT"
    )
    got = join_size_estimate(l, "k", r, "k", rate=1.0).collect()[0]
    assert got["est_join_rows"] == 0.0


# ---------------------------------------------------------------------------
# trailing_range_agg
# ---------------------------------------------------------------------------


def test_trailing_range_agg_matches_python_model(spark):
    from datetime import datetime, timedelta

    from gcpdatapipelines_spark.operators.windows import trailing_range_agg

    base = datetime(2024, 1, 1)
    rows = [
        ("u1", base + timedelta(days=d, hours=h), float(v))
        for d, h, v in [
            (0, 0, 10),
            (3, 5, 20),
            (7, 0, 5),   # exactly 7 days after row 1 -> includes it
            (8, 1, 7),   # row 1 now outside the window
            (20, 0, 2),
        ]
    ] + [("u2", base, 100.0)]
    df = spark.createDataFrame(rows, "user_id STRING, ts TIMESTAMP, value DOUBLE")
    got = {
        (r["user_id"], r["ts"], r["trailing_sum"], r["trailing_n"])
        for r in trailing_range_agg(df, "user_id", "ts", "value").collect()
    }

    def model(u, t):
        win = [
            v
            for (uu, tt, v) in rows
            if uu == u and t - timedelta(days=7) <= tt <= t
        ]
        return (round(sum(win), 2), len(win))

    want = {(u, t, *model(u, t)) for (u, t, v) in rows}
    assert got == want


def test_trailing_range_agg_includes_all_ts_peers(spark):
    """Two rows with the IDENTICAL timestamp must see each other in
    both their frames (range-frame peer semantics) — a rows frame
    would give one of them a partial, order-dependent view."""
    from datetime import datetime

    from gcpdatapipelines_spark.operators.windows import trailing_range_agg

    t = datetime(2024, 5, 5, 12, 0, 0)
    df = spark.createDataFrame(
        [("u", t, 1.0), ("u", t, 2.0)],
        "user_id STRING, ts TIMESTAMP, value DOUBLE",
    )
    out = trailing_range_agg(df, "user_id", "ts", "value").collect()
    assert [r["trailing_sum"] for r in out] == [3.0, 3.0]
    assert [r["trailing_n"] for r in out] == [2, 2]


# ---------------------------------------------------------------------------
# hll_sliding_distinct
# ---------------------------------------------------------------------------


def test_hll_sliding_wau_accuracy_and_exact_parity(spark):
    """Per-day 7-day HLL estimates track the exact rolling distinct
    count within the p=9 error envelope (1.04/sqrt(512) ~ 4.6% rsd;
    assert a generous 4-sigma band), and the audit column equals an
    independently-computed exact WAU."""
    from datetime import datetime, timedelta

    from gcpdatapipelines_spark.operators.sketches import (
        hll_sliding_distinct,
    )

    base = datetime(2024, 3, 1)
    rows = [
        (base + timedelta(days=d, hours=u % 24), (d * 131 + u * 7) % 900)
        for d in range(20)
        for u in range(250)
    ]
    df = spark.createDataFrame(rows, "ts TIMESTAMP, user_id BIGINT")
    got = {
        r["day"]: r for r in hll_sliding_distinct(df, "user_id", "ts").collect()
    }
    assert len(got) == 20
    # independent exact model
    from collections import defaultdict

    by_day = defaultdict(set)
    for ts, u in rows:
        by_day[ts.date()].add(u)
    for day, r in got.items():
        exact = len(
            set().union(
                *(
                    by_day.get(day - timedelta(days=i), set())
                    for i in range(7)
                )
            )
        )
        assert r["n_exact"] == exact, (day, r, exact)
        assert r["rel_err"] < 0.19, r


def test_hll_sliding_wau_partitioning_invariant(spark):
    """md5 registers + max-merge + dyadic fold: the estimate is
    bit-identical under any repartitioning/ordering."""
    from datetime import datetime, timedelta

    from gcpdatapipelines_spark.operators.sketches import (
        hll_sliding_distinct,
    )

    base = datetime(2024, 3, 1)
    rows = [
        (base + timedelta(days=d), (d * 17 + u) % 400)
        for d in range(10)
        for u in range(120)
    ]
    df = spark.createDataFrame(rows, "ts TIMESTAMP, user_id BIGINT")
    a = {
        (r["day"], r["wau_hll"], r["n_exact"])
        for r in hll_sliding_distinct(df, "user_id", "ts").collect()
    }
    b = {
        (r["day"], r["wau_hll"], r["n_exact"])
        for r in hll_sliding_distinct(
            df.repartition(17).sortWithinPartitions("user_id"),
            "user_id",
            "ts",
        ).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# markov_attribution
# ---------------------------------------------------------------------------


def _mk_journeys(spark, journeys):
    from datetime import datetime, timedelta

    base = datetime(2024, 6, 1)
    rows = []
    for u, steps in enumerate(journeys):
        for i, st in enumerate(steps):
            rows.append((u, base + timedelta(minutes=i), st, i))
    return spark.createDataFrame(
        rows, "user_id BIGINT, ts TIMESTAMP, event_type STRING, event_id BIGINT"
    )


def test_markov_attribution_hand_chain(spark):
    """Hand-solved absorbing chain: journeys A->CONV, A->B->CONV,
    B->null, C->null give removal effects A=0.75, B=0.5, C=0 (base
    P(conv)=0.5; removing A leaves only START->B->CONV=0.125;
    removing B kills A's second path: 0.25)."""
    from gcpdatapipelines_spark.operators.funnel import markov_attribution

    df = _mk_journeys(
        spark,
        [["A", "purchase"], ["A", "B", "purchase"], ["B"], ["C"]],
    )
    got = {
        r["channel"]: r
        for r in markov_attribution(
            df, "user_id", "ts", "event_type", "purchase", "event_id"
        ).collect()
    }
    assert abs(got["A"]["removal_effect"] - 0.75) < 1e-9
    assert abs(got["B"]["removal_effect"] - 0.5) < 1e-9
    assert got["C"]["removal_effect"] == 0.0
    assert abs(got["A"]["attribution_share"] - 0.6) < 1e-9
    assert abs(got["B"]["attribution_share"] - 0.4) < 1e-9
    assert abs(got["A"]["attributed_conversions"] - 1.2) < 1e-6
    assert abs(got["B"]["attributed_conversions"] - 0.8) < 1e-6


def test_markov_attribution_cuts_at_first_conversion(spark):
    """Post-conversion events must not contribute transitions: a
    journey A->CONV->Z->Z equals A->CONV (Z earns no credit and no
    Z state appears)."""
    from gcpdatapipelines_spark.operators.funnel import markov_attribution

    df = _mk_journeys(
        spark, [["A", "purchase", "Z", "Z"], ["A", "purchase"]]
    )
    got = markov_attribution(
        df, "user_id", "ts", "event_type", "purchase", "event_id"
    ).collect()
    assert {r["channel"] for r in got} == {"A"}
    assert got[0]["removal_effect"] == 1.0


def test_shapley_attribution_hand_case(spark):
    """Two channels, hand-solved: v(A)=1/3, v(B)=1/2, v(AB)=1 gives
    phi_A=5/12, phi_B=7/12 (efficiency: they sum to v(AB) since
    v(empty)=0); 4 conversions split 1.67/2.33."""
    from gcpdatapipelines_spark.operators.funnel import shapley_attribution

    journeys = (
        [["A", "purchase"]] + [["A"]] * 2           # v(A)=1/3
        + [["B", "purchase"]] + [["B"]]             # v(B)=1/2
        + [["A", "B", "purchase"]] * 2              # v(AB)=1
    )
    df = _mk_journeys(spark, journeys)
    got = {
        r["channel"]: r
        for r in shapley_attribution(
            df, "user_id", "ts", "event_type", "purchase"
        ).collect()
    }
    assert abs(got["A"]["shapley_value"] - 5 / 12) < 1e-6
    assert abs(got["B"]["shapley_value"] - 7 / 12) < 1e-6
    assert abs(got["A"]["attribution_share"] - 5 / 12) < 1e-6
    assert abs(got["A"]["attributed_conversions"] - 4 * 5 / 12) < 1e-2


def test_shapley_ignores_post_conversion_channels(spark):
    """Channels seen only after the first conversion earn nothing and
    do not appear."""
    from gcpdatapipelines_spark.operators.funnel import shapley_attribution

    df = _mk_journeys(spark, [["A", "purchase", "Z"], ["A"]])
    got = shapley_attribution(
        df, "user_id", "ts", "event_type", "purchase"
    ).collect()
    assert {r["channel"] for r in got} == {"A"}


# ---------------------------------------------------------------------------
# pattern_match_negation
# ---------------------------------------------------------------------------


def test_pattern_negation_cases(spark):
    """Four journeys pin the semantics: clean match; blocker between
    -> no match; blocker AFTER the goal -> still a match; goal beyond
    horizon -> no match."""
    from datetime import datetime, timedelta

    from gcpdatapipelines_spark.operators.sequences import (
        pattern_match_negation,
    )

    base = datetime(2024, 7, 1)

    def j(u, steps):
        return [
            (u, base + timedelta(minutes=m), t, i)
            for i, (m, t) in enumerate(steps)
        ]

    rows = (
        j(1, [(0, "click"), (10, "purchase")])                       # match
        + j(2, [(0, "click"), (5, "error"), (10, "purchase")])       # blocked
        + j(3, [(0, "click"), (10, "purchase"), (20, "error")])      # match
        + j(4, [(0, "click"), (90, "purchase")])                     # too late
    )
    df = spark.createDataFrame(
        rows, "user_id BIGINT, ts TIMESTAMP, event_type STRING, event_id BIGINT"
    )
    got = {
        r["user"]: (r["n_start"], r["n_matched"])
        for r in pattern_match_negation(
            df, "user_id", "ts", "event_type",
            "click", "purchase", "error", 3600, "event_id",
        ).collect()
    }
    assert got == {1: (1, 1), 2: (1, 0), 3: (1, 1), 4: (1, 0)}


def test_pattern_negation_uses_next_goal_only(spark):
    """The pattern binds to the NEXT goal: click -> error -> purchase
    -> purchase is blocked (the error precedes the first purchase),
    even though a later purchase also exists."""
    from datetime import datetime, timedelta

    from gcpdatapipelines_spark.operators.sequences import (
        pattern_match_negation,
    )

    base = datetime(2024, 7, 1)
    rows = [
        (1, base + timedelta(minutes=m), t, i)
        for i, (m, t) in enumerate(
            [(0, "click"), (5, "error"), (10, "purchase"), (20, "purchase")]
        )
    ]
    df = spark.createDataFrame(
        rows, "user_id BIGINT, ts TIMESTAMP, event_type STRING, event_id BIGINT"
    )
    got = pattern_match_negation(
        df, "user_id", "ts", "event_type",
        "click", "purchase", "error", 3600, "event_id",
    ).collect()[0]
    assert (got["n_start"], got["n_matched"]) == (1, 0)


def test_containment_catches_embedded_doc_jaccard_misses(spark):
    """A short doc fully quoted inside a long one: containment = 1.0
    (fires) while Jaccard = |small|/|big| stays below any useful
    threshold — the asymmetric detector's reason to exist."""
    from gcpdatapipelines_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    small = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"word{i}" for i in range(80))
    df = spark.createDataFrame(
        [(1, small), (2, small + " " + filler)],
        "doc_id BIGINT, text STRING",
    )
    cont = ngram_containment_pairs(
        df, "doc_id", "text", n=5, threshold=0.9
    ).collect()
    assert len(cont) == 1 and cont[0]["containment"] == 1.0
    jac = ngram_jaccard_pairs(
        df, "doc_id", "text", n=5, threshold=0.3
    ).collect()
    assert jac == []


def test_winsorized_mean_clips_outliers(spark):
    """A single extreme outlier moves the raw mean but barely the
    winsorized one; with no outliers the two agree."""
    from gcpdatapipelines_spark.queries import SPARK_QUERIES
    import tempfile, os

    vals = [float(v) for v in range(1, 100)] + [100000.0]
    rows = [
        (i, "2024-01-01 00:00:00", 1, "x", v, "{}")
        for i, v in enumerate(vals)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING,"
            " value DOUBLE, props STRING",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
            os.path.join(d, "events.parquet")
        )
        got = SPARK_QUERIES["a41_winsorized_mean"](spark, d).collect()[0]
    assert got["mean_raw"] > 1000
    assert got["mean_winsorized"] < 60, got


# ------------------------------------------------------- l-diversity


def test_l_diversity_flags_homogeneous_group(spark):
    """A group can be k-anonymous (size 4) yet 1-diverse — everyone
    shares the sensitive value, so membership alone leaks it."""
    from gcpdatapipelines_spark.operators.compliance import l_diversity_audit
    from pyspark.sql import functions as F

    rows = (
        [("a", "x", 100.0)] * 4          # homogeneous: 1 distinct band
        + [("b", "x", float(v)) for v in (0, 1000, 2000, 3000)]  # 4 bands
    )
    df = spark.createDataFrame(rows, "g string, seg string, bal double")
    out = {
        (r["g"], r["seg"]): r
        for r in l_diversity_audit(
            df, ["g", "seg"], F.floor(F.col("bal") / 1000.0).cast("bigint"), l=3
        ).collect()
    }
    assert out[("a", "x")]["violates"] is True
    assert out[("a", "x")]["n_sensitive"] == 1
    assert out[("b", "x")]["violates"] is False
    assert out[("b", "x")]["n_sensitive"] == 4


# ------------------------------------------------- pareto concentration


def test_pareto_concentration_crossing_rule(spark, sf_dir):
    """n_top80 is the minimal prefix of revenue-ranked customers whose
    cumulative share reaches 80%: check against a python replay on one
    nation."""
    from gcpdatapipelines_spark.queries import SPARK_QUERIES
    from gcpdatapipelines_spark.io import read_table
    import collections

    out = {r["c_nationkey"]: r for r in
           SPARK_QUERIES["w31_pareto_concentration"](spark, sf_dir).collect()}
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    rows = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .select("c_nationkey", "o_custkey", "o_totalprice")
        .collect()
    )
    rev = collections.defaultdict(float)
    nation = {}
    for r in rows:
        rev[r["o_custkey"]] += r["o_totalprice"]
        nation[r["o_custkey"]] = r["c_nationkey"]
    nk = next(iter(out))
    custs = sorted(
        [(v, k) for k, v in rev.items() if nation[k] == nk],
        key=lambda t: (-t[0], t[1]),
    )
    total = sum(v for v, _ in custs)
    cum, n80 = 0.0, 0
    for v, _ in custs:
        if cum < 0.8 * total - 1e-6:
            n80 += 1
        cum += v
    assert out[nk]["n_customers"] == len(custs)
    assert abs(out[nk]["n_top80"] - n80) <= 0  # exact decimal crossing


# --------------------------------------------------------- KS two-sample


def test_ks_two_sample_matches_python_ecdf(spark):
    import numpy as np
    from gcpdatapipelines_spark.operators.agg import ks_two_sample

    rng = np.random.RandomState(7)
    a = rng.normal(0.0, 1.0, 300)
    b = rng.normal(0.6, 1.3, 250)  # shifted AND reshaped
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    out = ks_two_sample(df, "g", "v", "a", "b").collect()[0]
    # python ECDF replay
    xs = np.sort(np.unique(np.concatenate([a, b])))
    f1 = np.searchsorted(np.sort(a), xs, side="right") / len(a)
    f2 = np.searchsorted(np.sort(b), xs, side="right") / len(b)
    d = float(np.max(np.abs(f1 - f2)))
    assert out["n1"] == 300 and out["n2"] == 250
    assert abs(out["d_stat"] - d) < 1e-6
    assert out["reject_05"] == 1


def test_ks_two_sample_accepts_same_distribution(spark):
    import numpy as np
    from gcpdatapipelines_spark.operators.agg import ks_two_sample

    rng = np.random.RandomState(11)
    a = rng.normal(0.0, 1.0, 400)
    b = rng.normal(0.0, 1.0, 400)
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    out = ks_two_sample(df, "g", "v", "a", "b").collect()[0]
    assert out["reject_05"] == 0
