"""Round-4 additions: activity streaks (gaps-and-islands),
deterministic sharded shuffle, semantic dedup plan shape."""

from __future__ import annotations

import pytest

import datetime

from pyspark.sql import functions as F

from gcpdatapipelines_spark.io import read_table
from gcpdatapipelines_spark.operators.sample import deterministic_shuffle
from gcpdatapipelines_spark.operators.sequences import activity_streaks
from tests.conftest import SF_SMOKE


def _ts(day: int, hour: int = 9):
    return datetime.datetime(2024, 1, day, hour)


def test_streaks_known_islands(spark):
    # u1: days 1,2,3 then 5,6 -> longest 3, active 5
    # u2: single day -> 1/1; u3: duplicate events one day -> 1/1
    rows = [
        (1, _ts(1)), (1, _ts(2)), (1, _ts(3)), (1, _ts(5)), (1, _ts(6)),
        (2, _ts(10)),
        (3, _ts(4, 1)), (3, _ts(4, 23)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["user_id"]: (r["longest_streak"], r["n_active_days"])
        for r in activity_streaks(df, "user_id", "ts").collect()
    }
    assert got == {1: (3, 5), 2: (1, 1), 3: (1, 1)}


def test_streaks_gap_of_one_day_breaks(spark):
    df = spark.createDataFrame(
        [(1, _ts(d)) for d in (1, 3, 5, 7)], "user_id long, ts timestamp"
    )
    [r] = activity_streaks(df, "user_id", "ts").collect()
    assert (r["longest_streak"], r["n_active_days"]) == (1, 4)


def test_shuffle_is_permutation(spark):
    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id")
    n = docs.count()
    out = deterministic_shuffle(docs, "doc_id")
    assert out.count() == n
    # every (shard, pos) address unique; positions dense 1..len per shard
    assert out.select("shard", "shard_pos").distinct().count() == n
    bad = (
        out.groupBy("shard")
        .agg(F.max("shard_pos").alias("mx"), F.count("*").alias("cnt"))
        .filter(F.col("mx") != F.col("cnt"))
        .count()
    )
    assert bad == 0


def test_shuffle_reproducible_and_seed_sensitive(spark):
    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id").limit(200)
    a = {(r["doc_id"], r["shard"], r["shard_pos"])
         for r in deterministic_shuffle(docs, "doc_id").collect()}
    b = {(r["doc_id"], r["shard"], r["shard_pos"])
         for r in deterministic_shuffle(docs, "doc_id").collect()}
    assert a == b
    c = {(r["doc_id"], r["shard"], r["shard_pos"])
         for r in deterministic_shuffle(docs, "doc_id", seed=7).collect()}
    assert a != c


def test_shuffle_decorrelates_key_order(spark):
    """Adjacent keys must not land at adjacent positions — the point
    of shuffling. Check shards of consecutive doc_ids look spread."""
    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id").limit(64)
    shards = [
        r["shard"]
        for r in deterministic_shuffle(docs, "doc_id").orderBy("doc_id").collect()
    ]
    assert len(set(shards)) > 10  # 64 consecutive ids spray across shards


def test_semantic_keep_no_cartesian(spark):
    from gcpdatapipelines_spark.queries import SPARK_QUERIES

    plan = (
        SPARK_QUERIES["dedup_semantic_keep"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dense_ids_matches_global_rank(spark):
    from gcpdatapipelines_spark.operators.rows import dense_ids

    # sparse, skewed, negative-free keys with gaps
    keys = [0, 1, 5, 6, 7, 1000, 1001, 99999, 100000, 123456789]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r["k"]: r["dense_id"] for r in dense_ids(df, "k", nshards=4).collect()}
    assert got == {k: i for i, k in enumerate(sorted(keys))}


def test_dense_ids_empty_and_single(spark):
    from gcpdatapipelines_spark.operators.rows import dense_ids

    empty = spark.createDataFrame([], "k long")
    assert dense_ids(empty, "k").count() == 0
    one = spark.createDataFrame([(7,)], "k long")
    [r] = dense_ids(one, "k").collect()
    assert r["dense_id"] == 0


def test_corr_matrix_single_scan(spark):
    from gcpdatapipelines_spark.queries import SPARK_QUERIES

    plan = (
        SPARK_QUERIES["a24_corr_matrix"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1, "moment CTE must not re-scan per pair"


def test_bm25_matches_python_model(spark):
    import math

    from gcpdatapipelines_spark.operators.text import bm25_topk

    corpus = {
        1: "spark join fast table spark",
        2: "join window stream",
        3: "table row filter value",
        4: "spark spark spark spark window",
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    terms = ["spark", "window"]
    got = {r["doc_id"]: r["bm25"] for r in bm25_topk(df, "doc_id", "text", terms).collect()}

    toks = {d: t.split() for d, t in corpus.items()}
    n, avgdl = len(toks), sum(map(len, toks.values())) / len(toks)
    dfreq = {t: sum(t in v for v in toks.values()) for t in terms}
    exp = {}
    for d, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            idf = math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            s += round(idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(v) / avgdl)), 9)
        if s:
            exp[d] = round(s, 6)
    assert got == exp
    # doc 4 (4x spark) must outrank doc 1 (2x spark) despite saturation
    assert got[4] > got[1]


def test_kfold_balanced_and_deterministic(spark):
    from gcpdatapipelines_spark.operators.sample import split_kfold

    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    out = split_kfold(docs, "doc_id", "lang", k=5)
    sizes = (
        out.groupBy("lang", "fold").count()
        .groupBy("lang")
        .agg(F.max("count").alias("mx"), F.min("count").alias("mn"))
        .collect()
    )
    assert sizes and all(r["mx"] - r["mn"] <= 1 for r in sizes)
    again = split_kfold(docs, "doc_id", "lang", k=5)
    assert out.exceptAll(again).count() == 0


# ---------------------------------------------------------------------------
# k_anonymity_audit
# ---------------------------------------------------------------------------

from gcpdatapipelines_spark.operators.compliance import k_anonymity_audit  # noqa: E402


def test_k_anonymity_flags_small_groups(spark):
    from pyspark.sql import functions as F

    rows = [("us", "m", i) for i in range(5)] + [("fr", "f", 10), ("fr", "f", 11)]
    df = spark.createDataFrame(rows, "country STRING, seg STRING, pid BIGINT")
    out = {(r.country, r.seg): r for r in k_anonymity_audit(df, ["country", "seg"], k=3).collect()}
    assert out[("us", "m")].group_size == 5 and not out[("us", "m")].violates
    assert out[("fr", "f")].group_size == 2 and out[("fr", "f")].violates


# ---------------------------------------------------------------------------
# ab_ttest / hll rollup / time-decay attribution
# ---------------------------------------------------------------------------

from gcpdatapipelines_spark.operators.agg import (  # noqa: E402
    ab_ttest,
    hll_merge_estimate,
    hll_shard_sketches,
)
from gcpdatapipelines_spark.operators.funnel import time_decay_attribution  # noqa: E402

# Heavyweight parity/property sweep: slow tier (see conftest).
pytestmark = pytest.mark.slow



def test_ab_ttest_matches_hand_welch(spark):
    import math

    a_vals = [1.0, 2.0, 3.0, 4.0]
    b_vals = [2.0, 4.0, 6.0]
    rows = [(0, v) for v in a_vals] + [(1, v) for v in b_vals]
    df = spark.createDataFrame(rows, "grp INT, value DOUBLE")
    r = ab_ttest(df, F.col("grp") == 1, "value").first()
    na, nb = len(a_vals), len(b_vals)
    ma, mb = sum(a_vals) / na, sum(b_vals) / nb
    va = sum((x - ma) ** 2 for x in a_vals) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b_vals) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert (r.n_a, r.n_b) == (na, nb)
    assert r.mean_a == round(ma, 6) and r.mean_b == round(mb, 6)
    assert abs(r.t_stat - t) < 1e-3 and abs(r.df - dof) < 0.01


def test_hll_merge_equals_direct_sketch_and_near_exact(spark):
    rows = [(f"s{i % 4}", i % 1000) for i in range(5000)]
    df = spark.createDataFrame(rows, "shard STRING, uid BIGINT")
    merged = hll_merge_estimate(hll_shard_sketches(df, F.col("shard"), "uid")).first()
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("uid", F.lit(12))).alias("est")
    ).first()
    assert merged.n_shards == 4
    # union keeps small shard sketches in exact (sparse) mode, so it can
    # be MORE accurate than the one-pass sketch; both sit within rsd
    assert abs(merged.distinct_est - 1000) / 1000 < 0.05
    assert abs(direct.est - 1000) / 1000 < 0.05
    # re-partitioning can shift WHERE partial sketches go dense, so the
    # estimate may wiggle a few counts — but stays inside the rsd band
    again = hll_merge_estimate(
        hll_shard_sketches(df.repartition(13), F.col("shard"), "uid")
    ).first()
    assert abs(again.distinct_est - 1000) / 1000 < 0.05


def test_time_decay_attribution_hand_weights(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, "click"),
        (1, t0 + dt.timedelta(days=7), "email"),
        (1, t0 + dt.timedelta(days=14), "purchase"),
        (2, t0, "click"),  # user 2 never converts: no credit
    ]
    df = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP, event_type STRING")
    out = {r.channel: r for r in time_decay_attribution(df, "user_id", "ts", "event_type").collect()}
    # click is 14 days before the purchase -> 0.25; email 7 days -> 0.5
    assert out["click"].credit == 0.25 and out["click"].n_touches == 1
    assert out["email"].credit == 0.5
    assert set(out) == {"click", "email"}


def test_freshness_audit_lag_and_stale(spark):
    import datetime as dt

    from gcpdatapipelines_spark.operators.profile import freshness_audit

    t0 = dt.datetime(2024, 1, 10)
    rows = [
        ("live", t0),
        ("live", t0 - dt.timedelta(days=9)),
        ("dead", t0 - dt.timedelta(days=2)),
    ]
    df = spark.createDataFrame(rows, "feed STRING, ts TIMESTAMP")
    out = {r.shard: r for r in freshness_audit(df, "feed", "ts").collect()}
    assert out["live"].lag_hours == 0.0 and not out["live"].stale
    assert out["dead"].lag_hours == 48.0 and out["dead"].stale
    assert out["live"].n_rows == 2


def test_fk_orphan_audit_counts(spark):
    from gcpdatapipelines_spark.operators.quality import fk_orphan_audit

    child = spark.createDataFrame([(1,), (2,), (9,)], "fk BIGINT")
    parent = spark.createDataFrame([(1,), (2,)], "pk BIGINT")
    r = fk_orphan_audit([("c->p", child, "fk", parent, "pk")]).first()
    assert (r.n_child, r.n_orphans) == (3, 1)
    assert r.orphan_rate == round(1 / 3, 6)


def test_benford_first_digit_extraction(spark):
    from gcpdatapipelines_spark.operators.quality import benford_audit

    import math

    vals = [123.4, 0.00156, 1999.0, -245.0, 0.0, None, 9.81]
    df = spark.createDataFrame([(v,) for v in vals], "x DOUBLE")
    out = {r.digit: r for r in benford_audit(df, "x").collect()}
    assert {d: out[d].n for d in out} == {1: 3, 2: 1, 9: 1}  # 0/None excluded
    assert out[1].expected == math.floor(math.log10(2.0) * 1e6) / 1e6
    assert abs(sum(r.observed for r in out.values()) - 1.0) < 1e-9


def test_key_skew_audit_flat_vs_skewed(spark):
    from gcpdatapipelines_spark.operators.profile import key_skew_audit

    flat = spark.createDataFrame([(i % 10,) for i in range(100)], "k BIGINT")
    skew = spark.createDataFrame([(0,)] * 91 + [(i,) for i in range(1, 10)], "k BIGINT")
    rf = key_skew_audit(flat, "k").first()
    rs = key_skew_audit(skew, "k").first()
    assert rf.gini == 0.0 and rf.max_over_avg == 1.0
    assert rs.gini > 0.7 and rs.top1_share == 0.91 and rs.max_over_avg == 9.1
    assert rf.n_keys == rs.n_keys == 10


def test_weighted_median_crossing_rule(spark):
    from gcpdatapipelines_spark.operators.agg import weighted_median

    # values 1..4 with weights 1,1,6,2: total 10, crossing at value 3
    rows = [("a", 1.0, 1.0, 1), ("a", 2.0, 1.0, 2), ("a", 3.0, 6.0, 3), ("a", 4.0, 2.0, 4)]
    df = spark.createDataFrame(rows, "k STRING, v DOUBLE, w DOUBLE, id BIGINT")
    r = weighted_median(df, "k", "v", "w", ["id"]).first()
    assert r.weighted_median == 3.0 and r.n == 4 and r.w_total == 10.0
    # plain median of values would say 2.5 — weights matter
    # exact half-crossing: weights 1,1 over values 1,2 -> 2*cw==tw at v=1
    df2 = spark.createDataFrame([("a", 1.0, 1.0, 1), ("a", 2.0, 1.0, 2)], "k STRING, v DOUBLE, w DOUBLE, id BIGINT")
    assert weighted_median(df2, "k", "v", "w", ["id"]).first().weighted_median == 1.0


def test_ratio_delta_method_vs_numpy(spark):
    import numpy as np

    from gcpdatapipelines_spark.operators.agg import ratio_metric_delta

    rng = np.random.RandomState(3)
    x = np.round(rng.gamma(2.0, 10.0, 200), 2)
    y = rng.poisson(5.0, 200) + 1
    rows = [(i, float(x[i]), int(y[i])) for i in range(200)]
    df = spark.createDataFrame(rows, "uid BIGINT, x DOUBLE, y BIGINT")
    r = ratio_metric_delta(df, "uid", F.col("x"), F.col("y")).first()
    n = 200
    ratio = x.sum() / y.sum()
    vx, vy = x.var(ddof=1), y.var(ddof=1)
    cxy = np.cov(x, y, ddof=1)[0, 1]
    se = np.sqrt((vx - 2 * ratio * cxy + ratio**2 * vy) / n) / y.mean()
    assert r.n_units == n
    assert abs(r.ratio - ratio) < 1e-5
    assert abs(r.se - se) < 1e-5
    assert r.ci_lo < r.ratio < r.ci_hi


def test_ratio_delta_units_without_numerator_count_as_zero(spark):
    from gcpdatapipelines_spark.operators.agg import ratio_metric_delta

    rows = [(1, 10.0, 1), (2, None, 1)]  # unit 2 has no revenue
    df = spark.createDataFrame(rows, "uid BIGINT, x DOUBLE, y BIGINT")
    r = ratio_metric_delta(df, "uid", F.col("x"), F.col("y")).first()
    assert r.n_units == 2 and r.ratio == 5.0  # 10 / 2, not 10 / 1


def test_bootstrap_ci_covers_mean_and_scales_with_n(spark):
    from gcpdatapipelines_spark.operators.agg import bootstrap_mean_ci

    rows = [(i, 10.0 + (i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "id BIGINT, x DOUBLE")
    r = bootstrap_mean_ci(df, "id", "x", replicates=60).first()
    true_mean = sum(10.0 + (i % 7) for i in range(500)) / 500
    assert r.n == 500 and abs(r.mean - true_mean) < 1e-6
    assert r.ci_lo < true_mean < r.ci_hi
    # width roughly ~ 2*1.96*sigma/sqrt(n): sigma(uniform 0..6)=2, n=500
    width = r.ci_hi - r.ci_lo
    assert 0.1 < width < 0.8
    # deterministic under repartitioning (hash-seeded weights)
    r2 = bootstrap_mean_ci(df.repartition(7), "id", "x", replicates=60).first()
    assert (r2.ci_lo, r2.ci_hi) == (r.ci_lo, r.ci_hi)
