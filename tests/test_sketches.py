"""Sketch-family contracts: estimator accuracy bounds, one-sided error
guarantees, merge/partitioning invariance. The bit-level parity with
DuckDB is covered by the oracle gate (test_oracle_parity); these pin
the PROBABILISTIC guarantees the oracle can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcpdatapipelines_spark.operators.sketches import (
    bloom_membership,
    countmin_estimates,
    hll_distinct,
    kmv_distinct,
)


def _keyed(spark, n, dup_every=3):
    """n rows over ~n/dup_every distinct string keys."""
    return spark.range(n).select(
        F.concat(F.lit("k"), (F.col("id") % (n // dup_every)).cast("string")).alias(
            "key"
        )
    )


def test_hll_within_standard_error(spark):
    df = _keyed(spark, 9000, dup_every=3)  # 3000 distinct
    row = hll_distinct(df, "key", p=9).collect()[0]
    assert row.n_exact == 3000
    # HLL standard error = 1.04/sqrt(m) ~ 4.6% at m=512; allow 3 sigma
    assert row.rel_err < 3 * 1.04 / (512**0.5), row
    assert row.m == 512


def test_hll_small_range_correction_is_near_exact(spark):
    df = _keyed(spark, 120, dup_every=2)  # 60 distinct << 2.5 m
    row = hll_distinct(df, "key", p=9).collect()[0]
    assert row.v_empty > 0 and row.rel_err < 0.10, row


def test_hll_partitioning_invariant(spark):
    df = _keyed(spark, 5000)
    a = hll_distinct(df, "key", p=9).collect()[0]
    b = hll_distinct(df.repartition(13), "key", p=9).collect()[0]
    assert a == b  # integer register fold -> bit-identical


def test_kmv_exact_below_k(spark):
    df = _keyed(spark, 300, dup_every=3)  # 100 distinct < k=256
    row = kmv_distinct(df, "key", k=256).collect()[0]
    assert row.kth_u is None
    assert row.kmv_estimate == row.n_exact == 100 and row.rel_err == 0.0


def test_kmv_estimate_above_k(spark):
    df = _keyed(spark, 12000, dup_every=3)  # 4000 distinct
    row = kmv_distinct(df, "key", k=256).collect()[0]
    assert row.n_exact == 4000
    # KMV rel. std error ~ 1/sqrt(k-2) ~ 6.3%; allow 3 sigma
    assert row.rel_err < 0.19, row


def test_countmin_never_undercounts(spark):
    df = _keyed(spark, 6000, dup_every=5)
    rows = countmin_estimates(df, "key", depth=4, width=256, top=20).collect()
    assert len(rows) == 20
    assert all(r.cm_estimate >= r.true_n for r in rows), rows
    assert all(r.overcount == r.cm_estimate - r.true_n for r in rows)


def test_countmin_exact_when_wide(spark):
    # 40 distinct keys into 4 x 4096 counters: collisions vanishingly
    # unlikely -> estimates exact
    df = _keyed(spark, 400, dup_every=10)
    rows = countmin_estimates(df, "key", depth=4, width=4096, top=10).collect()
    assert all(r.cm_estimate == r.true_n for r in rows), rows


def test_bloom_no_false_negatives_ever(spark):
    build = spark.range(500).select(F.col("id").alias("bkey"))
    probe = spark.range(1500).select(F.col("id").alias("pkey"))  # 500 in, 1000 out
    out = {
        (r.is_member, r.bloom_hit): r.n
        for r in bloom_membership(
            build, probe, "bkey", "pkey", k=7, m_bits=1 << 14
        ).collect()
    }
    assert (True, False) not in out, out  # structural guarantee
    assert out.get((True, True)) == 500
    fp = out.get((False, True), 0)
    tn = out.get((False, False), 0)
    assert fp + tn == 1000
    # 500 keys x 7 bits in 16384 -> FP rate ~ (1-e^-0.21)^7 ~ 1e-5
    assert fp <= 5, out


def test_bloom_tiny_filter_saturates_honestly(spark):
    # m_bits=64 with 500 keys: filter saturates, everything hits —
    # still zero false negatives, FP rate -> 1 (the documented
    # degradation mode, not an error)
    build = spark.range(500).select(F.col("id").alias("bkey"))
    probe = spark.range(1000).select(F.col("id").alias("pkey"))
    out = {
        (r.is_member, r.bloom_hit): r.n
        for r in bloom_membership(
            build, probe, "bkey", "pkey", k=7, m_bits=64
        ).collect()
    }
    assert (True, False) not in out, out
    assert out.get((True, True)) == 500
