"""Table profiling: per-column null/distinct/min/max stats in ONE scan.

The data-engineering preflight over any new ingest (the reference's
schema work — schema_generator.ipynb, pipeline_csv_bq_template.py:74-100
— stops at declaring types; this measures what actually arrived):
null rates catch broken joins upstream, distinct counts catch key
collisions, min/max catch unit drift.

Scale shape: a single aggregate pass produces every per-column stat in
one wide row, which is then unpivoted driver-free with ``stack()``.
Exact count(DISTINCT) over multiple columns makes Catalyst plan an
Expand (one input replica per distinct column) — acceptable for
profiling runs; pass ``approx=True`` to swap in HyperLogLog
(approx_count_distinct) and keep the scan single-width at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .portable import trunc_dp
from pyspark.sql.types import NumericType

_NUM_ROUND = 6


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """One row per profiled column: ``col_name, n_rows, n_nonnull,
    n_distinct, min_num, max_num`` (min/max are NULL for non-numeric
    columns; numeric ones are cast to double and rounded to 6dp so the
    output is engine-stable)."""
    cols = cols or df.columns
    types = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count("*").alias("__n_rows")]
    distinct = F.approx_count_distinct if approx else F.count_distinct
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(distinct(F.col(c)).alias(f"__nd_{c}"))
        if isinstance(types[c], NumericType):
            aggs.append(F.round(F.min(c).cast("double"), _NUM_ROUND).alias(f"__mn_{c}"))
            aggs.append(F.round(F.max(c).cast("double"), _NUM_ROUND).alias(f"__mx_{c}"))
    wide = df.agg(*aggs)
    # unpivot the single wide row into one row per column via stack()
    parts = []
    for c in cols:
        mn = f"__mn_{c}" if isinstance(types[c], NumericType) else "CAST(NULL AS DOUBLE)"
        mx = f"__mx_{c}" if isinstance(types[c], NumericType) else "CAST(NULL AS DOUBLE)"
        parts.append(f"'{c}', __nn_{c}, __nd_{c}, {mn}, {mx}")
    stack = (
        f"stack({len(cols)}, {', '.join(parts)}) AS "
        "(col_name, n_nonnull, n_distinct, min_num, max_num)"
    )
    return wide.selectExpr("__n_rows AS n_rows", stack).select(
        "col_name", "n_rows", "n_nonnull", "n_distinct", "min_num", "max_num"
    )


def column_entropy(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_name, n_distinct, entropy): Shannon entropy (nats) of each
    column's value distribution — the one-number skew/uniformity
    signal a profiling pass wants next to distinct counts (entropy 0 =
    constant column; ln(n_distinct) = perfectly uniform).

    One count aggregate per column over a single unpivoted scan
    (explode of (col, value) pairs — same one-scan shape as
    profile_columns), then entropy = ln(N) - sum(c*ln(c))/N from the
    per-value counts: that algebraic form needs only ONE pass over the
    count table and is the textual formula the oracle mirrors. NULLs
    are excluded (they are a missing-ness signal, profiled separately).
    """
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("col_name"), F.col(c).cast("string").alias("val"))
            for c in cols
        ]
    )
    long = (
        df.select(F.explode(pairs).alias("p"))
        .select("p.col_name", "p.val")
        .filter(F.col("val").isNotNull())
    )
    counts = long.groupBy("col_name", "val").agg(F.count("*").alias("c"))
    return (
        counts.groupBy("col_name")
        .agg(
            F.count("*").alias("n_distinct"),
            F.sum("c").alias("__n"),
            F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias(
                "__clogc"
            ),
        )
        .select(
            "col_name",
            "n_distinct",
            F.round(
                F.log(F.col("__n").cast("double"))
                - F.col("__clogc") / F.col("__n").cast("double"),
                6,
            ).alias("entropy"),
        )
    )


def drift_psi(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    nbins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two samples of a numeric
    column over fixed-width bins on [lo, hi): one row
    (psi, n_base, n_current); conventional reading: <0.1 stable,
    0.1-0.25 drifting, >0.25 shifted.

    PSI = sum_bins (p_b - q_b) * ln(p_b / q_b) with proportions
    floored at ``eps`` so empty bins don't produce infinities. Fixed
    (not quantile) bins keep the comparison engine-exact and stable
    across rounds — the same determinism trade histogram_fixed_width
    makes. Each side is one partial-agg histogram; the join is on the
    <= nbins bin ids."""
    def hist(df: DataFrame, name: str) -> DataFrame:
        idx = F.floor(
            (F.col(value_col) - F.lit(lo)) / F.lit((hi - lo) / nbins)
        ).cast("int")
        clamped = F.least(F.greatest(idx, F.lit(0)), F.lit(nbins - 1))
        return (
            df.filter(F.col(value_col).isNotNull())
            .select(clamped.alias("bin"))
            .groupBy("bin")
            .agg(F.count("*").alias(name))
        )

    b = hist(base, "nb")
    c = hist(current, "nc")
    bins = base.sparkSession.range(nbins).select(F.col("id").cast("int").alias("bin"))
    j = (
        bins.join(b, "bin", "left")
        .join(c, "bin", "left")
        .select(
            "bin",
            F.coalesce("nb", F.lit(0)).alias("nb"),
            F.coalesce("nc", F.lit(0)).alias("nc"),
        )
    )
    tot = j.agg(F.sum("nb").alias("tb"), F.sum("nc").alias("tc"))
    p = F.greatest(F.col("nb").cast("double") / F.col("tb"), F.lit(float(eps)))
    q = F.greatest(F.col("nc").cast("double") / F.col("tc"), F.lit(float(eps)))
    return (
        j.crossJoin(F.broadcast(tot))
        .select(((p - q) * F.log(p / q)).alias("__term"), "nb", "nc")
        .agg(
            F.round(F.sum("__term"), 6).alias("psi"),
            F.sum("nb").alias("n_base"),
            F.sum("nc").alias("n_current"),
        )
    )


def freshness_audit(
    df: DataFrame,
    shard_col: str,
    ts_col: str,
    stale_after_hours: float = 24.0,
) -> DataFrame:
    """(shard, n_rows, last_seen, lag_hours, stale): per-shard data
    freshness vs the dataset's own high-water mark — the first
    warehouse-maintenance monitor (a feed that stopped landing shows
    up as a growing lag, not an empty diff).

    last_seen is a COPY of a raw timestamp (max), the lag is one fixed
    double chain over epoch seconds, so parity is exact. One
    map-side-combinable hash aggregate; the global max comes from an
    unbounded window over the |shards|-row aggregate."""
    from pyspark.sql import Window

    per = df.groupBy(F.col(shard_col).alias("shard")).agg(
        F.count("*").alias("n_rows"), F.max(ts_col).alias("last_seen")
    )
    w = Window.partitionBy()
    lag_h = (
        F.max("last_seen").over(w).cast("double")
        - F.col("last_seen").cast("double")
    ) / 3600.0
    return per.select(
        "shard",
        "n_rows",
        "last_seen",
        trunc_dp(lag_h, 4).alias("lag_hours"),
        (lag_h > F.lit(stale_after_hours)).alias("stale"),
    )


def key_skew_audit(
    df: DataFrame, key_col: str, top_n: int = 1
) -> DataFrame:
    """(n_keys, n_rows, gini, top1_share, max_over_avg): skew profile
    of a join/partition key — the diagnostic run BEFORE choosing a
    join strategy at scale (a high Gini / max_over_avg key wants
    salting or AQE skew-join; a flat one doesn't). Gini over the
    per-key frequency distribution via the rank formula
    G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n on ascending counts.

    Parity shape: counts are integers; rank-weighted sums stay in
    DECIMAL (exact), the final G / shares are fixed double chains.

    Scale shape: one hash aggregate to per-key counts, one window
    rank over the |keys|-row aggregate, one reduce row. The fact is
    scanned once."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col)).agg(F.count("*").alias("__c"))
    w = Window.orderBy(F.col("__c"), F.col(key_col))
    ranked = counts.select(
        "__c", F.row_number().over(w).alias("__i")
    )
    return ranked.agg(
        F.count("*").alias("n_keys"),
        F.sum("__c").alias("n_rows"),
        trunc_dp(
            F.lit(2.0)
            * F.sum(
                (F.col("__i").cast("decimal(18,0)") * F.col("__c"))
            ).cast("double")
            / (F.count("*") * F.sum("__c").cast("double"))
            - (F.count("*") + F.lit(1)).cast("double") / F.count("*"),
            6,
        ).alias("gini"),
        trunc_dp(
            F.max("__c").cast("double") / F.sum("__c"), 6
        ).alias("top1_share"),
        trunc_dp(
            F.max("__c").cast("double")
            / (F.sum("__c").cast("double") / F.count("*")),
            4,
        ).alias("max_over_avg"),
    )


def join_size_estimate(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    rate: float = 0.05,
) -> DataFrame:
    """Estimate |left JOIN right| on an equi-key WITHOUT running the
    join — the pre-flight sizing input for join-strategy / salting
    decisions (pairs with key_skew_audit).

    Universe sampling (end-biased sampling's uniform core): a key k
    enters the sample iff u(k) = h60(k)/2^60 <= rate — the SAME
    deterministic coin on both sides, so sampled per-key count pairs
    line up exactly. The true join size is sum_k cL(k)*cR(k); the
    estimator sums the product over sampled keys and scales by
    1/rate. Unbiased; relative error concentrates as the sampled
    mass grows (heavy join keys are the mass — and any key with
    u <= rate is observed with its EXACT counts, so unlike row-level
    Bernoulli sampling the cL*cR products carry no quadratic
    inflation).

    Scale shape: each side reduces to its sampled-key count histogram
    (one partial-agg scan over a hash-pruned fraction of rows — the
    u-filter is computable per row pre-shuffle); the histograms join
    tiny-to-tiny. The full fact never shuffles; the audit column
    n_exact (the true product-sum over FULL histograms) is the only
    full-width aggregation and drops out in production.

    Returns ONE row: (rate, n_keys_sampled, est_join_rows,
    exact_join_rows, rel_err)."""
    from .sketches import HASH_BITS, _h60

    two60 = float(1 << HASH_BITS)

    def hist(df: DataFrame, key: str, out: str) -> DataFrame:
        return df.groupBy(F.col(key).alias("__k")).agg(
            F.count("*").alias(out)
        )

    hl = hist(left, left_key, "__cl")
    hr = hist(right, right_key, "__cr")
    full = hl.join(hr, "__k").select(
        F.sum(F.col("__cl") * F.col("__cr")).alias("exact_join_rows")
    )
    u = _h60(F.col("__k")) / F.lit(two60)
    sl = hl.filter(u <= rate)
    sr = hr.filter(u <= rate)
    est = sl.join(sr, "__k").agg(
        F.count("*").cast("bigint").alias("n_keys_sampled"),
        trunc_dp(
            F.coalesce(F.sum(F.col("__cl") * F.col("__cr")), F.lit(0))
            / rate,
            1,
        ).alias("est_join_rows"),
    )
    return est.crossJoin(full).select(
        F.lit(rate).alias("rate"),
        "n_keys_sampled",
        "est_join_rows",
        F.col("exact_join_rows").cast("bigint").alias("exact_join_rows"),
        trunc_dp(
            F.abs(F.col("est_join_rows") - F.col("exact_join_rows"))
            / F.col("exact_join_rows"),
            6,
        ).alias("rel_err"),
    )
