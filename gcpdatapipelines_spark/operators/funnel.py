"""Product-analytics operators: ordered funnels and retention cohorts.

The analytics layer the reference's log pipeline (pipeline.py:44-71)
was feeding toward: given an event log, how many users complete an
ordered step sequence (funnel), and how do weekly signup cohorts keep
coming back (retention triangle).

Scale shapes:
- ``funnel_counts``: ONE pass over events -> per-user conditional
  min-timestamps (partial+final hash agg on user), then a single
  <=n_steps-row count — no self-joins, no step-to-step shuffles. The
  ordered-sequence semantics (step k counts only after step k-1) are
  sequential conditional aggregates over the SAME grouped pass.
- ``retention_cohorts``: two hash aggregates (per-user cohort, then
  (cohort, offset) distinct-user counts) — the cohort triangle at any
  scale is |cohorts| x |offsets| rows.

Week bucketing uses day-number arithmetic (epoch days / 7), NOT
date_trunc('week'), so the bucket is engine- and locale-independent
(weekday origins differ across engines — NOTES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .portable import trunc_dp


def funnel_user_stages(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within: str | None = None,
) -> DataFrame:
    """Per-user earliest completion time of each ORDERED funnel step:
    ``t1 = min ts of step1; t_k = min ts of step_k AFTER t_{k-1}``
    (and, with ``within`` — an INTERVAL string like '1 hour' — no
    later than ``t_{k-1} + within``: the conversion-window variant).

    All steps resolve in one grouped pass: step k's aggregate is
    ``min(CASE WHEN type = step_k THEN ts END)`` over rows later than
    the previous step's aggregate — expressed with nested aggregates
    via a two-level trick: collect each step's candidate timestamps as
    a sorted array once, then walk the chain in a scalar expression.
    Emits one row per user with ``t_1..t_n`` (NULL = never reached)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    # one grouped pass: per step, the sorted array of that user's
    # timestamps for the step (bounded by per-user event counts)
    aggs = [
        F.array_sort(
            F.collect_list(F.when(F.col(type_col) == s, F.col(ts_col)))
        ).alias(f"__ts_{i}")
        for i, s in enumerate(steps)
    ]
    per_user = df.groupBy(user_col).agg(*aggs)
    # walk the chain: t_k = first element of __ts_k strictly after
    # t_{k-1} (and within the window, if set). F.get (0-based) yields
    # NULL on an empty array, unlike element_at which throws under ANSI
    gap = F.expr(f"INTERVAL {within}") if within else None

    # closure factory: a default-arg lambda would change the INSPECTED
    # arity and make pyspark pass the array index as a second argument
    # (NOTES.md HOF-lambda rule)
    def _after(prev):
        if gap is not None:
            return lambda t: (t > prev) & (t <= prev + gap)
        return lambda t: t > prev

    out = per_user.withColumn("t_1", F.get(F.col("__ts_0"), 0))
    for k in range(1, len(steps)):
        nxt = F.get(F.filter(F.col(f"__ts_{k}"), _after(F.col(f"t_{k}"))), 0)
        out = out.withColumn(f"t_{k + 1}", nxt)
    return out.select(user_col, *[f"t_{k + 1}" for k in range(len(steps))])


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within: str | None = None,
) -> DataFrame:
    """Funnel summary: one row per step with the number of users whose
    ordered journey reached it. Monotonically non-increasing by
    construction (step k requires a step-k event after step k-1)."""
    stages = funnel_user_stages(df, user_col, ts_col, type_col, steps, within=within)
    counts = stages.agg(
        *[F.count(F.col(f"t_{k + 1}")).alias(f"__n_{k}") for k in range(len(steps))]
    )
    # typed literals, not interpolated selectExpr: a step name holding
    # a quote must not be able to break (or inject into) the SQL parse
    rows = F.array(
        *[
            F.struct(
                F.lit(k + 1).alias("step"),
                F.lit(s).alias("step_name"),
                F.col(f"__n_{k}").alias("n_users"),
            )
            for k, s in enumerate(steps)
        ]
    )
    return counts.select(F.inline(rows))


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period_days: int = 7,
) -> DataFrame:
    """Retention triangle: users are cohorted by the period of their
    FIRST event (epoch-day div period — engine-independent); each
    (cohort, offset) cell counts distinct users active ``offset``
    periods after their cohort period. Two hash aggregates, both
    partial+final; output is |cohorts| x |offsets| rows."""
    day = F.floor(F.col(ts_col).cast("timestamp").cast("double") / 86400.0)
    periods = df.select(
        F.col(user_col).alias("__u"),
        F.floor(day / period_days).cast("bigint").alias("__p"),
    ).distinct()
    first = periods.groupBy("__u").agg(F.min("__p").alias("__cohort"))
    return (
        periods.join(first, "__u")
        .groupBy(
            F.col("__cohort").alias("cohort_period"),
            (F.col("__p") - F.col("__cohort")).alias("offset"),
        )
        .agg(F.count_distinct("__u").alias("n_users"))
    )


def attribution(
    df: DataFrame,
    key: str,
    ts_col: str,
    channel_col: str,
    value_col: str,
    tiebreak: str,
    conversion: str = "purchase",
) -> DataFrame:
    """Marketing-style conversion attribution: every ``conversion``
    event is credited to the user's most recent preceding non-
    conversion channel (last-touch) AND their earliest one
    (first-touch). Returns stacked rows
    (model, channel, n_conversions, attributed_value) with an exact
    decimal value sum (MONEY SUMS, NOTES.md); conversions with no
    preceding touch are unattributable and excluded.

    One window pass over (key, ts, tiebreak) computes both models —
    last()/first() with ignorenulls over the strictly-preceding frame
    — then two partial-agg rollups on the channel; no self-joins, no
    per-conversion scans. The window and any upstream per-key work
    share one partitioning."""
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, tiebreak)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col(channel_col) != conversion, F.col(channel_col))
    marked = df.withColumn("__last_ch", F.last(touch, ignorenulls=True).over(w)).withColumn(
        "__first_ch", F.first(touch, ignorenulls=True).over(w)
    )
    pur = marked.filter(F.col(channel_col) == conversion)

    def _roll(col: str, model: str) -> DataFrame:
        return (
            pur.filter(F.col(col).isNotNull())
            .groupBy(F.col(col).alias("channel"))
            .agg(
                F.count("*").alias("n_conversions"),
                F.round(F.sum(F.col(value_col).cast("decimal(18,2)")), 2)
                .cast("double")
                .alias("attributed_value"),
            )
            .select(F.lit(model).alias("model"), "channel", "n_conversions", "attributed_value")
        )

    return _roll("__last_ch", "last_touch").unionAll(_roll("__first_ch", "first_touch"))


def time_decay_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    conversion_type: str = "purchase",
    halflife_days: float = 7.0,
) -> DataFrame:
    """(channel, n_touches, credit): marketing credit per touch channel
    where every touch preceding a conversion earns
    0.5^(days_before / halflife) — the time-decay attribution model
    that completes the first/last-touch pair (w15). A touch can earn
    credit from several later conversions, matching the standard
    model.

    Parity shape (NOTES.md): the decay weight is ONE fixed double
    expression rounded to 9 dp into DECIMAL(18,9) before the
    associative per-channel sum; day deltas come from epoch-seconds
    arithmetic shared textually with the oracle.

    Scale shape: touch-conversion pairs come from ONE equi-join on the
    user (per-user cost is touches x conversions for that user — the
    model's own output size; cap per-user history upstream for
    pathological actors), then one map-side-combinable hash agg on the
    channel. No window over raw events, no cartesian."""
    conv = df.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("__u"), F.col(ts_col).alias("__cts")
    )
    touch = df.filter(F.col(type_col) != conversion_type).select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("channel"),
        F.col(ts_col).alias("__tts"),
    )
    delta_days = (
        F.col("__cts").cast("double") - F.col("__tts").cast("double")
    ) / 86400.0
    wgt = trunc_dp(
        F.pow(F.lit(0.5), delta_days / F.lit(halflife_days)), 9
    ).cast("decimal(18,9)")
    pairs = touch.join(conv, "__u").filter(F.col("__tts") < F.col("__cts"))
    return pairs.groupBy("channel").agg(
        F.count("*").alias("n_touches"),
        F.round(F.sum(wgt), 6).cast("double").alias("credit"),
    )


def cohort_ltv(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    period_days: int = 7,
) -> DataFrame:
    """(cohort, age, buyers, rev, cum_rev): lifetime-value curves —
    users cohorted by the period of their FIRST conversion (epoch-day
    div period, engine-independent like :func:`retention_cohorts`),
    revenue accumulated per cohort over ages. Completes the retention
    triangle with the value dimension: cum_rev / cohort size is the
    LTV-at-age curve.

    Parity shape (NOTES.md): period revenue is an EXACT decimal sum;
    the cumulative sum runs over DECIMALS in an age-ordered window
    (associative — no double reassociation), cast to double only at
    the edge.

    Scale shape: first-conversion is one partial-agg pass; the cohort
    join is user-keyed (co-partitioned with the first pass under AQE);
    the (cohort, age) aggregate and the cumulative window both run on
    the bounded |cohorts| x |ages| grid."""
    period = F.floor(
        F.floor(F.col(ts_col).cast("timestamp").cast("double") / 86400.0)
        / period_days
    ).cast("long")
    ev = df.select(
        F.col(user_col).alias("__u"),
        period.alias("__p"),
        F.col(value_col).cast("decimal(18,6)").alias("__v"),
    )
    first = ev.groupBy("__u").agg(F.min("__p").alias("cohort"))
    per = (
        ev.join(first, "__u")
        .groupBy(F.col("cohort"), (F.col("__p") - F.col("cohort")).alias("age"))
        .agg(
            F.countDistinct("__u").alias("buyers"),
            F.sum("__v").alias("__rev"),
        )
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per.select(
        "cohort",
        "age",
        "buyers",
        F.col("__rev").cast("double").alias("rev"),
        F.sum("__rev").over(w).cast("double").alias("cum_rev"),
    )


def growth_accounting(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period_days: int = 7,
) -> DataFrame:
    """(period, n_new, n_retained, n_resurrected, n_churned): the
    growth-accounting table — every active user classified per period
    as NEW (first period ever), RETAINED (also active the previous
    period), or RESURRECTED (returning after a gap); CHURNED counts
    users active the previous period who did not return. The identity
    active(p) = new + retained + resurrected and
    churned(p) = active(p-1) - retained(p) is pinned in tests.

    Pure integer epoch-day period logic over the DISTINCT (user,
    period) activity set — parity exact.

    Scale shape: one distinct aggregate reduces events to user-period
    rows; classification is lag/lead windows per user over that
    (bounded) activity set; the final rollup is a hash agg per
    period. The event log is scanned once."""
    period = F.floor(
        F.floor(F.col(ts_col).cast("timestamp").cast("double") / 86400.0)
        / period_days
    ).cast("long")
    act = df.select(F.col(user_col).alias("__u"), period.alias("p")).distinct()
    w = Window.partitionBy("__u").orderBy("p")
    marked = act.select(
        "__u",
        "p",
        F.lag("p").over(w).alias("__prev"),
        F.lead("p").over(w).alias("__next"),
        F.min("p").over(
            Window.partitionBy("__u")
            .orderBy("p")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("__first"),
    )
    gmax = act.agg(F.max("p").alias("__gmax"))
    cls = marked.crossJoin(F.broadcast(gmax)).select(
        "p",
        F.when(F.col("p") == F.col("__first"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_new"),
        F.when(F.col("__prev") == F.col("p") - 1, F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_retained"),
        F.when(
            (F.col("p") != F.col("__first"))
            & (F.col("__prev") < F.col("p") - 1),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_resurrected"),
        # this user churns at p+1 when no activity lands there and the
        # observation window extends at least to p+1
        F.when(
            (F.col("__next").isNull() | (F.col("__next") > F.col("p") + 1))
            & (F.col("p") + 1 <= F.col("__gmax")),
            F.col("p") + 1,
        ).alias("churn_period"),
    )
    active = cls.groupBy("p").agg(
        F.sum("is_new").alias("n_new"),
        F.sum("is_retained").alias("n_retained"),
        F.sum("is_resurrected").alias("n_resurrected"),
    )
    churned = (
        cls.where(F.col("churn_period").isNotNull())
        .groupBy(F.col("churn_period").alias("p"))
        .agg(F.count("*").alias("n_churned"))
    )
    return (
        active.join(churned, "p", "left")
        .withColumn("n_churned", F.coalesce(F.col("n_churned"), F.lit(0)))
        .select(
            F.col("p").alias("period"),
            "n_new",
            "n_retained",
            "n_resurrected",
            "n_churned",
        )
    )


def _markov_transition_counts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    channel_col: str,
    conversion: str,
    order_col: str | None = None,
) -> dict:
    """{(src, dst): n}: first-order transition counts over journeys cut
    at the first conversion, with START virtual source, CONV absorbing
    conversion, and NULL absorbing journey-end. The distributed half of
    both Markov tiers: one user-keyed window pass + a hash agg over
    <= (k+2)^2 state pairs; only that bounded table is collected."""
    from pyspark.sql import Window

    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        *([F.col(order_col).alias("__o")] if order_col else []),
        F.when(F.col(channel_col) == conversion, F.lit("CONV"))
        .otherwise(F.col(channel_col))
        .alias("__st"),
    )
    w = Window.partitionBy("__u").orderBy(
        "__ts", *(["__o"] if order_col else [])
    )
    # keep everything up to and including the first CONV
    flagged = ev.withColumn(
        "__nconv_before",
        F.count(F.when(F.col("__st") == "CONV", 1)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).filter(F.col("__nconv_before") == 0)
    stepped = flagged.select(
        "__u",
        F.coalesce(F.lag("__st").over(w), F.lit("START")).alias("src"),
        F.col("__st").alias("dst"),
        F.when(
            F.lead("__st").over(w).isNull() & (F.col("__st") != "CONV"),
            F.lit("NULL"),
        ).alias("__tail"),
    )
    trans = stepped.select("src", "dst").unionByName(
        stepped.filter(F.col("__tail").isNotNull()).select(
            F.col("dst").alias("src"), F.col("__tail").alias("dst")
        )
    )
    return {
        (r["src"], r["dst"]): r["n"]
        for r in trans.groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
        .collect()  # bounded: <= (k+2)^2 rows, k = channel-domain size
    }


def markov_attribution_quantized(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    channel_col: str,
    conversion: str,
    order_col: str | None = None,
    steps: int = 60,
) -> DataFrame:
    """Markov removal-effect attribution, exact-integer tier: the
    absorbing-chain conversion probability is computed as the
    ``steps``-step absorption probability in 1e-12 units via integer
    power iteration — x_{t+1}(s) = (sum_d n(s,d) * val_t(d)) // tot(s)
    with val(CONV) = 1e12, val(NULL) = val(removed) = 0 — instead of
    the float linear solve (:func:`markov_attribution`, which stays as
    the production tier). Every operation is integer and both engines'
    integer division truncates toward zero, so the result is
    bit-identical by construction and a textually-unrolled DuckDB twin
    hash-checks the whole iteration (queries._markov_sql). x_t is
    monotone nondecreasing and bounded, so 60 steps is far past the
    fixture journeys' absorption horizon; the VALUE is defined as the
    60-step probability, which both sides compute exactly regardless.

    Same scale split as the float tier: transition counting is the
    only data-sized work; the iteration runs on the bounded
    <= (k+2)^2 table (here in exact python ints; BIGINT headroom needs
    total transitions * 1e12 < 2^63 — lower the scale past ~9e6
    transitions per source state).

    Returns (channel, removal_effect_ppm, share_ppm,
    attributed_conversions_c) ordered by channel, all BIGINT."""
    counts = _markov_transition_counts(
        events, user_col, ts_col, channel_col, conversion, order_col
    )
    by_src: dict[str, list] = {}
    for (s, d), c in counts.items():
        by_src.setdefault(s, []).append((d, c))
    tot = {s: sum(c for _, c in lst) for s, lst in by_src.items()}
    channels = sorted(s for s in by_src if s != "START")

    def absorb(removed: str | None) -> int:
        x: dict[str, int] = {}
        for _ in range(steps):
            nx = {}
            for s, lst in by_src.items():
                if s == removed:
                    continue
                acc = 0
                for d, c in lst:
                    if d == "CONV":
                        val = 1_000_000_000_000
                    elif d == "NULL" or d == removed:
                        val = 0
                    else:
                        val = x.get(d, 0)
                    acc += c * val
                nx[s] = acc // tot[s]
            x = nx
        return x.get("START", 0)

    base = absorb(None)
    total_conv = sum(c for (s, d), c in counts.items() if d == "CONV")
    eff = {
        c: max(0, 1_000_000 - (absorb(c) * 1_000_000) // base)
        if base > 0
        else 0
        for c in channels
    }
    tot_eff = sum(eff.values())
    rows = [
        (
            c,
            eff[c],
            (eff[c] * 1_000_000) // tot_eff if tot_eff > 0 else 0,
            (total_conv * 100 * eff[c]) // tot_eff if tot_eff > 0 else 0,
        )
        for c in channels
    ]
    return events.sparkSession.createDataFrame(
        rows,
        "channel STRING, removal_effect_ppm BIGINT, share_ppm BIGINT,"
        " attributed_conversions_c BIGINT",
    ).orderBy("channel")


def markov_attribution(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    channel_col: str,
    conversion: str,
    order_col: str | None = None,
) -> DataFrame:
    """Markov removal-effect channel attribution (first-order
    absorbing chain): each user's journey = channel sequence up to
    the FIRST conversion event (absorbing CONV) or journey end
    (absorbing NULL); a channel's credit is its removal effect — the
    relative drop in START→CONV probability when the channel is
    deleted (its outgoing mass redirected to NULL) — normalized into
    shares of total conversions.

    Scale split: transition counting is the ONLY data-sized work (one
    user-keyed window pass + a hash agg over ≤ (k+2)² state pairs);
    the chain solve runs on the driver over that bounded matrix
    (channels are a catalog-sized domain — same bounded-metadata
    invariant as IVF centroids). numpy.linalg solves the absorbing
    system exactly, so the result is deterministic.

    Returns (channel, removal_effect, attribution_share,
    attributed_conversions) ordered by channel."""
    import numpy as np

    counts = _markov_transition_counts(
        events, user_col, ts_col, channel_col, conversion, order_col
    )
    channels = sorted(
        {s for s, _ in counts if s not in ("START",)}
        | {d for _, d in counts if d not in ("CONV", "NULL")}
        - {"START"}
    )
    states = ["START"] + channels  # transient
    absorbing = ["CONV", "NULL"]

    def p_conv(removed=None):
        trans_states = [s for s in states if s != removed]
        idx = {s: i for i, s in enumerate(trans_states)}
        n = len(trans_states)
        q = np.zeros((n, n))
        r = np.zeros((n, 2))
        for i, s in enumerate(trans_states):
            out = {
                d: c for (src, d), c in counts.items() if src == s
            }
            tot = sum(out.values())
            if tot == 0:
                r[i, 1] = 1.0  # dangling -> NULL
                continue
            for d, c in out.items():
                pr = c / tot
                if d == removed:
                    r[i, 1] += pr  # removed channel's mass -> NULL
                elif d == "CONV":
                    r[i, 0] += pr
                elif d == "NULL":
                    r[i, 1] += pr
                else:
                    q[i, idx[d]] += pr
        b = np.linalg.solve(np.eye(n) - q, r)  # absorption probs
        return float(b[idx["START"], 0])

    base = p_conv()
    total_conv = sum(c for (s, d), c in counts.items() if d == "CONV")
    effects = {
        c: max(0.0, 1.0 - (p_conv(removed=c) / base if base > 0 else 0.0))
        for c in channels
    }
    tot_eff = sum(effects.values())
    rows = [
        (
            c,
            round(effects[c], 6),
            round(effects[c] / tot_eff, 6) if tot_eff > 0 else 0.0,
            round(total_conv * effects[c] / tot_eff, 2)
            if tot_eff > 0
            else 0.0,
        )
        for c in channels
    ]
    return events.sparkSession.createDataFrame(
        rows,
        "channel STRING, removal_effect DOUBLE, attribution_share DOUBLE,"
        " attributed_conversions DOUBLE",
    ).orderBy("channel")


def shapley_attribution(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    channel_col: str,
    conversion: str,
) -> DataFrame:
    """Shapley-value channel attribution (order-free companion to
    markov_attribution): each user contributes their journey's
    DISTINCT pre-conversion channel set and a converted flag; the
    coalition value v(S) is the observed conversion rate of users
    whose set is exactly S (unobserved coalitions contribute 0, the
    standard simplified-Shapley convention, Zhao et al. 2018); each
    channel's credit is its exact Shapley value over those
    coalitions, normalized into shares of total conversions.

    Scale split: the distributed work is one distinct + two hash aggs
    ending in <= 2^k coalition rows (k = channel-domain size, a
    catalog-sized constant); the factorial-weighted Shapley sum runs
    driver-side over that bounded table.

    Returns (channel, shapley_value, attribution_share,
    attributed_conversions) ordered by channel."""
    from itertools import combinations
    from math import factorial

    from pyspark.sql import Window

    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(channel_col).alias("__c"),
    )
    w = Window.partitionBy("__u").orderBy("__ts")
    flagged = ev.withColumn(
        "__nconv_before",
        F.count(F.when(F.col("__c") == conversion, 1)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).filter(F.col("__nconv_before") == 0)
    per_user = flagged.groupBy("__u").agg(
        F.array_sort(
            F.array_distinct(
                F.collect_list(
                    F.when(F.col("__c") != conversion, F.col("__c"))
                )
            )
        ).alias("__set"),
        F.max(
            F.when(F.col("__c") == conversion, 1).otherwise(0)
        ).alias("__conv"),
    )
    coalitions = {
        tuple(r["__set"]): (r["n"], r["nc"])
        for r in per_user.groupBy("__set")
        .agg(
            F.count("*").alias("n"),
            F.sum("__conv").alias("nc"),
        )
        .collect()  # bounded: <= 2^k rows
        if r["__set"]
    }
    channels = sorted({c for s in coalitions for c in s})
    k = len(channels)
    v = {
        s: (nc / n if n else 0.0) for s, (n, nc) in coalitions.items()
    }

    def val(subset):
        return v.get(tuple(sorted(subset)), 0.0)

    shap = {}
    for c in channels:
        others = [x for x in channels if x != c]
        total = 0.0
        for r in range(len(others) + 1):
            for s in combinations(others, r):
                wgt = (
                    factorial(len(s))
                    * factorial(k - len(s) - 1)
                    / factorial(k)
                )
                total += wgt * (val(set(s) | {c}) - val(s))
        shap[c] = total
    total_conv = sum(nc for (_, nc) in coalitions.values())
    tot = sum(x for x in shap.values() if x > 0)
    rows = [
        (
            c,
            round(shap[c], 6),
            round(max(0.0, shap[c]) / tot, 6) if tot > 0 else 0.0,
            round(total_conv * max(0.0, shap[c]) / tot, 2)
            if tot > 0
            else 0.0,
        )
        for c in channels
    ]
    return events.sparkSession.createDataFrame(
        rows,
        "channel STRING, shapley_value DOUBLE, attribution_share DOUBLE,"
        " attributed_conversions DOUBLE",
    ).orderBy("channel")
