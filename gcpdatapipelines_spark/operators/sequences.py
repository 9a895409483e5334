"""Behavior-sequence construction: ordered per-key event sequences,
transition (Markov) counts, and rolling aggregates.

The bridge from an event log to sequence-model training data: each
user's clickstream becomes one ordered array (the training example),
the transition matrix is the cheapest sanity check / baseline model
over those sequences, and rolling aggregates are the standard
point-in-time features. No reference analogue (the reference's log
pipeline stops at per-visit duration, pipeline.py:44-71).

Scale shapes: everything here shuffles ONCE on the entity key;
sequences use array_sort over collect_list (order-independent input,
deterministic output — collect_list alone has no ordering guarantee
across retries/partitions); transitions and rolling stats are window
passes sharing that same partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .portable import trunc_dp


def event_sequences(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
    out_col: str = "seq",
) -> DataFrame:
    """One row per key with the chronologically-ordered array of
    ``value_col``. Sort happens inside the array (array_sort over
    (ts, tiebreak, value) structs), not in the shuffle, so the result
    is deterministic regardless of partitioning/retries. Keys with
    pathologically long histories should be length-capped downstream
    (F.slice) before feeding a trainer."""
    packed = F.struct(F.col(ts_col), F.col(tiebreak), F.col(value_col).alias("__v"))
    return df.groupBy(key).agg(
        F.transform(
            F.array_sort(F.collect_list(packed)), lambda s: s.getField("__v")
        ).alias(out_col)
    )


def transition_counts(
    df: DataFrame,
    key: str,
    ts_col: str,
    state_col: str,
    tiebreak: str,
) -> DataFrame:
    """First-order Markov transition counts over each key's ordered
    state stream: one (prev_state, state, n) row per observed
    transition type. lag() over (key, ts, tiebreak) + one partial+final
    count — the |states|^2-row baseline model / drift detector for
    sequence corpora."""
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    steps = df.withColumn("prev_state", F.lag(F.col(state_col)).over(w)).filter(
        F.col("prev_state").isNotNull()
    )
    return (
        steps.groupBy("prev_state", F.col(state_col).alias("state"))
        .agg(F.count("*").alias("n"))
    )


def bigram_lift(
    df: DataFrame,
    key: str,
    ts_col: str,
    state_col: str,
    tiebreak: str,
) -> DataFrame:
    """Pointwise co-occurrence lift over each key's ordered state
    stream: for every observed bigram (a, b),
    lift = P(a,b) / (P(a)·P(b)) computed over the bigram table —
    lift > 1 means b follows a more often than independence predicts
    (PMI = ln(lift); the ln is left to the caller so the statistic
    stays a single exact-integer ratio, portable bit-for-bit across
    engines: c_ab·N and c_a·c_b are exact BIGINT products, and only
    ONE double division happens at the end).

    Plan shape: one lag window on (key, ts, tiebreak), one
    partial+final count to the bigram table, then the marginals and
    grand total come from window sums OVER THE BIGRAM TABLE itself
    (|states|² rows, trivially small) — no second scan of the events.
    """
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    steps = df.withColumn("prev_state", F.lag(F.col(state_col)).over(w)).filter(
        F.col("prev_state").isNotNull()
    )
    bi = (
        steps.groupBy(
            F.col("prev_state").alias("a"), F.col(state_col).alias("b")
        )
        .agg(F.count("*").alias("n_ab"))
    )
    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    wall = Window.partitionBy()
    return bi.select(
        "a",
        "b",
        "n_ab",
        trunc_dp(
            (F.col("n_ab") * F.sum("n_ab").over(wall)).cast("double")
            / (F.sum("n_ab").over(wa) * F.sum("n_ab").over(wb)).cast("double"),
            6,
        ).alias("lift"),
    )


def rolling_mean(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
    n_rows: int,
    out_col: str = "rolling_mean",
    decimal_type: str = "decimal(18,2)",
) -> DataFrame:
    """Trailing mean of the last ``n_rows`` values per key (current row
    inclusive) — the standard point-in-time feature. The windowed SUM
    runs in decimal (associative, exact), so the mean is bit-identical
    across engines regardless of how their moving-aggregate algorithms
    (running sum vs segment tree) associate the additions; one double
    division at the end."""
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, tiebreak)
        .rowsBetween(-(n_rows - 1), 0)
    )
    s = F.sum(F.col(value_col).cast(decimal_type)).over(w).cast("double")
    n = F.count(value_col).over(w)
    return df.withColumn(out_col, s / n)


def ema_per_key(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
    alpha: float = 0.7,
    out_col: str = "ema",
) -> DataFrame:
    """Exponential moving average per key over the chronological value
    stream: s_0 = x_0, s_i = alpha*s_{i-1} + (1-alpha)*x_i; returns
    each key's FINAL smoothed value (the recency-weighted feature).

    EMA is inherently sequential — no algebraic partial-agg form — so
    it folds over the per-key sorted array (array_sort inside the
    aggregate, one shuffle, state O(history) bounded by per-key event
    counts; cap with F.slice upstream for unbounded keys). The fold
    order is total (ts, tiebreak), so the result is deterministic and
    engine-identical: the same double multiply-add sequence."""
    packed = F.struct(F.col(ts_col), F.col(tiebreak), F.col(value_col).alias("__v"))
    vals = F.transform(
        F.array_sort(F.collect_list(packed)), lambda s: s.getField("__v").cast("double")
    )
    grouped = df.groupBy(key).agg(vals.alias("__vals"))
    a, b = float(alpha), float(1.0 - alpha)
    ema = F.aggregate(
        F.slice(F.col("__vals"), 2, F.greatest(F.size("__vals") - 1, F.lit(0))),
        F.get(F.col("__vals"), 0),
        lambda acc, x: acc * F.lit(a) + x * F.lit(b),
    )
    # trunc_dp, not round: the fold is bit-identical on both engines,
    # but round(x, 6) tie-breaking is not — at sf0.1 four seq_ema_series
    # values landed exactly on a .5e-6 boundary and the engines split
    # (r10; the portable module's founding case)
    return grouped.select(key, trunc_dp(ema, 6).alias(out_col))


def ema_series_per_key(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
    alpha: float = 0.7,
    out_col: str = "ema",
) -> DataFrame:
    """Per-EVENT exponential moving average: every row gets its
    smoothed value s_i = alpha*s_{i-1} + (1-alpha)*x_i (s_0 = x_0) —
    the full feature series :func:`ema_per_key` truncates to.

    Implemented as ONE incremental in-array fold that appends each
    step's state (array_append accumulator), then exploded back to
    rows — the same single shuffle as ema_per_key. The closed-form
    prefix trick (s_i = a^i * prefix_sum(x_j * a^-j * b)) was
    evaluated and REJECTED: a^-j overflows/loses all precision beyond
    ~20 steps (a=0.7 ⇒ a^-150 ≈ 1e23, so the renormalizing multiply
    cancels 23 digits), while the fold is numerically exact-as-spec.

    Engine parity: prefix i of the fold performs the identical
    multiply-add sequence as DuckDB's no-init list_reduce over the
    first i values, so the series is engine-identical, not just
    tolerance-close. Per-key cost is O(n) multiply-adds but O(n^2)
    bytes of array copies (append reallocates); histories are bounded
    by per-key event counts — slice upstream for unbounded keys, as
    with ema_per_key."""
    packed = F.struct(
        F.col(ts_col), F.col(tiebreak), F.col(value_col).cast("double").alias("__v")
    )
    grouped = df.groupBy(key).agg(
        F.array_sort(F.collect_list(packed)).alias("__evs")
    )
    vals = F.transform(F.col("__evs"), lambda s: s.getField("__v"))
    a, b = float(alpha), float(1.0 - alpha)
    series = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.array(F.get(vals, 0)),
        lambda acc, x: F.array_append(
            acc, F.element_at(acc, -1) * F.lit(a) + x * F.lit(b)
        ),
    )
    z = grouped.select(
        key, F.explode(F.arrays_zip(F.col("__evs"), series.alias("__s"))).alias("__z")
    )
    return z.select(
        key,
        F.col("__z.__evs").getField(ts_col).alias(ts_col),
        F.col("__z.__evs").getField(tiebreak).alias(tiebreak),
        # trunc_dp, not round — see ema_per_key (round-tie divergence
        # found at sf0.1 in this exact series)
        trunc_dp(F.col("__z.__s"), 6).alias(out_col),
    )


def context_examples(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
    k: int,
    ctx_col: str = "context",
    label_col: str = "label",
) -> DataFrame:
    """Sliding-window (context, label) training examples from each
    key's chronological stream: for every event with at least ``k``
    predecessors, the k previous values in order plus the current
    value as the label — the sequence-model example constructor
    (next-event prediction over clickstreams; swap value_col for
    token columns and it is next-token data).

    One window pass: collect_list over a (ts, tiebreak)-ordered
    ROWS BETWEEN k PRECEDING AND 1 PRECEDING frame — the list order
    follows the frame's total order, so examples are deterministic
    under any partitioning. Rows with a short history are dropped
    (size == k filter), matching what a trainer can batch."""
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, tiebreak)
        .rowsBetween(-k, -1)
    )
    out = df.withColumn(ctx_col, F.collect_list(F.col(value_col)).over(w))
    return out.filter(F.size(ctx_col) == k).select(
        key, ts_col, tiebreak, ctx_col, F.col(value_col).alias(label_col)
    )


def activity_streaks(
    df: DataFrame, key: str, ts_col: str, out_prefix: str = ""
) -> DataFrame:
    """Longest consecutive-active-day streak per key — the classic
    gaps-and-islands shape (engagement/retention QA over an event
    log; also the dominant interview form of sequence analysis, so an
    engine parity target).

    Islands via the day - row_number() trick: distinct active days
    per key, ranked chronologically; consecutive days share the
    (day - rank) group constant. Two hash aggregations plus ONE
    bounded window, all partitioned by the key — the distinct-day
    set per key is calendar-bounded (years, not events), so the
    window never sees event-scale partitions. Day numbers are integer
    days since 1970-01-01 computed from the DATE cast, identical in
    any engine/timezone-free fixture.
    """
    days = df.select(
        F.col(key),
        F.datediff(F.col(ts_col).cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "__d"
        ),
    ).distinct()
    w = Window.partitionBy(key).orderBy("__d")
    runs = (
        days.withColumn("__grp", F.col("__d") - F.row_number().over(w))
        .groupBy(key, "__grp")
        .agg(F.count("*").alias("__len"))
    )
    return runs.groupBy(key).agg(
        F.max("__len").cast("bigint").alias(f"{out_prefix}longest_streak"),
        F.sum("__len").cast("bigint").alias(f"{out_prefix}n_active_days"),
    )


def top_paths(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
    k: int = 20,
    max_len: int = 8,
) -> DataFrame:
    """(path, n_steps, n_users): the k most common event journeys —
    each key's chronological event sequence truncated to ``max_len``
    steps, serialized ``a>b>c``, counted across keys. The "top user
    paths" product-analytics staple.

    Determinism: sequences sort inside the array over (ts, tiebreak)
    structs (partitioning-independent, same contract as
    :func:`event_sequences`); the cut is (count desc, path) so ties
    break textually. Truncation bounds the path keyspace — untruncated
    paths are near-unique and the count degenerates.

    Scale shape: one shuffle on the key to build sequences, one
    map-side-combinable hash agg on the (bounded) path string, and a
    TakeOrdered cut — no global sort."""
    seqs = event_sequences(df, key, ts_col, value_col, tiebreak)
    paths = seqs.select(
        F.array_join(F.slice(F.col("seq"), 1, max_len), ">").alias("path"),
        F.least(F.size("seq"), F.lit(max_len)).cast("int").alias("n_steps"),
    )
    return (
        paths.groupBy("path", "n_steps")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path"))
        .limit(k)
    )


def holt_linear_state(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """(key, n, level, trend, forecast_1): Holt's linear (double
    exponential) smoothing final state per key — level + trend with a
    one-step-ahead forecast, the next rung above seq_ema for drifting
    metrics. Keys need >= 2 observations (level seeds from x0, trend
    from x1 - x0; the fold consumes x2..).

    Cross-engine parity (the seq_ema fold trick, extended to STRUCT
    state): the recursion runs inside one in-array ``aggregate`` fold
    in (ts, tiebreak) order with textually identical double
    arithmetic on both engines — sequential evaluation order is part
    of the contract, so results match bit-for-bit (DuckDB twin:
    list_reduce seeded by list_prepend; state encoded as a 2-list
    there because DuckDB struct accumulators alias in place).

    Scale shape: one shuffle to build per-key ordered arrays; the
    fold is narrow. Keys with pathologically long histories should be
    length-capped upstream, as with event_sequences."""
    seqs = event_sequences(df, key, ts_col, value_col, tiebreak, out_col="__arr")
    arr = F.col("__arr")
    a, b1 = F.lit(float(alpha)), F.lit(float(beta))
    seed = F.struct(
        F.get(arr, 0).cast("double").alias("l"),
        (F.get(arr, 1) - F.get(arr, 0)).cast("double").alias("b"),
    )
    tail = F.slice(arr, 3, F.greatest(F.size(arr) - 2, F.lit(0)))

    def step(acc, x):
        new_l = a * x + (F.lit(1.0) - a) * (acc.getField("l") + acc.getField("b"))
        new_b = b1 * (new_l - acc.getField("l")) + (F.lit(1.0) - b1) * acc.getField(
            "b"
        )
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    st = F.aggregate(tail, seed, step)
    return (
        seqs.where(F.size(arr) >= 2)
        .select(
            F.col(key),
            F.size(arr).cast("long").alias("n"),
            trunc_dp(st.getField("l"), 6).alias("level"),
            trunc_dp(st.getField("b"), 6).alias("trend"),
            trunc_dp(st.getField("l") + st.getField("b"), 6).alias("forecast_1"),
        )
    )


def pattern_match_negation(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    start: str,
    goal: str,
    blocker: str,
    horizon_s: int = 3600,
    order_col: str | None = None,
) -> DataFrame:
    """MATCH_RECOGNIZE-style negative pattern: per user, count START
    events that reach a GOAL within horizon_s seconds with NO BLOCKER
    strictly between — the CEP shape (A then B within T, no C
    between) that naive implementations write as a triple self-join.

    One ordered window pass instead: every event looks up the next
    GOAL ts and next BLOCKER ts among its FOLLOWING rows (conditional
    min over an unbounded-following frame); a START matches iff
    next_goal <= ts + horizon AND (no next_blocker OR next_blocker >=
    next_goal — a blocker at or after the goal is outside the
    pattern). No join, no per-pattern fan-out; cost = one user-keyed
    sort, same as any sessionization.

    Returns (user, n_start, n_matched)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), *([F.col(order_col)] if order_col else []))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    next_goal = F.min(
        F.when(F.col(type_col) == goal, F.col(ts_col))
    ).over(w)
    next_block = F.min(
        F.when(F.col(type_col) == blocker, F.col(ts_col))
    ).over(w)
    flagged = events.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"),
        next_goal.alias("__ng"),
        next_block.alias("__nb"),
    ).filter(F.col("__t") == start)
    matched = (
        F.col("__ng").isNotNull()
        & (
            F.col("__ng").cast("long")
            <= F.col("__ts").cast("long") + horizon_s
        )
        & (F.col("__nb").isNull() | (F.col("__nb") >= F.col("__ng")))
    )
    return flagged.groupBy("user").agg(
        F.count("*").cast("bigint").alias("n_start"),
        F.sum(matched.cast("int")).cast("bigint").alias("n_matched"),
    )
