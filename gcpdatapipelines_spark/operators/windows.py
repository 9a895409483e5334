"""Window functions, sort/limit/top-k, and batch event-time windows
(SURVEY.md §2.8).

The reference has none of these (no orderBy/limit/rank anywhere); they
are part of the general-engine surface the new engine exposes. The
driver's ``events`` fixture motivates the event-time forms.

Scale notes: ranking windows shuffle once on the partition key and
sort within partitions only (no global sort); top-k is expressed as
orderBy+limit, which Spark executes as per-partition TakeOrdered + a
driver-side merge of k·P rows — never a full global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_per_key(
    df: DataFrame,
    partition_by: list[str],
    order_by: list,
    alias: str = "rnk",
    method: str = "row_number",
) -> DataFrame:
    """rank/dense_rank/row_number over partitionBy().orderBy()."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    fn = {"rank": F.rank, "dense_rank": F.dense_rank, "row_number": F.row_number}[method]
    return df.withColumn(alias, fn().over(w))


def top_n_per_key(
    df: DataFrame, partition_by: list[str], order_by: list, n: int
) -> DataFrame:
    """Top-n rows per group via row_number filter (deterministic when
    order_by includes a unique tiebreak column)."""
    return rank_per_key(df, partition_by, order_by, "__rn", "row_number").filter(
        F.col("__rn") <= n
    ).drop("__rn")


def top_k(df: DataFrame, order_by: list, k: int) -> DataFrame:
    """Global top-k: TakeOrdered physical plan, not a full sort."""
    return df.orderBy(*order_by).limit(k)


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list,
    window_alias: str = "window_start",
) -> DataFrame:
    """Batch tumbling event-time window: group by window(ts, duration)
    [+ keys] and aggregate. Emits the window *start* as a plain
    timestamp column so results are oracle-comparable
    (date_trunc-compatible for hour/day durations)."""
    win = F.window(F.col(ts_col), duration)
    out = df.groupBy(win, *keys).agg(*aggs)
    return out.withColumn(window_alias, F.col("window.start")).drop("window").select(
        window_alias, *keys, *[c for c in out.columns if c not in ("window", *keys)]
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: list,
    window_alias: str = "window_start",
) -> DataFrame:
    """Batch sliding event-time window: window(ts, duration, slide)
    assigns each row to its duration/slide overlapping windows (an
    internal explode — duration/slide copies per row, the inherent
    cost of overlap), then one partial+final aggregate per (window
    [, keys]). Completes the windowing family next to tumbling
    (tumbling_window_agg) and session (streaming.sessionize) — the
    trailing-window rates/moving volumes shape. Emits the window start
    as a plain timestamp for oracle comparability."""
    win = F.window(F.col(ts_col), duration, slide)
    out = df.groupBy(win, *keys).agg(*aggs)
    return out.withColumn(window_alias, F.col("window.start")).drop("window").select(
        window_alias, *keys, *[c for c in out.columns if c not in ("window", *keys)]
    )
