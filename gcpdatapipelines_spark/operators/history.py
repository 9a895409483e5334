"""Temporal-table operators: keep-latest dedup, SCD Type-2 interval
construction, and snapshot diffing.

No direct reference analogue (the reference's pipelines are
append-only ingests, csv_to_bq.py:38-49); these are the warehouse-side
operators a user of such ingest pipelines ends up needing the moment a
source starts re-sending rows: collapse re-sends to the latest version
(CDC compaction), keep full change history with validity intervals
(SCD2), and audit what changed between two loads (diff).

Scale shapes:
- ``keep_latest``: ONE shuffle on the key, per-partition sort, no
  global sort; this is the canonical row_number()=1 compaction that
  AQE handles well even on skewed keys.
- ``scd2_intervals``: same single shuffle; both window passes (change
  detection + validity lookahead) share one partitioning/sort, so
  Catalyst plans exactly one exchange.
- ``snapshot_diff``: one shuffle join on the key (broadcast if a side
  is small); row payloads are compared column-wise, never hashed on
  the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keep_latest(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak: str,
) -> DataFrame:
    """Latest row per key: row_number over (keys, order desc, tiebreak
    desc) filtered to 1. ``tiebreak`` must be unique per (key,
    order_col) pair for a deterministic, engine-stable answer."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), F.col(tiebreak).desc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_intervals(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    attr_cols: list[str],
    collapse: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension type 2: turn an event/update log into
    versioned rows with ``valid_from``/``valid_to`` intervals and an
    ``is_current`` flag.

    With ``collapse=True`` consecutive updates carrying identical
    ``attr_cols`` merge into one interval (the standard SCD2 contract:
    a new version begins only when an attribute actually changes).
    ``ts_col`` ties are broken by taking rows in (ts) order only —
    callers with same-timestamp updates should pre-dedup with
    :func:`keep_latest` on (keys, ts).

    Both windows order by ``ts_col`` within the same key partitioning,
    so the plan carries ONE exchange + one sort."""
    w = Window.partitionBy(*keys).orderBy(ts_col)
    out = df.select(*keys, ts_col, *attr_cols)
    if collapse:
        changed = [
            ~F.lag(F.col(c)).over(w).eqNullSafe(F.col(c)) for c in attr_cols
        ]
        cond = changed[0]
        for c in changed[1:]:
            cond = cond | c
        # A key's first row is ALWAYS a version start: lag() is NULL
        # there, so when the leading attrs are also NULL eqNullSafe is
        # true and `cond` alone would drop the opening interval (or the
        # whole key when every row is NULL). Same window → still one
        # exchange + one sort.
        cond = (F.row_number().over(w) == 1) | cond
        out = out.withColumn("__chg", cond).filter(F.col("__chg")).drop("__chg")
    out = out.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lead(F.col(ts_col)).over(w)
    )
    return out.withColumn("is_current", F.col("valid_to").isNull()).drop(ts_col)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Audit diff between two loads of the same table: emits one row
    per key that was ``added`` (only in new), ``removed`` (only in
    old), or ``changed`` (in both, any compare column differing —
    NULL-safe). Unchanged keys are dropped. Output: keys +
    ``change_type``.

    Presence is detected via explicit marker columns, not key
    nullability, so legitimately-NULL keys are never misclassified
    (same contract as merge.py's partial-update path)."""
    o = old.select(
        *keys, *compare_cols, F.lit(True).alias("__o_present")
    )
    n = new.select(
        *[F.col(c).alias(f"__n_{c}") for c in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__n_present"),
    )
    cond = [o[k].eqNullSafe(n[f"__n_{k}"]) for k in keys]
    j = o.join(n, cond, "full_outer")
    # keys-only audit (compare_cols=[]): nothing can ever differ, so
    # `same` is vacuously true and only added/removed rows are emitted.
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(F.col("__o_present").isNull(), F.lit("added"))
        .when(F.col("__n_present").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    out_keys = [
        F.coalesce(F.col(k), F.col(f"__n_{k}")).alias(k) for k in keys
    ]
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*out_keys, "change_type")
    )
