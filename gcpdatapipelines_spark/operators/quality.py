"""Data-quality expectations: declarative checks evaluated in ONE scan.

The ingest gate a production loader runs before publishing a load
(the reference pipelines assume clean input — csv_to_bq.py:14-20;
read_csv_with_rejects quarantines unparseable rows, this validates the
rows that DID parse): null rates, uniqueness, value ranges, set
membership, referential integrity.

Scale shape: every row-local rule compiles to a conditional-sum over
one shared scan (a single partial+final aggregate regardless of rule
count); uniqueness adds one count(DISTINCT key); referential checks
add one anti-join probe per referenced dimension (broadcast when the
dimension is small). Output is one (rule, n_violations, passed) row
per rule — the artifact a pipeline asserts on before writing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return (f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    return (
        f"in_range({col},{lo},{hi})",
        F.col(col).isNull() | (F.col(col) < lo) | (F.col(col) > hi),
    )


def in_set(col: str, allowed: list) -> tuple[str, Column]:
    return (f"in_set({col})", ~F.col(col).isin(allowed) | F.col(col).isNull())


def matches(col: str, pattern: str) -> tuple[str, Column]:
    """Violation when the column does NOT fully match the regex (RE2 ∩
    Java subset for oracle parity)."""
    return (f"matches({col})", ~F.col(col).rlike(pattern) | F.col(col).isNull())


def quality_checks(
    df: DataFrame,
    row_rules: list[tuple[str, Column]] | None = None,
    unique: list[str] | None = None,
    references: dict[str, tuple[DataFrame, str]] | None = None,
) -> DataFrame:
    """Evaluate rules and emit (rule, n_violations, passed) per rule.

    ``row_rules``: (name, violation_predicate) pairs — one shared
    aggregate pass. ``unique``: columns that must be row-unique
    (violations = n_rows - n_distinct, NULLs count as violations).
    ``references``: name -> (dim_df, dim_key): child rows whose value
    misses the dimension (anti-join count; NULL child keys violate)."""
    frames = []
    aggs = []
    names = []
    for name, viol in row_rules or []:
        aggs.append(F.sum(F.when(viol, 1).otherwise(0)).alias(name))
        names.append(name)
    for col in unique or []:
        aggs.append(
            (F.count("*") - F.count_distinct(F.col(col))).alias(f"unique({col})")
        )
        names.append(f"unique({col})")
    if aggs:
        wide = df.agg(*aggs)
        parts = ", ".join(f"'{n}', `{n}`" for n in names)
        frames.append(
            wide.selectExpr(f"stack({len(names)}, {parts}) AS (rule, n_violations)")
        )
    for col, (dim, dim_key) in (references or {}).items():
        missing = df.select(F.col(col)).join(
            F.broadcast(dim.select(F.col(dim_key).alias(col)).distinct()),
            col,
            "left_anti",
        )
        frames.append(
            missing.agg(F.count("*").alias("n_violations")).select(
                F.lit(f"references({col})").alias("rule"), "n_violations"
            )
        )
    if not frames:
        raise ValueError("no rules given")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.withColumn("passed", F.col("n_violations") == 0)
