"""Dynamic pivot/transpose — the reference's flagship composite
(SURVEY.md §2.7; reference data_transpose_working_1.py / _2.py and the
two exploration notebooks).

The reference builds this from six Beam stages: extract pivot values,
GroupByKey+distinct, fold a dynamic schema, concat composite keys,
GroupByKey, merge per-group dicts wide, then writes with the schema as
a side input. In Spark the whole chain is
``groupBy(keys).pivot(col).agg(...)`` — pass 1 computes the distinct
pivot values, pass 2 folds wide, and the schema flows with the frame.

Scale note: ``pivot`` with explicit ``values=`` skips the distinct
pass entirely (one job instead of two); when values are unknown the
distinct pass is a cheap partial-agg shuffle on one column. The wide
fold itself is a single hash aggregate — no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGGS = {
    "first": lambda c: F.first(c, ignorenulls=False),
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
    "avg": F.avg,
    "count": F.count,
}


def transpose(
    df: DataFrame,
    key_fields: list[str],
    pivot_fields: list[str],
    value_fields: list[str],
    agg: str = "first",
    pivot_values: list[str] | None = None,
) -> DataFrame:
    """Pivot rows wide with exact reference naming parity.

    Output columns: key_fields + ``{pivotValue}_{valueField}`` for each
    distinct pivot value x value field, matching the reference's
    dynamic-schema field naming f"{piv}_{val}"
    (data_transpose_working_1.py:98-106,121).

    - Multi-pivot-field: values are pre-concatenated with '_' into one
      pivot column, as anticipated by the reference CLI
      (--pivotFields=class,on_sale,state,
      data_transpose_working_1.py:150-152).
    - Duplicate (key, pivot) pairs: the reference's dict-merge keeps an
      arbitrary value (CreateTableRow, data_transpose_working_1.py:
      125-131); ``agg="first"`` preserves that arbitrary-pick contract,
      and deterministic folds (sum/max/min/avg/count) are explicit
      options — the idiomatic upgrade SURVEY.md §2.7 documents.
    - ``pivot_values``: pass when known to skip the distinct-values job.
    """
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}, got {agg!r}")
    agg_fn = _AGGS[agg]

    if len(pivot_fields) == 1:
        pivot_col = pivot_fields[0]
        work = df
    else:
        pivot_col = "__pivot__"
        work = df.withColumn(
            pivot_col, F.concat_ws("_", *[F.col(c).cast("string") for c in pivot_fields])
        )

    grouped = work.groupBy(*key_fields)
    pivoted = (
        grouped.pivot(pivot_col, pivot_values)
        if pivot_values is not None
        else grouped.pivot(pivot_col)
    )

    if len(value_fields) == 1:
        wide = pivoted.agg(agg_fn(value_fields[0]))
        # single-agg pivot names columns just "{pivotValue}"
        renames = {
            c: f"{c}_{value_fields[0]}" for c in wide.columns if c not in key_fields
        }
    else:
        wide = pivoted.agg(*[agg_fn(v).alias(v) for v in value_fields])
        # multi-agg pivot names columns "{pivotValue}_{alias}" already
        renames = {}

    for old, new in renames.items():
        wide = wide.withColumnRenamed(old, new)
    return wide


def transpose_conditional(
    df: DataFrame,
    key_fields: list[str],
    pivot_field: str,
    value_field: str,
    pivot_values: list[str],
    agg: str = "sum",
) -> DataFrame:
    """Streaming-safe pivot: one conditional aggregation instead of
    ``groupBy().pivot()``.

    Spark's pivot compiles to TWO aggregate levels (per-(key,pivot)
    partial then PivotFirst), which Structured Streaming's
    global-watermark correctness check rejects as chained stateful
    operators. This form folds each pivot value as
    ``agg(CASE WHEN pivot = v THEN value END)`` inside a single
    aggregate — legal on watermarked streams, identical output columns
    ``{pivotValue}_{valueField}``, and exactly the conditional-
    aggregation shape of the DuckDB oracle (transpose_oracle_sql).
    Requires explicit pivot_values (a stream cannot run the
    distinct-discovery pass by definition)."""
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}, got {agg!r}")
    agg_fn = _AGGS[agg]
    exprs = [
        agg_fn(
            F.when(F.col(pivot_field) == v, F.col(value_field))
        ).alias(f"{v}_{value_field}")
        for v in pivot_values
    ]
    return df.groupBy(*key_fields).agg(*exprs)


def transpose_oracle_sql(
    table: str,
    key_fields: list[str],
    pivot_field: str,
    value_field: str,
    pivot_values: list[str],
    agg: str = "sum",
    where: str | None = None,
) -> str:
    """ANSI-SQL equivalent via conditional aggregation (the DuckDB
    oracle for the pivot — SURVEY.md §5.2 item 1)."""
    keys = ", ".join(key_fields)
    cols = ", ".join(
        f"{agg}(CASE WHEN {pivot_field} = '{v}' THEN {value_field} END)"
        f' AS "{v}_{value_field}"'
        for v in pivot_values
    )
    sql = f"SELECT {keys}, {cols} FROM {table}"
    if where:
        sql += f" WHERE {where}"
    sql += f" GROUP BY {keys}"
    return sql
