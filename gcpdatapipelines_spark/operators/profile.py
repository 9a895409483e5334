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
