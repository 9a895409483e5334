"""Upsert / MERGE expressed as Spark-native join rewrites (NOTES.md
backlog #5; no reference analogue — the reference truncates-and-reloads
(BQ WRITE_TRUNCATE, csv_to_bq_NYC.py) because Beam has no MERGE either;
this is the idiomatic upgrade a warehouse user expects).

Two rewrites, chosen by what the changeset looks like:

- **Full-row upsert** (``update_cols=None``): the classic
  ``MERGE .. WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
  INSERT *`` compiles to ``source UNION ALL (target ANTI JOIN
  source)``. The anti join is broadcastable — for the common shape
  (100 TB target, small daily changeset) the target NEVER shuffles:
  one broadcast-hash-anti pass over the fact plus a union, zero
  exchanges (pinned in tests/test_plans.py).

- **Partial-column update** (``update_cols=[...]``): matched rows take
  the source's values for ``update_cols`` only; a full outer join plus
  per-column resolution. Shuffles both sides on the key — use only
  when the source genuinely carries partial rows.

Both are deterministic and idempotent (merging the same source twice
is a no-op), which is what makes them safe to re-run after a pipeline
retry — the batch analogue of streaming.incremental_pipeline's
exactly-once contract.

Scale note: these rewrites recompute the merged table; on a real
100 TB lake you'd pair them with a partitioned layout
(io.write_partitioned) and dynamic partition overwrite
(spark.sql.sources.partitionOverwriteMode=dynamic) so only partitions
containing changed keys are rewritten. The rewrite itself is
unchanged — only the sink scope shrinks.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    update_cols: list[str] | None = None,
    broadcast_source: bool = False,
) -> DataFrame:
    """Merge ``source`` into ``target`` by key: matched rows are
    replaced (or column-patched), unmatched source rows are inserted,
    unmatched target rows are kept.

    - ``update_cols=None``: source rows replace matched target rows
      wholesale (source must carry target's full schema).
    - ``update_cols=[...]``: matched rows take source values for those
      columns; NULL in a source update column means "keep target"
      (COALESCE semantics, the portable SQL-MERGE idiom).
    - ``broadcast_source=True``: hint the changeset as the broadcast
      side so the target side is never shuffled (full-row path only —
      a full outer join cannot broadcast-hash).
    """
    missing = [k for k in on if k not in target.columns or k not in source.columns]
    if missing:
        raise ValueError(f"merge keys absent from a side: {missing}")

    if update_cols is None:
        extra = [c for c in target.columns if c not in source.columns]
        if extra:
            raise ValueError(f"full-row upsert needs target's schema in source; missing {extra}")
        src = F.broadcast(source) if broadcast_source else source
        kept = target.join(src, on, "left_anti")
        return kept.unionByName(source.select(*target.columns))

    # explicit presence markers, NOT key-NULL tests: a row whose merge
    # key is legitimately NULL must still be classified as present on
    # its own side (key-NULL rows never match the equi-condition, so
    # they flow through the outer join unpaired but intact)
    t = target.withColumn("__t_present", F.lit(True)).alias("__t")
    s = source.withColumn("__s_present", F.lit(True)).alias("__s")
    cond: Column = reduce(
        lambda a, b: a & b, [F.col(f"__t.{k}") == F.col(f"__s.{k}") for k in on]
    )
    joined = t.join(s, cond, "full_outer")
    is_insert = F.col("__t.__t_present").isNull()
    out: list[Column] = []
    for c in target.columns:
        tcol = F.col(f"__t.{c}")
        scol = F.col(f"__s.{c}") if c in source.columns else F.lit(None)
        if c in on or c in update_cols:
            out.append(F.coalesce(scol, tcol).alias(c))
        else:
            out.append(F.when(is_insert, scol).otherwise(tcol).alias(c))
    return joined.select(*out)


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    on: list[str],
    op_col: str = "op",
    order_col: str | None = None,
    tiebreak: str | None = None,
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply a CDC changeset — rows tagged ``'I'``/``'U'``/``'D'`` in
    ``op_col`` — to a target table: I/U rows replace-or-insert by key,
    D rows delete. The third MERGE clause (WHEN MATCHED AND op='D'
    THEN DELETE) that merge_upsert doesn't model.

    With ``order_col`` (+ unique ``tiebreak``) the changeset is first
    compacted to each key's LATEST change, so a full binlog segment
    (insert then update then delete of one key) applies as its net
    effect. Without it the changeset must already be one row per key.

    Plan shape mirrors merge_upsert's scalable path: ALL touched keys
    leave via ONE (broadcastable) anti-join over the target, survivors
    union with the I/U payload — the 100 TB target never shuffles."""
    from .history import keep_latest

    if order_col is not None:
        if tiebreak is None:
            raise ValueError("order_col requires a tiebreak column")
        changes = keep_latest(changes, on, order_col, tiebreak)
    extra = [c for c in (order_col, tiebreak) if c is not None]
    upserts = changes.filter(F.col(op_col) != "D").drop(op_col, *extra)
    touched = changes.select(*on)
    if broadcast_changes:
        touched = F.broadcast(touched)
    untouched = target.join(touched, on, "left_anti")
    return untouched.unionByName(upserts)


def survivorship_golden(
    records: DataFrame,
    key: str,
    priority_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Golden-record survivorship: one row per entity where EACH
    attribute independently takes its first non-null value in source-
    priority order — the MDM merge rule (a trusted CRM wins on name,
    but its null phone falls through to the web profile). Classic
    entity-resolution last mile after fuzzy matching assigns cluster
    keys.

    Determinism: attribute picks are ``first(ignorenulls)`` over a
    (priority, tiebreak)-ordered unbounded frame — same value under
    any partitioning, and COPIES of inputs (no arithmetic), so
    cross-engine parity is exact.

    Scale shape: ONE window pass partitioned by the entity key
    computes every attribute's survivor plus the row_number that
    collapses to one output row — a single shuffle regardless of how
    many source systems or attributes merge."""
    from pyspark.sql import Window

    order = [F.col(priority_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_rn = Window.partitionBy(key).orderBy(*order)
    picked = records.select(
        F.col(key),
        *[F.first(F.col(c), ignorenulls=True).over(w).alias(c) for c in attr_cols],
        F.row_number().over(w_rn).alias("__rn"),
    )
    return picked.filter(F.col("__rn") == 1).drop("__rn")
