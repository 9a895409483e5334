"""Physical-plan introspection: the engine's scale contract, made
testable.

The whole point of expressing operators declaratively (SURVEY.md §4) is
that Catalyst delivers pushdown, pruning, broadcast selection, and
partial aggregation. These helpers read the formatted physical plan so
tests can FAIL when a query stops getting them — plan regressions are
correctness bugs for the 100 TB target even when row-level results
still match.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries — what each scan actually reads (column
    pruning check: a 2-column projection must not read 16 columns)."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", plan)]


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Column-name sets per scan, parsed from ReadSchema."""
    cols = []
    for schema in read_schemas(df):
        inner = schema[schema.index("<") + 1 : schema.rindex(">")] if "<" in schema else ""
        names = {f.split(":")[0] for f in re.split(r",(?![^<]*>)", inner) if f}
        cols.append(names)
    return cols


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in the physical plan (BroadcastHashJoin,
    SortMergeJoin, ShuffledHashJoin, BroadcastNestedLoopJoin...)."""
    plan = formatted_plan(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def num_exchanges(df: DataFrame) -> int:
    """Shuffle-exchange count — every one is a full network/disk pass
    over its input at scale; the minimum for the plan shape is the
    budget, anything above it is a regression. Counts numbered plan
    nodes ('(N) Exchange') so the tree/details duplication in formatted
    output isn't double-counted."""
    return len(set(re.findall(r"\((\d+)\) Exchange", formatted_plan(df))))


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when hash aggregation is split partial/final (map-side
    combine before the shuffle — Beam combiner-lifting's analogue)."""
    plan = formatted_plan(df)
    return "partial_" in plan or "Partial" in plan


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans — wider/fewer is better.

    Executes the frame (collect on THIS plan instance): under AQE the
    final physical plan, where codegen stages are visible, only exists
    after its own execution."""
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return len(set(re.findall(r"\*\((\d+)\)", executed)))
