"""Compliance operators: subject-deletion (right-to-be-forgotten)
propagation across a multi-table warehouse.

A deletion request names subjects, not rows; every table keyed by the
subject must drop them in one coordinated sweep. No reference analogue
(the reference only ever appends); this is the operator a production
deployment of such ingest pipelines is eventually required to have.

Scale shape: the delete set is tiny relative to any fact table, so it
broadcasts; each table is then ONE narrow anti-join probe — no
shuffle of the fact side, no full rewrite logic here (pair with
io.write_overwrite / compact_parquet for the physical rewrite, or
with merge-on-read deletion vectors in a table format that has them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def propagate_deletes(
    tables: dict[str, DataFrame],
    subject_ids: DataFrame,
    key_cols: dict[str, str],
) -> dict[str, DataFrame]:
    """Drop every row whose subject key appears in ``subject_ids`` (a
    one-column frame) from each table; ``key_cols`` maps table name ->
    that table's subject-key column. Returns the retained frames.
    The id set is deduped once and broadcast to every probe."""
    (id_col,) = subject_ids.columns
    ids = F.broadcast(subject_ids.distinct())
    out = {}
    for name, df in tables.items():
        k = key_cols[name]
        out[name] = df.join(ids, df[k] == ids[id_col], "left_anti")
    return out


def deletion_audit(retained: dict[str, DataFrame]) -> DataFrame:
    """One (table_name, n_rows) row per table — the audit artifact a
    deletion request closes with."""
    frames = [
        df.agg(F.count("*").alias("n_rows")).select(
            F.lit(name).alias("table_name"), "n_rows"
        )
        for name, df in sorted(retained.items())
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def k_anonymity_audit(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """(qi..., group_size, violates): group sizes over a
    quasi-identifier combination with a flag for groups smaller than
    ``k`` — the k-anonymity re-identification audit run before any
    dataset release (a QI group of 1-2 rows singles a person out even
    with direct identifiers removed).

    One map-side-combinable hash aggregate on the QI tuple; output is
    bounded by the number of distinct QI combinations. Pure counts —
    parity is exact by construction."""
    return df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count("*").alias("group_size")
    ).withColumn("violates", F.col("group_size") < F.lit(k))


def l_diversity_audit(
    df: DataFrame,
    qi_cols: list[str],
    sensitive,
    l: int = 3,
) -> DataFrame:
    """(qi..., group_size, n_sensitive, violates): distinct-sensitive-
    value counts per quasi-identifier group (Machanavajjhala et al.
    2007). k-anonymity alone leaks when a QI group is homogeneous in
    the sensitive attribute — every member is outed even though no row
    is individually identifiable; l-diversity requires >= ``l``
    distinct sensitive values per group.

    One hash aggregate on the QI tuple; the exact distinct count costs
    an Expand (double the map output) — at very wide scale swap in
    approx_count_distinct, mirroring profile's approx mode. Output is
    bounded by distinct QI combinations."""
    return (
        df.groupBy(*[F.col(c) for c in qi_cols])
        .agg(
            F.count("*").alias("group_size"),
            F.count_distinct(sensitive).alias("n_sensitive"),
        )
        .withColumn("violates", F.col("n_sensitive") < F.lit(l))
    )
