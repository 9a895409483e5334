"""Data-layout optimization: Z-order (Morton) clustering keys.

The lakehouse maintenance step (Delta ``OPTIMIZE ZORDER BY``, Iceberg
``rewrite_data_files`` with a z-order strategy) that neither the
reference nor plain Spark exposes: interleave the bits of several
bounded dimension keys into one Morton code, then range-partition and
sort files by it, so min/max footer stats prune file scans for
predicates on ANY of the interleaved dimensions — not just the first
sort key. At 100 TB this is the difference between a point query
reading one file and reading every file.

Everything here is a pure integer expression chain (shifts, masks,
ors) built as ONE SQL string per column — whole-stage-codegen'd,
engine-portable (the identical arithmetic runs on any ANSI engine),
and exactly reproducible, which is what lets the catalog query be
oracle-checked bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The Morton interleave of ``cols`` (each already reduced to a
    non-negative < 2**bits integer) as a SQL expression string:
    bit j of column i lands at position j*len(cols)+i. With two
    16-bit dimensions the code fits comfortably in a BIGINT."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits overflows a signed 64-bit code")
    terms = [
        f"(((({c} >> {j}) & 1)) << {j * n + i})"
        for i, c in enumerate(cols)
        for j in range(bits)
    ]
    return " | ".join(terms)


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "z",
) -> DataFrame:
    """Append the Morton code of ``cols`` (pre-bucketed ints in
    [0, 2**bits)). Callers bucket raw values first — e.g.
    ``pmod(hash(k), 2**bits)`` for high-cardinality keys or
    ``datediff(d, origin)`` for dates — because z-order locality only
    means anything over bounded, comparable bucket spaces."""
    return df.selectExpr("*", f"({zorder_sql(cols, bits)}) AS {out_col}")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files range-partitioned
    AND sorted by the Morton code of ``cols`` — the OPTIMIZE ZORDER
    shape: each output file owns a contiguous z-range, so its footer
    min/max on every interleaved dimension is tight and a reader
    prunes files for predicates on any of them. One range-exchange
    (sampled boundaries) + per-partition sort; the z column is dropped
    from the stored schema (it is derivable, not data)."""
    keyed = with_zorder_key(df, cols, bits, "__z")
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
