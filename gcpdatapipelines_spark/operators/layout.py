"""Engine-portable Z-order (Morton) interleave math.

Companion to the production writer ``io.write_zorder_clustered``
(quantile-binned Morton clustering — the OPTIMIZE ZORDER maintenance
step; file-skipping asserted from real footers in
tests/test_scale_ops.py). That writer rank-quantizes with
approxQuantile, whose boundaries are engine-specific — correct for
layout, impossible to oracle-check. This module carries the OTHER
half: the raw interleave over caller-supplied bucket codes as a pure
integer expression chain (shifts, masks, ors) in ONE SQL string —
whole-stage-codegen'd, identical arithmetic on any ANSI engine, so
the catalog query `layout_zorder` proves the Morton math bit-for-bit
against DuckDB. Use explicit buckets (mod, datediff) when
reproducibility across engines/runs matters more than equal-population
cells; use io.zorder_column's quantile codes when balance under skew
matters more.
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
