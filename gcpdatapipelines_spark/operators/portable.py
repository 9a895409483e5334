"""Hash-portable float finishing for oracle-checked outputs.

The correctness gate compares Spark and DuckDB values bit-for-bit, on
whatever engine BUILDS the driver happens to run. Two facts shape the
idiom here:

1. The IEEE-754 core ops (+ - * / sqrt, and casts from exact decimals)
   are *correctly rounded*: given identical inputs and the same
   expression tree, every engine produces identical bits. A final
   statistic built only from those ops is bit-portable as-is.
2. Decimal-place ROUNDING of a double is NOT uniquely implemented:
   Spark rounds the exact BigDecimal value HALF_UP, other engines
   scale-multiply and nearbyint (and have changed algorithms across
   versions). When ``x * 10^k`` lands on (or one ulp from) a ``.5``
   boundary, the same bits round differently per build — the exact
   failure observed on ``a16_trend_per_user`` in round 4: local
   bit-exact green, driver hash-red.

``floor`` has no such freedom: on a given double it is uniquely
defined, every build agrees. So the portable way to fix a display
scale is *truncation through one correctly-rounded multiply*::

    trunc_dp(x, 6)  ==  floor(x * 1e6) / 1e6      (both ops exact-same
                                                   bits on any engine)

with the identical text in the DuckDB oracle:
``floor((x) * 1000000.0) / 1000000.0``. This dominates ``round(x, k)``:
with identical input bits it can never disagree across builds; with
noisy input bits (libm ``ln``/``exp`` chains) both idioms share the
same small boundary-straddle probability, so switching never loses.

Scales 10^k for k ≤ 15 and the intermediate products stay far inside
the double's exact-integer range for statistic-sized values, so no
precision is lost in the multiply/divide pair beyond the intended
truncation.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def trunc_dp(col, k: int) -> "F.Column":
    """``floor(col * 10^k) / 10^k`` as a DOUBLE — the bit-portable
    stand-in for ``round(col, k)`` on engine-identical double chains
    (module docstring). Truncates toward −∞; NaN/±inf pass through
    EXPLICITLY: Spark's ``floor(DOUBLE)`` returns BIGINT, so without
    the guard NaN would silently become 0 and ±inf would saturate to
    ±Long.MAX — a finite wrong value — while DuckDB's double ``floor``
    preserves them (round-5 ADVICE). Accepts a Column or a column-name
    string (like ``F.round``)."""
    if isinstance(col, str):
        col = F.col(col)
    scale = F.lit(float(10**k))
    non_finite = F.isnan(col) | (F.abs(col) == F.lit(float("inf")))
    return F.when(non_finite, col).otherwise(F.floor(col * scale) / scale)


def trunc_dp_sql(expr: str, k: int) -> str:
    """The oracle-side twin of :func:`trunc_dp`: same CASE guard so
    both engines pass NaN/±inf through unchanged. The ``+ 0.0`` on the
    finite branch normalizes −0.0 to +0.0, matching Spark's
    BIGINT-``floor`` path (which can never emit −0.0); it is a no-op
    for every other value."""
    scale = float(10**k)
    return (
        f"CASE WHEN isnan(({expr})) OR isinf(({expr})) THEN ({expr}) "
        f"ELSE floor(({expr}) * {scale!r}) / {scale!r} + 0.0 END"
    )
