"""Z-order layout: Morton-code semantics of the engine-portable
interleave (the production quantile-binned writer io.write_zorder_clustered
is covered by tests/test_scale_ops.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcpdatapipelines_spark.operators.layout import with_zorder_key, zorder_sql


def _morton2(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for j in range(bits):
        z |= ((x >> j) & 1) << (2 * j)
        z |= ((y >> j) & 1) << (2 * j + 1)
    return z


def test_zorder_matches_reference_interleave(spark):
    rows = [(x, y) for x in [0, 1, 2, 3, 255, 65535] for y in [0, 1, 128, 65535]]
    df = spark.createDataFrame(rows, "x BIGINT, y BIGINT")
    got = {(r.x, r.y): r.z for r in with_zorder_key(df, ["x", "y"]).collect()}
    for (x, y), z in got.items():
        assert z == _morton2(x, y), (x, y)


def test_zorder_locality_property(spark):
    # close points in (x, y) get close z codes: the 2x2 block [0..1]^2
    # occupies z 0..3, the next block z 4..7, etc.
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x BIGINT, y BIGINT"
    )
    got = {(r.x, r.y): r.z for r in with_zorder_key(df, ["x", "y"]).collect()}
    assert {got[(x, y)] for x in (0, 1) for y in (0, 1)} == {0, 1, 2, 3}
    assert {got[(x, y)] for x in (2, 3) for y in (0, 1)} == {4, 5, 6, 7}


def test_zorder_sql_overflow_guard():
    import pytest

    with pytest.raises(ValueError):
        zorder_sql(["a", "b", "c", "d"], bits=16)  # 64 > 62 bits
