"""Z-order layout: Morton-code semantics and the file-pruning payoff
of zorder_write (non-overlapping per-file z ranges, tight min/max on
both interleaved dimensions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcpdatapipelines_spark.operators.layout import (
    with_zorder_key,
    zorder_sql,
    zorder_write,
)


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


def test_zorder_write_partitions_are_disjoint_and_prunable(spark, tmp_path):
    import itertools

    rows = [(i, i % 64, (i * 7) % 64) for i in range(4096)]
    df = spark.createDataFrame(rows, "id BIGINT, x BIGINT, y BIGINT")
    path = str(tmp_path / "zsorted")
    zorder_write(df, path, ["x", "y"], bits=6, n_files=8)

    back = spark.read.parquet(path)
    assert back.count() == 4096
    assert set(back.columns) == {"id", "x", "y"}  # derivable z not stored

    # per-file z ranges must not overlap (the pruning contract)
    per_file = (
        back.withColumn("f", F.input_file_name())
        .selectExpr("f", f"({zorder_sql(['x', 'y'], 6)}) AS z")
        .groupBy("f")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .collect()
    )
    assert len(per_file) >= 2
    for a, b in itertools.combinations(per_file, 2):
        assert a.hi < b.lo or b.hi < a.lo

    # and the payoff: a point predicate on x touches few files' ranges
    spans = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("x").alias("xlo"), F.max("x").alias("xhi"))
        .collect()
    )
    hit = [s for s in spans if s.xlo <= 3 <= s.xhi]
    assert len(hit) < len(spans)  # not every file matches x == 3
