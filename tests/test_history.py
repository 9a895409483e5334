"""Temporal-table operators: keep-latest, SCD2 intervals, snapshot
diff — semantics on hand-built frames + scale-plan contracts."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gcpdatapipelines_spark import plans as PL
from gcpdatapipelines_spark.operators.history import (
    keep_latest,
    scd2_intervals,
    snapshot_diff,
)

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _log(spark):
    # user 1: a -> a -> b (the repeat must collapse); user 2: single row
    return spark.createDataFrame(
        [
            (1, _ts(0), "a", 10),
            (1, _ts(5), "a", 11),
            (1, _ts(9), "b", 12),
            (2, _ts(3), "x", 13),
        ],
        "k BIGINT, ts TIMESTAMP, attr STRING, seq BIGINT",
    )


def test_keep_latest_picks_newest_row(spark):
    out = {r["k"]: r["attr"] for r in keep_latest(_log(spark), ["k"], "ts", "seq").collect()}
    assert out == {1: "b", 2: "x"}


def test_keep_latest_tiebreak_on_equal_ts(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), "lo", 1), (1, _ts(0), "hi", 2)],
        "k BIGINT, ts TIMESTAMP, attr STRING, seq BIGINT",
    )
    (row,) = keep_latest(df, ["k"], "ts", "seq").collect()
    assert row["attr"] == "hi"  # larger tiebreak wins


def test_scd2_collapses_and_builds_intervals(spark):
    rows = {
        (r["k"], r["attr"]): (r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_intervals(_log(spark).drop("seq"), ["k"], "ts", ["attr"]).collect()
    }
    # user 1: 'a' valid [t0, t9), 'b' open; the t5 repeat of 'a' vanished
    assert rows[(1, "a")] == (_ts(0), _ts(9), False)
    assert rows[(1, "b")] == (_ts(9), None, True)
    assert rows[(2, "x")] == (_ts(3), None, True)
    assert len(rows) == 3


def test_scd2_no_collapse_keeps_every_row(spark):
    out = scd2_intervals(
        _log(spark).drop("seq"), ["k"], "ts", ["attr"], collapse=False
    ).collect()
    assert len(out) == 4


def test_scd2_null_attr_change_detected(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), "a"), (1, _ts(1), None), (1, _ts(2), None), (1, _ts(3), "a")],
        "k BIGINT, ts TIMESTAMP, attr STRING",
    )
    out = scd2_intervals(df, ["k"], "ts", ["attr"]).collect()
    # a -> NULL -> a : three versions (NULL run collapses, NULL != 'a')
    assert [r["attr"] for r in sorted(out, key=lambda r: r["valid_from"])] == [
        "a",
        None,
        "a",
    ]


def test_scd2_leading_null_attrs_keep_first_interval(spark):
    """A key whose history STARTS with NULL attributes must keep its
    opening interval (ADVICE.md: lag()=NULL + eqNullSafe(NULL) marked
    the first row 'unchanged' and dropped it)."""
    df = spark.createDataFrame(
        [(1, _ts(0), None), (1, _ts(5), None), (1, _ts(9), "a"), (2, _ts(0), None)],
        "k BIGINT, ts TIMESTAMP, attr STRING",
    )
    out = sorted(scd2_intervals(df, ["k"], "ts", ["attr"]).collect(),
                 key=lambda r: (r["k"], r["valid_from"]))
    # key 1: NULL interval [t0, t9) then 'a' open; key 2 (all-NULL) survives
    assert [(r["k"], r["attr"], r["valid_from"], r["valid_to"]) for r in out] == [
        (1, None, _ts(0), _ts(9)),
        (1, "a", _ts(9), None),
        (2, None, _ts(0), None),
    ]


def test_scd2_single_exchange(spark):
    """Both window passes share one partitioning: exactly ONE exchange."""
    df = scd2_intervals(_log(spark).drop("seq"), ["k"], "ts", ["attr"])
    assert PL.num_exchanges(df) == 1


def test_snapshot_diff_classifies(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "k BIGINT, s STRING, v DOUBLE"
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 9.0), (4, "d", 4.0)], "k BIGINT, s STRING, v DOUBLE"
    )
    out = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()}
    # key 1 unchanged -> absent; 2 changed; 3 removed; 4 added
    assert out == {2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_null_key_not_misclassified(spark):
    """A NULL key present in both snapshots with equal payload is
    unchanged — presence markers, not key nullability (ADVICE.md
    merge.py pattern)."""
    old = spark.createDataFrame([(None, "a", 1.0)], "k BIGINT, s STRING, v DOUBLE")
    new = spark.createDataFrame([(None, "a", 1.0)], "k BIGINT, s STRING, v DOUBLE")
    assert snapshot_diff(old, new, ["k"], ["s", "v"]).count() == 0


def test_snapshot_diff_null_payload_change(spark):
    old = spark.createDataFrame([(1, None, 1.0)], "k BIGINT, s STRING, v DOUBLE")
    new = spark.createDataFrame([(1, "x", 1.0)], "k BIGINT, s STRING, v DOUBLE")
    (row,) = snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    assert row["change_type"] == "changed"


def test_snapshot_diff_keys_only_audit(spark):
    """compare_cols=[] is a legitimate presence audit: only added and
    removed keys are emitted (ADVICE.md: `~None` raised TypeError)."""
    old = spark.createDataFrame([(1,), (2,)], "k BIGINT")
    new = spark.createDataFrame([(2,), (3,)], "k BIGINT")
    out = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"], []).collect()}
    assert out == {1: "removed", 3: "added"}


def test_propagate_deletes_and_audit(spark):
    from gcpdatapipelines_spark.operators.compliance import (
        deletion_audit,
        propagate_deletes,
    )

    t1 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "uid BIGINT, v STRING")
    t2 = spark.createDataFrame([(1, 1.0), (1, 2.0), (4, 3.0)], "owner BIGINT, x DOUBLE")
    subjects = spark.createDataFrame([(1,), (1,), (9,)], "id BIGINT")
    kept = propagate_deletes(
        {"t1": t1, "t2": t2}, subjects, {"t1": "uid", "t2": "owner"}
    )
    assert {r["uid"] for r in kept["t1"].collect()} == {2, 3}
    assert {r["owner"] for r in kept["t2"].collect()} == {4}
    audit = {r["table_name"]: r["n_rows"] for r in deletion_audit(kept).collect()}
    assert audit == {"t1": 2, "t2": 1}


def test_propagate_deletes_is_broadcast(spark):
    from gcpdatapipelines_spark import plans as PL
    from gcpdatapipelines_spark.operators.compliance import propagate_deletes

    t = spark.createDataFrame([(1, "a")], "uid BIGINT, v STRING")
    ids = spark.createDataFrame([(1,)], "id BIGINT")
    (kept,) = propagate_deletes({"t": t}, ids, {"t": "uid"}).values()
    assert "BroadcastHashJoin" in PL.join_strategies(kept)
