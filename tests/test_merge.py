"""Upsert/MERGE rewrite: row semantics, NULL-keeps-target coalesce,
idempotence, and the no-shuffle-on-target plan contract."""

from __future__ import annotations

import pytest

from gcpdatapipelines_spark import plans as PL
from gcpdatapipelines_spark.io import from_rows
from gcpdatapipelines_spark.operators.merge import merge_upsert
from gcpdatapipelines_spark.queries import SPARK_QUERIES
from tests.conftest import SF_SMOKE

TARGET = [
    (1, "open", 10.0),
    (2, "open", 20.0),
    (3, "done", 30.0),
]
SCHEMA = "k BIGINT, status STRING, amount DOUBLE"


def _target(spark):
    return from_rows(spark, TARGET, SCHEMA)


def _as_dict(df):
    return {r["k"]: (r["status"], r["amount"]) for r in df.collect()}


def test_full_row_upsert(spark):
    source = from_rows(spark, [(2, "closed", 25.0), (4, "new", 40.0)], SCHEMA)
    out = _as_dict(merge_upsert(_target(spark), source, on=["k"]))
    assert out == {
        1: ("open", 10.0),
        2: ("closed", 25.0),
        3: ("done", 30.0),
        4: ("new", 40.0),
    }


def test_partial_update_patches_only_named_columns(spark):
    source = from_rows(spark, [(2, "closed", 999.0), (4, "new", 40.0)], SCHEMA)
    out = _as_dict(
        merge_upsert(_target(spark), source, on=["k"], update_cols=["status"])
    )
    # matched row 2: status patched, amount kept; insert row 4: full row
    assert out[2] == ("closed", 20.0)
    assert out[4] == ("new", 40.0)
    assert out[1] == ("open", 10.0)


def test_partial_update_null_keeps_target(spark):
    source = from_rows(spark, [(3, None, 35.0)], SCHEMA)
    out = _as_dict(
        merge_upsert(
            _target(spark), source, on=["k"], update_cols=["status", "amount"]
        )
    )
    assert out[3] == ("done", 35.0)


def test_upsert_is_idempotent(spark):
    source = from_rows(spark, [(2, "closed", 25.0), (4, "new", 40.0)], SCHEMA)
    once = merge_upsert(_target(spark), source, on=["k"])
    twice = merge_upsert(once, source, on=["k"])
    assert _as_dict(twice) == _as_dict(once)


def test_missing_key_raises(spark):
    source = from_rows(spark, [(1, "x", 1.0)], SCHEMA)
    with pytest.raises(ValueError, match="absent"):
        merge_upsert(_target(spark), source, on=["nope"])


def test_full_row_requires_full_schema(spark):
    source = from_rows(spark, [(1, "x")], "k BIGINT, status STRING")
    with pytest.raises(ValueError, match="missing"):
        merge_upsert(_target(spark), source, on=["k"])


def test_catalog_merge_never_shuffles_target(spark):
    """The scale contract: with a broadcast changeset, the 100 TB
    target flows scan -> broadcast anti join -> union with zero
    exchanges anywhere in the plan."""
    df = SPARK_QUERIES["merge_upsert"](spark, SF_SMOKE)
    assert PL.num_exchanges(df) == 0, PL.formatted_plan(df)
    strategies = set(PL.join_strategies(df))
    assert strategies == {"BroadcastHashJoin"}, strategies


def test_partial_update_null_merge_key_target_row_survives(spark):
    """A target row whose merge key is NULL never matches the source,
    but it must flow through intact — the presence marker (not key
    nullability) decides insert-vs-keep, so its non-update columns are
    NOT nulled out as a phantom 'insert'."""
    target = from_rows(
        spark, [(None, "orphan", 99.0), (1, "open", 10.0)], SCHEMA
    )
    source = from_rows(spark, [(1, "done", None)], SCHEMA)
    out = merge_upsert(target, source, on=["k"], update_cols=["status"])
    rows = {r["status"]: (r["k"], r["amount"]) for r in out.collect()}
    assert rows["orphan"] == (None, 99.0)  # survived untouched
    assert rows["done"] == (1, 10.0)  # patched, amount kept


def test_apply_cdc_insert_update_delete(spark):
    from gcpdatapipelines_spark.operators.merge import apply_cdc

    target = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "k BIGINT, s STRING, v DOUBLE"
    )
    changes = spark.createDataFrame(
        [(2, "b2", 9.0, "U"), (3, None, None, "D"), (4, "d", 4.0, "I")],
        "k BIGINT, s STRING, v DOUBLE, op STRING",
    )
    out = {r["k"]: (r["s"], r["v"]) for r in apply_cdc(target, changes, ["k"]).collect()}
    assert out == {1: ("a", 1.0), 2: ("b2", 9.0), 4: ("d", 4.0)}


def test_apply_cdc_binlog_compaction_nets_out(spark):
    """insert -> update -> delete of one key in a single segment must
    apply as its NET effect (the key ends deleted); a key whose last
    change is an update keeps only the final value."""
    import datetime as dt

    from gcpdatapipelines_spark.operators.merge import apply_cdc

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    target = spark.createDataFrame([(1, "x", 0.0)], "k BIGINT, s STRING, v DOUBLE")
    changes = spark.createDataFrame(
        [
            (5, "new", 1.0, "I", ts(0), 1),
            (5, "newer", 2.0, "U", ts(1), 2),
            (5, None, None, "D", ts(2), 3),
            (1, "x1", 1.0, "U", ts(0), 4),
            (1, "x2", 2.0, "U", ts(1), 5),
        ],
        "k BIGINT, s STRING, v DOUBLE, op STRING, ts TIMESTAMP, seq BIGINT",
    )
    out = {
        r["k"]: (r["s"], r["v"])
        for r in apply_cdc(
            target, changes, ["k"], order_col="ts", tiebreak="seq"
        ).collect()
    }
    assert out == {1: ("x2", 2.0)}


def test_apply_cdc_idempotent(spark):
    from gcpdatapipelines_spark.operators.merge import apply_cdc

    target = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], "k BIGINT, s STRING, v DOUBLE")
    changes = spark.createDataFrame(
        [(1, "a2", 5.0, "U"), (2, None, None, "D")], "k BIGINT, s STRING, v DOUBLE, op STRING"
    )
    once = apply_cdc(target, changes, ["k"])
    twice = apply_cdc(once, changes, ["k"])
    assert sorted(once.collect()) == sorted(twice.collect())


def test_apply_cdc_target_never_shuffles(spark):
    from gcpdatapipelines_spark import plans as PL
    from gcpdatapipelines_spark.operators.merge import apply_cdc

    target = spark.createDataFrame([(1, "a", 1.0)], "k BIGINT, s STRING, v DOUBLE")
    changes = spark.createDataFrame(
        [(1, "a2", 2.0, "U")], "k BIGINT, s STRING, v DOUBLE, op STRING"
    )
    out = apply_cdc(target, changes, ["k"])
    assert "BroadcastHashJoin" in PL.join_strategies(out)
    assert PL.num_exchanges(out) == 0


# ---------------------------------------------------------------------------
# survivorship_golden
# ---------------------------------------------------------------------------

from gcpdatapipelines_spark.operators.merge import survivorship_golden  # noqa: E402


def test_survivorship_per_attribute_fallthrough(spark):
    rows = [
        # key 1: CRM(p1) has name but null phone; WEB(p2) fills phone
        (1, 1, "Ada", None),
        (1, 2, "ada_web", "555"),
        # key 2: CRM entirely null -> everything falls to WEB
        (2, 1, None, None),
        (2, 2, "Bob", "777"),
    ]
    df = spark.createDataFrame(rows, "k BIGINT, pri INT, name STRING, phone STRING")
    out = {r.k: r for r in survivorship_golden(df, "k", "pri", ["name", "phone"]).collect()}
    assert (out[1].name, out[1].phone) == ("Ada", "555")
    assert (out[2].name, out[2].phone) == ("Bob", "777")
    assert len(out) == 2


def test_survivorship_single_window_pass(spark):
    df = spark.createDataFrame([(1, 1, "x")], "k BIGINT, pri INT, name STRING")
    plan = survivorship_golden(df, "k", "pri", ["name"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # one key shuffle serves every attribute
    assert "Join" not in plan
