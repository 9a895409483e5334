"""Pivot/transpose semantics against the reference's golden fixture
(FIXTURES.md A1; reference data_transpose.ipynb cells 14-16)."""

from __future__ import annotations

from pyspark.sql import Row

from gcpdatapipelines_spark.operators.pivot import transpose, transpose_oracle_sql

GOLDEN = [
    Row(ID=123, CLASS="AAA", SALES=101.44),
    Row(ID=123, CLASS="BBB", SALES=345.44),
    Row(ID=1234, CLASS="AAA", SALES=458.44),
]


def test_golden_pivot(spark):
    """Input/expected pasted in the reference notebook: schema
    [ID, AAA_SALES, BBB_SALES]; rows (123,101.44,345.44),
    (1234,458.44,NULL)."""
    df = spark.createDataFrame(GOLDEN)
    wide = transpose(df, ["ID"], ["CLASS"], ["SALES"], agg="first")
    assert wide.columns == ["ID", "AAA_SALES", "BBB_SALES"]
    rows = {r["ID"]: r for r in wide.collect()}
    assert rows[123]["AAA_SALES"] == 101.44
    assert rows[123]["BBB_SALES"] == 345.44
    assert rows[1234]["AAA_SALES"] == 458.44
    assert rows[1234]["BBB_SALES"] is None


def test_duplicate_key_pivot_pair_first_semantics(spark):
    """Duplicate (key, pivot) pairs: reference dict-merge keeps an
    arbitrary single value (data_transpose_working_1.py:125-131);
    agg='first' must yield one of the inputs, agg='sum' their sum."""
    df = spark.createDataFrame(
        [Row(ID=1, CLASS="AAA", SALES=10.0), Row(ID=1, CLASS="AAA", SALES=20.0)]
    )
    first = transpose(df, ["ID"], ["CLASS"], ["SALES"], agg="first").collect()[0]
    assert first["AAA_SALES"] in (10.0, 20.0)
    summed = transpose(df, ["ID"], ["CLASS"], ["SALES"], agg="sum").collect()[0]
    assert summed["AAA_SALES"] == 30.0


def test_multi_key_multi_value(spark):
    """Multi-key + multi-value anticipated by the reference CLI
    (--keyFields=id,locid --valueFields=sale_price,count,
    data_transpose_working_1.py:150-152)."""
    df = spark.createDataFrame(
        [
            Row(id=1, locid=7, c="A", price=1.0, qty=2.0),
            Row(id=1, locid=7, c="B", price=3.0, qty=4.0),
            Row(id=2, locid=8, c="A", price=5.0, qty=6.0),
        ]
    )
    wide = transpose(df, ["id", "locid"], ["c"], ["price", "qty"], agg="first")
    assert set(wide.columns) == {"id", "locid", "A_price", "A_qty", "B_price", "B_qty"}
    r1 = [r for r in wide.collect() if r["id"] == 1][0]
    assert (r1["A_price"], r1["B_qty"]) == (1.0, 4.0)


def test_multi_pivot_field_concat(spark):
    """Multi-pivot-field concatenates values with '_'
    (--pivotFields=class,on_sale, data_transpose_working_1.py:150-152)."""
    df = spark.createDataFrame(
        [Row(id=1, c="A", sale="Y", v=1.0), Row(id=1, c="B", sale="N", v=2.0)]
    )
    wide = transpose(df, ["id"], ["c", "sale"], ["v"], agg="first")
    assert set(wide.columns) == {"id", "A_Y_v", "B_N_v"}


def test_null_pivot_value(spark):
    """NULL pivot values land in Spark's 'null' column; engine keeps
    them (risk item in SURVEY.md §7 Phase 4)."""
    df = spark.createDataFrame(
        [Row(id=1, c=None, v=5.0), Row(id=1, c="A", v=1.0)]
    )
    wide = transpose(df, ["id"], ["c"], ["v"], agg="first")
    assert "A_v" in wide.columns
    assert "null_v" in wide.columns


def test_explicit_pivot_values_skip_distinct_job(spark):
    df = spark.createDataFrame(GOLDEN)
    wide = transpose(
        df, ["ID"], ["CLASS"], ["SALES"], agg="sum", pivot_values=["AAA", "BBB", "CCC"]
    )
    assert wide.columns == ["ID", "AAA_SALES", "BBB_SALES", "CCC_SALES"]
    r = {x["ID"]: x for x in wide.collect()}
    assert r[123]["CCC_SALES"] is None


def test_oracle_sql_generator():
    sql = transpose_oracle_sql(
        "sales", ["ID"], "CLASS", "SALES", ["AAA", "BBB"], agg="sum"
    )
    assert 'AS "AAA_SALES"' in sql and "GROUP BY ID" in sql


def test_conditional_pivot_matches_pivot(spark):
    """transpose_conditional (streaming-safe single-agg form) must equal
    transpose (native pivot) for the same explicit values."""
    from gcpdatapipelines_spark.operators.pivot import transpose_conditional

    df = spark.createDataFrame(GOLDEN)
    a = transpose(df, ["ID"], ["CLASS"], ["SALES"], agg="sum",
                  pivot_values=["AAA", "BBB"]).orderBy("ID").collect()
    b = transpose_conditional(df, ["ID"], "CLASS", "SALES",
                              ["AAA", "BBB"], agg="sum").orderBy("ID").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
