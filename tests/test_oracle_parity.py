"""Local replica of the driver's DuckDB-oracle gate (SURVEY.md §5.2) at
sf0.001 for speed; tools/check_oracle.py runs the same compare at
sf0.01 (what the driver uses)."""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE
from tools.check_oracle import compare, driver_canon, duck_con

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_SMOKE)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_matches_oracle(spark, con, name):
    spark_pd = QUERIES[name](spark, SF_SMOKE).toPandas()
    # Driver-canon gate FIRST: the driver sorts raw dtypes before
    # hashing; a list/dict cell dies there (r3's text_hashing_features)
    # even when values are correct. Fail locally, not at the driver.
    driver_canon(spark_pd)
    duck_pd = con.sql(ORACLES[name]).df()
    problems = compare(spark_pd, duck_pd)
    assert not problems, problems


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_driver_canon(spark, name):
    """Rows-only queries still flow through the driver's recorder —
    their output must be canonicalizable (all-scalar columns) too."""
    spark_pd = QUERIES[name](spark, SF_SMOKE).toPandas()
    driver_canon(spark_pd)
    assert len(spark_pd) >= 0


# --- non-UTC session parity (round-5 judge task #1/#3) ---------------------
# The driver builds its OWN SparkSession and inherits the driver machine's
# timezone; the fixtures' timestamps are naive (NTZ) parquet values, and the
# NTZ->LTZ lift in io.read_table interprets them in the SESSION timezone.
# Local-wall outputs (date_trunc, epoch differences) are tz-invariant, but
# absolute-instant outputs (unix_micros, epoch-us bounds) shift by the zone
# offset — exactly w17_session_table's r4/r5 driver-red signature. The local
# sandbox runs UTC, so the plain oracle gate can NEVER catch this class;
# these tests force America/New_York (DST + negative offset) around every
# events-touching oracle query and assert the read_table runtime pin keeps
# the output bit-identical to DuckDB's naive read.

# every events-touching oracle (the ts column lives there), plus any oracle
# that emits epoch/unix values from the other naive-timestamp tables
# (orders.o_orderdate, lineitem.l_shipdate) — e.g. w26_rfm_segments'
# epoch(o_orderdate) output is an absolute instant too. Naive-literal
# predicates (o_orderdate < TIMESTAMP '...') shift with the column under a
# non-UTC session and so stay tz-invariant; only emitted instants can drift.
TS_QUERIES = sorted(
    k
    for k, v in ORACLES.items()
    if "events" in v.lower() or re.search(r"epoch|unix", v.lower())
)


@pytest.fixture(scope="module")
def non_utc_spark(spark):
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", "UTC")


@pytest.mark.parametrize("name", TS_QUERIES)
def test_non_utc_session(non_utc_spark, con, name):
    # re-assert before every query: read_table pins UTC as a side effect,
    # so a prior parametrization would otherwise leave the session UTC and
    # void the scenario this test exists for
    non_utc_spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    spark_pd = QUERIES[name](non_utc_spark, SF_SMOKE).toPandas()
    duck_pd = con.sql(ORACLES[name]).df()
    problems = compare(spark_pd, duck_pd)
    assert not problems, problems
