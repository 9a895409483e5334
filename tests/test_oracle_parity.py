"""Local replica of the driver's DuckDB-oracle gate (SURVEY.md §5.2) at
sf0.001 for speed; tools/check_oracle.py runs the same compare at
sf0.01 (what the driver uses)."""

from __future__ import annotations

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
