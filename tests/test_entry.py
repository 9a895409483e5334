"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql()
are consistent, every query executes at sf0.001."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0


def test_oracles_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    # schema resolvable and the query executes
    n = df.count()
    assert n >= 0
