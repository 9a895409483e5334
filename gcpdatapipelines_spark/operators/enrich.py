"""External-lookup enrichment (reference S7/J2: per-element HTTP calls
to ip-api.com / an App Engine service, pipeline.py:22-29 and
csv_to_bq_NYC.py:64-70).

The reference's shape — one HTTP GET per *row* (pipeline.py:54-56
resolves the country per log line, not per distinct IP) — is the
anti-pattern SURVEY.md §4.1 flags. The engine replaces it with two
tiers:

1. ``enrich_via_dimension``: the lookup table is (or can be snapshotted
   as) a DataFrame -> broadcast join. Zero external calls; the default.
2. ``enrich_via_resolver``: the lookup is genuinely external/dynamic.
   Then: project the DISTINCT keys (usually orders of magnitude smaller
   than the fact table), resolve each key ONCE through an Arrow-batched
   mapInPandas resolver, and broadcast-join the resulting mini-dimension
   back. External-call volume is O(distinct keys), never O(rows), and
   the fact table never moves.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def enrich_via_dimension(
    fact: DataFrame, dim: DataFrame, on, how: str = "left"
) -> DataFrame:
    """Preferred path: dimension snapshot + broadcast join
    (reference pipeline.py:61 side-input dict, declaratively)."""
    return fact.join(broadcast(dim), on, how)


def enrich_via_resolver(
    fact: DataFrame,
    key_col: str,
    resolver: Callable[[pd.Series], pd.DataFrame],
    result_schema: str,
    how: str = "left",
) -> DataFrame:
    """Resolve distinct keys through an external function, then join.

    ``resolver`` receives a pandas Series of distinct keys (one Arrow
    batch at a time) and returns a DataFrame with a ``key_col`` column
    plus enrichment columns matching ``result_schema``. It runs on
    executors — batch your API calls inside it.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield resolver(pdf[key_col])

    keys = fact.select(key_col).distinct()
    mini_dim = keys.mapInPandas(run, schema=result_schema)
    return fact.join(broadcast(mini_dim), key_col, how)


def fake_geo_resolver(ips: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in for the reference's ip-api.com lookup
    (pipeline.py:22-29): 'resolves' an id to a synthetic country code.
    Swap for a requests.Session batch call in production."""
    return pd.DataFrame(
        {
            "user_id": ips,
            "country": ["CTRY_" + str(int(v) % 7) for v in ips],
        }
    )
