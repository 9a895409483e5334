"""Joins (SURVEY.md §2.5, J1-J2) plus the semi/anti surface Spark adds.

The reference hand-rolls its only joins: a broadcast side-input dict
probe (reference pipeline.py:31-36,54-61) and a per-key HTTP lookup
(csv_to_bq_NYC.py:64-93). Both become declarative joins; `broadcast()`
hints reproduce the map-side strategy explicitly, and AQE would pick it
anyway when the dimension is small. At 100 TB the fact side never
shuffles for a broadcast join — that is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def broadcast_enrich(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """J1: broadcast hash equi-join (reference pipeline.py:61 AsDict
    side input). ``on`` as in DataFrame.join."""
    return fact.join(broadcast(dim), on, how)


def enrich_ci(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """J2: dimension-enrichment join with case-insensitive keys
    (reference csv_to_bq_NYC.py:64-93 HTTP lookup + Flask_app/main.py:26
    lower() matching), re-expressed as a broadcast left join."""
    cond = F.lower(fact[fact_key]) == F.lower(dim[dim_key])
    return fact.join(broadcast(dim), cond, how).drop(dim[dim_key])


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS: rows of left with a match in right (not in reference;
    part of the general-engine surface, SURVEY.md §2.5)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS: rows of left without a match in right."""
    return left.join(right, on, "left_anti")
