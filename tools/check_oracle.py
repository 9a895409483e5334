"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet, then compares row count, column names
(sorted), and order-insensitive values — flagging anything the driver's
value-hash would flag. Run while iterating:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

from gcpdatapipelines_spark.io import TABLES
from gcpdatapipelines_spark.session import get_spark

import __spark_entry__ as entrymod


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def driver_canon(df: pd.DataFrame) -> pd.DataFrame:
    """Replica of the DRIVER's canonicalizer: sorted columns, then
    ``sort_values`` over all columns on RAW dtypes (no stringify).
    Raises TypeError on unhashable/unorderable cells (lists, dicts,
    arrays) — exactly the wall `text_hashing_features` hit in round 3
    (CORRECTNESS_r03: ``TypeError: unhashable type: 'list'``). Every
    catalog query's output must survive this before the driver sees it:
    non-scalar columns belong joined into strings or exploded long."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object and len(df):
            head = df[c].dropna().head(5)
            for v in head:
                if isinstance(v, (list, dict, set)) or hasattr(v, "__array__"):
                    raise TypeError(
                        f"unhashable type in column {c!r}: "
                        f"{type(v).__name__} (driver canonicalizer would die)"
                    )
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare(spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pd) != len(duck_pd):
        problems.append(f"row count {len(spark_pd)} != oracle {len(duck_pd)}")
    s_cols, d_cols = sorted(spark_pd.columns), sorted(duck_pd.columns)
    if s_cols != d_cols:
        problems.append(f"columns {s_cols} != oracle {d_cols}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pd), normalize(duck_pd)
    # dtype-KIND gate (r7, the w17/text_zipf_fit lesson): the driver's
    # value hash is dtype-sensitive, but the float coercion below makes
    # this local compare blind to int64-vs-float64 (DuckDB HUGEINT) and
    # Decimal-object-vs-float64 (Spark decimal from a `x / 1000000.0`
    # decimal literal) — both were local-green / driver-red for rounds.
    # Driver-proven-benign pairs stay unflagged: int32 vs int64 (same
    # kind 'i'), duck DECIMAL→float64 vs spark double (both 'f'),
    # datetime64 vs object(date) (datetimes exempt).
    import datetime as _dt
    import decimal as _dec

    for c in spark_pd.columns:
        sk = spark_pd[c].dtype.kind
        dk = duck_pd[c].dtype.kind
        kinds = {sk, dk}
        if kinds == {"i", "f"} or kinds == {"u", "f"}:
            problems.append(
                f"col {c}: dtype kind mismatch spark={spark_pd[c].dtype} "
                f"oracle={duck_pd[c].dtype} (driver hash WOULD MISMATCH "
                f"— int-vs-float, the HUGEINT/decimal-literal class)"
            )
        elif kinds == {"b", "i"} or kinds == {"b", "u"} or kinds == {"b", "f"}:
            # bool-vs-numeric renders differently under a dtype-sensitive
            # hash even though the truthy values agree
            problems.append(
                f"col {c}: dtype kind mismatch spark={spark_pd[c].dtype} "
                f"oracle={duck_pd[c].dtype} (driver hash WOULD MISMATCH "
                f"— bool-vs-numeric)"
            )
        elif "O" in kinds and kinds & {"i", "u", "f"}:
            # scan ALL non-null values, not a head sample: a column can
            # open with dates and later carry Decimals (advisor r7)
            obj = (spark_pd[c] if sk == "O" else duck_pd[c]).dropna()
            if any(isinstance(v, _dec.Decimal) for v in obj):
                problems.append(
                    f"col {c}: spark={spark_pd[c].dtype} oracle="
                    f"{duck_pd[c].dtype} with Decimal objects vs numeric "
                    f"(driver hash WOULD MISMATCH)"
                )
            elif not all(
                isinstance(v, (_dt.date, _dt.datetime)) for v in obj
            ):
                problems.append(
                    f"col {c}: object-vs-numeric dtype pair "
                    f"spark={spark_pd[c].dtype} oracle={duck_pd[c].dtype}"
                )
    if problems:
        return problems
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
            sv64 = sv.astype(np.float64)
            dv64 = dv.astype(np.float64)
            both_nan = np.isnan(sv64) & np.isnan(dv64)
            exact = np.array_equal(sv64, dv64, equal_nan=True)
            if not exact:
                diff = np.where(both_nan, 0.0, np.abs(sv64 - dv64))
                bad = int(np.sum(diff > 0))
                problems.append(
                    f"col {c}: {bad} values differ, max abs diff {np.nanmax(diff):.3e} "
                    f"(hash WOULD MISMATCH — values not bit-identical)"
                )
        else:
            if not np.array_equal(sv, dv):
                idx = np.nonzero(sv != dv)[0][:3]
                problems.append(
                    f"col {c}: mismatch at rows {idx.tolist()}: "
                    f"spark={sv[idx].tolist()} oracle={dv[idx].tolist()}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duck_con(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        results[name] = rec
        try:
            spark_pd = fn(spark, sf_dir).toPandas()
        except Exception:
            rec["err"] = "spark error"
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        rec["spark_rows"] = len(spark_pd)
        if name not in oracles:
            rec["err"] = "rows-only (no oracle by design)"
            rec["rows_match"] = len(spark_pd) > 0
            print(f"ROWS  {name}: {len(spark_pd)} rows (no oracle; rows-only check) "
                  f"[{time.time()-t0:.1f}s]")
            if len(spark_pd) == 0:
                print(f"      WARNING: zero rows")
            continue
        try:
            duck_pd = con.sql(oracles[name]).df()
        except Exception:
            rec["err"] = "duckdb error"
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        rec["oracle_rows"] = len(duck_pd)
        problems = compare(spark_pd, duck_pd)
        rec["rows_match"] = len(spark_pd) == len(duck_pd)
        rec["schema_match"] = sorted(spark_pd.columns) == sorted(duck_pd.columns)
        rec["hash_match"] = not problems
        if problems:
            n_fail += 1
            rec["err"] = "; ".join(problems)
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"OK    {name}: {len(spark_pd)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{n_fail} failures / {len(only) if only else len(qs)} checked")
    if not only:  # full-gate run: ship machine-readable self-verification
        import json

        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ORACLE_SELF.json",
        )
        with open(out, "w") as fh:
            json.dump(results, fh, indent=2)
        print(f"wrote {out} ({len(results)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
