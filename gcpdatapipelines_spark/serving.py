"""Point-lookup serving layer (reference §3.3: Flask_app/main.py and
Fast_API/main.py — read a CSV from blob storage, answer key lookups
over HTTP with zero-filled defaults for missing keys).

The reference re-scans the whole CSV on EVERY request
(Flask_app/main.py:19 — documented anti-pattern, SURVEY.md §4.1). Here
the engine side does the scan once:

- ``point_query``: the engine-native form — case-insensitive filter +
  limit(1) against a (cached) DataFrame; Catalyst pushes the predicate
  to the scan.
- ``build_index``: the serving-edge form (reference S6,
  Fast_API/read_csv_no_pandas.py:7-25) — collect the dimension once
  into a lowercased-key dict for O(1) probes. Only valid for
  dimension-sized tables; that is exactly the serving use case.
- ``make_flask_app`` / ``make_fastapi_app``: thin demo endpoints with
  the reference's exact missing-key contract (zero-filled defaults,
  never an error — Fast_API/main.py:25-36). Import-gated: the engine
  works without the web frameworks installed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_query(df: DataFrame, key_col: str, key: str, defaults: dict) -> dict:
    """Case-insensitive point lookup; missing key -> defaults with the
    probe key echoed back (reference Flask_app/main.py:21-29)."""
    rows = (
        df.filter(F.lower(F.col(key_col)) == key.lower()).limit(1).collect()
    )
    if not rows:
        return {**defaults, key_col: key}
    return rows[0].asDict()


def build_index(df: DataFrame, key_col: str) -> dict:
    """Collect a dimension into a lowercased-key dict for O(1) serving
    probes (reference S6). The collect is intentional and single-shot —
    the anti-pattern being replaced is per-request rescans."""
    return {
        r[key_col].lower(): r.asDict() for r in df.collect() if r[key_col] is not None
    }


def index_lookup(index: dict, key_col: str, key: str, defaults: dict) -> dict:
    hit = index.get(key.lower())
    if hit is None:
        return {**defaults, key_col: key}
    return hit


def make_flask_app(df: DataFrame, key_col: str, defaults: dict):
    """Flask serving demo (reference Flask_app/main.py). Returns None
    when flask isn't installed."""
    try:
        from flask import Flask, jsonify
    except ImportError:
        return None
    index = build_index(df, key_col)
    app = Flask(__name__)

    @app.route("/hello")
    def hello():  # smoke endpoint, reference Flask_app/main.py:10-12
        return "Hello World!"

    @app.route("/lookup/<name>")
    def lookup(name):
        return jsonify(index_lookup(index, key_col, name, defaults))

    return app


def make_fastapi_app(df: DataFrame, key_col: str, defaults: dict):
    """FastAPI serving demo (reference Fast_API/main.py). Returns None
    when fastapi isn't installed."""
    try:
        from fastapi import FastAPI
    except ImportError:
        return None
    index = build_index(df, key_col)
    app = FastAPI()

    @app.get("/hello")
    def hello():  # reference Fast_API/main.py:14-16
        return {"msg": "Hello World!"}

    @app.get("/lookup/{name}")
    def lookup(name: str):
        return index_lookup(index, key_col, name, defaults)

    return app
