"""External-lookup enrichment + serving-layer semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcpdatapipelines_spark import serving
from gcpdatapipelines_spark.io import read_table
from gcpdatapipelines_spark.operators import enrich as E
from tests.conftest import SF_SMOKE


def test_resolver_called_per_distinct_key(spark):
    """The resolver path must resolve O(distinct keys), never O(rows):
    events has many rows per user, the enriched output must still carry
    one country per user_id and all original rows."""
    ev = read_table(spark, SF_SMOKE, "events")
    out = E.enrich_via_resolver(
        ev, "user_id", E.fake_geo_resolver, "user_id BIGINT, country STRING"
    )
    assert out.count() == ev.count()
    per_user = out.groupBy("user_id").agg(F.countDistinct("country").alias("n"))
    assert per_user.filter(F.col("n") != 1).count() == 0
    one = out.filter(F.col("user_id") == 3).select("country").first()["country"]
    assert one == "CTRY_3"


def test_enrich_via_dimension_left_join(spark):
    s = read_table(spark, SF_SMOKE, "supplier")
    n = read_table(spark, SF_SMOKE, "nation")
    out = E.enrich_via_dimension(s, n, s.s_nationkey == n.n_nationkey)
    assert out.count() == s.count()


def test_point_query_hit_and_miss(spark):
    n = read_table(spark, SF_SMOKE, "nation")
    name = n.first()["n_name"]
    hit = serving.point_query(n, "n_name", name.lower(), {"n_regionkey": 0})
    assert hit["n_name"] == name  # case-insensitive probe
    miss = serving.point_query(
        n, "n_name", "atlantis", {"n_regionkey": 0, "n_nationkey": -1}
    )
    # reference contract: zero-filled defaults + echoed key, not an error
    assert miss == {"n_regionkey": 0, "n_nationkey": -1, "n_name": "atlantis"}


def test_index_lookup_matches_point_query(spark):
    n = read_table(spark, SF_SMOKE, "nation")
    idx = serving.build_index(n, "n_name")
    name = n.first()["n_name"]
    assert serving.index_lookup(idx, "n_name", name.upper(), {})["n_name"] == name
    assert serving.index_lookup(idx, "n_name", "nope", {"x": 0}) == {
        "x": 0,
        "n_name": "nope",
    }


def test_web_apps_import_gated(spark):
    """App factories must degrade to None (not raise) without the web
    frameworks installed; with them installed they must build."""
    n = read_table(spark, SF_SMOKE, "nation")
    for factory in (serving.make_flask_app, serving.make_fastapi_app):
        app = factory(n, "n_name", {"n_regionkey": 0})
        assert app is None or app is not None  # no exception is the contract


def test_flask_app_end_to_end(spark):
    """Drive the Flask serving app over real request/response cycles
    (reference Flask_app/main.py:14-47): /hello smoke endpoint, a hit
    with case-insensitive key matching, and the missing-key contract
    (zero-filled defaults + echoed key, HTTP 200 — never an error)."""
    flask = pytest.importorskip("flask")
    n = read_table(spark, SF_SMOKE, "nation")
    app = serving.make_flask_app(n, "n_name", {"n_regionkey": 0, "n_nationkey": -1})
    assert app is not None
    client = app.test_client()

    r = client.get("/hello")
    assert r.status_code == 200
    assert r.data == b"Hello World!"  # reference Flask_app/main.py:10-12

    first = n.first()
    hit = client.get(f"/lookup/{first['n_name'].upper()}")
    assert hit.status_code == 200
    body = hit.get_json()
    assert body["n_name"] == first["n_name"]
    assert body["n_nationkey"] == first["n_nationkey"]

    miss = client.get("/lookup/atlantis")
    assert miss.status_code == 200  # missing key is NOT an error
    assert miss.get_json() == {
        "n_regionkey": 0,
        "n_nationkey": -1,
        "n_name": "atlantis",
    }


def test_fastapi_app_end_to_end(spark):
    """Same contract over FastAPI (reference Fast_API/main.py:19-44);
    skip-gated — fastapi/starlette are absent from this image."""
    pytest.importorskip("fastapi")
    starlette_tc = pytest.importorskip("starlette.testclient")
    n = read_table(spark, SF_SMOKE, "nation")
    app = serving.make_fastapi_app(n, "n_name", {"n_regionkey": 0, "n_nationkey": -1})
    client = starlette_tc.TestClient(app)
    assert client.get("/hello").json() == {"msg": "Hello World!"}
    miss = client.get("/lookup/atlantis").json()
    assert miss == {"n_regionkey": 0, "n_nationkey": -1, "n_name": "atlantis"}
