"""Multimodal plumbing: binary schema, Arrow-batched decode stub,
frame sampling, byte-aware partitioning."""

from __future__ import annotations

from gcpdatapipelines_spark.io import read_table
from gcpdatapipelines_spark.operators import multimodal as M
from tests.conftest import SF_SMOKE


def _assets(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    return M.text_to_fake_assets(docs)


def test_fake_assets_schema(spark):
    a = _assets(spark)
    assert dict(a.dtypes) == {
        "asset_id": "bigint",
        "kind": "string",
        "payload": "binary",
        "meta": "map<string,string>",
    }
    kinds = {r["kind"] for r in a.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_is_deterministic_and_total(spark):
    a = _assets(spark)
    d1 = {r["asset_id"]: r["checksum"] for r in M.decode_assets(a).collect()}
    d2 = {r["asset_id"]: r["checksum"] for r in M.decode_assets(a).collect()}
    assert d1 == d2
    assert len(d1) == a.count()


def test_decode_feature_typing(spark):
    rows = M.decode_assets(_assets(spark)).collect()
    for r in rows:
        if r["kind"] == "image":
            assert r["width"] is not None and r["duration_s"] is None
        else:
            assert r["width"] is None and r["duration_s"] is not None
        assert r["n_bytes"] > 0


def test_frame_sample_counts_follow_duration(spark):
    a = _assets(spark)
    decoded = {r["asset_id"]: r for r in M.decode_assets(a).collect() if r["kind"] == "video"}
    frames = M.frame_sample_stub(a, every_s=1.0)
    counts = frames.groupBy("asset_id").count().collect()
    for row in counts:
        dur = decoded[row["asset_id"]]["duration_s"]
        assert row["count"] == max(int(dur), 1)


def test_repartition_for_blobs_preserves_rows(spark):
    a = _assets(spark)
    out = M.repartition_for_blobs(a, target_partition_bytes=10_000)
    assert out.count() == a.count()
    assert out.rdd.getNumPartitions() >= 1


def test_resize_stub_aspect_preserving(spark):
    from gcpdatapipelines_spark.operators import multimodal as MM

    out = MM.resize_stub(_assets(spark), max_dim=256).collect()
    assert out, "no image assets?"
    for r in out:
        assert 1 <= r["out_width"] <= 256 and 1 <= r["out_height"] <= 256
        # exact contract: scale = min(1, 256/max(w,h)), floor to int, min 1
        scale = min(1.0, 256 / max(r["width"], r["height"], 1))
        assert r["out_width"] == max(int(r["width"] * scale), 1)
        assert r["out_height"] == max(int(r["height"] * scale), 1)
        if r["width"] <= 256 and r["height"] <= 256:
            assert (r["out_width"], r["out_height"]) == (r["width"], r["height"])
