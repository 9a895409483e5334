"""Round-3 operators: OHLC bars, per-group caps, overlapping chunking,
int8 quantization, bigram lift, degree histogram — semantics on
hand-built frames (oracle parity is covered by the catalog gate)."""

from __future__ import annotations

import pytest

import datetime as dt

from pyspark.sql import functions as F

from gcpdatapipelines_spark.operators.graph import degree_histogram
from gcpdatapipelines_spark.operators.sample import cap_per_group
from gcpdatapipelines_spark.operators.sequences import bigram_lift
from gcpdatapipelines_spark.operators.similarity import quantize_int8
from gcpdatapipelines_spark.operators.text import chunk_overlap
from gcpdatapipelines_spark.operators.timeseries import resample_ohlc

# Heavyweight parity/property sweep: slow tier (see conftest).
pytestmark = pytest.mark.slow


T0 = dt.datetime(2024, 1, 1, 9, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


class TestResampleOhlc:
    def _df(self, spark):
        rows = [
            # user 1, hour 9: open=3.0 (earliest), close=8.0, high=9, low=1
            (1, _ts(5), 10, 3.0),
            (1, _ts(20), 11, 9.0),
            (1, _ts(40), 12, 1.0),
            (1, _ts(59), 13, 8.0),
            # user 1, hour 10: single event — all four prices equal
            (1, _ts(65), 14, 4.5),
            # user 2, hour 9: same-timestamp tie broken by event_id
            (2, _ts(0), 20, 7.0),
            (2, _ts(0), 21, 2.0),
        ]
        return spark.createDataFrame(
            rows, "user_id BIGINT, ts TIMESTAMP, event_id BIGINT, value DOUBLE"
        )

    def test_bars(self, spark):
        out = resample_ohlc(
            self._df(spark), "user_id", "ts", "value", "event_id", unit="hour"
        )
        got = {(r.user_id, r.bucket.hour): r for r in out.collect()}
        b = got[(1, 9)]
        assert (b.open, b.high, b.low, b.close, b.n_events) == (3.0, 9.0, 1.0, 8.0, 4)
        assert b.vsum == 21.0
        single = got[(1, 10)]
        assert single.open == single.close == single.high == single.low == 4.5

    def test_tie_breaks_by_id(self, spark):
        out = resample_ohlc(
            self._df(spark), "user_id", "ts", "value", "event_id", unit="hour"
        )
        b = {(r.user_id, r.bucket.hour): r for r in out.collect()}[(2, 9)]
        # both events share ts; lower event_id (20) is open, higher close
        assert (b.open, b.close) == (7.0, 2.0)


class TestCapPerGroup:
    def test_cap_and_passthrough(self, spark):
        rows = [(i, "big") for i in range(20)] + [(100, "small"), (101, "small")]
        df = spark.createDataFrame(rows, "doc_id BIGINT, source STRING")
        out = cap_per_group(df, "doc_id", "source", 5)
        by_src = (
            out.groupBy("source").agg(F.count("*").alias("n")).collect()
        )
        got = {r.source: r.n for r in by_src}
        assert got == {"big": 5, "small": 2}

    def test_deterministic(self, spark):
        df = spark.createDataFrame(
            [(i, "s") for i in range(50)], "doc_id BIGINT, source STRING"
        )
        a = {r.doc_id for r in cap_per_group(df, "doc_id", "source", 7).collect()}
        b = {r.doc_id for r in cap_per_group(df, "doc_id", "source", 7).collect()}
        assert a == b and len(a) == 7


class TestChunkOverlap:
    def _doc(self, spark, n_tokens):
        text = " ".join(f"w{i:03d}" for i in range(1, n_tokens + 1))
        return spark.createDataFrame([(1, text)], "doc_id BIGINT, text STRING")

    def test_short_doc_single_chunk(self, spark):
        out = chunk_overlap(self._doc(spark, 10), "doc_id", "text", 64, 48).collect()
        assert len(out) == 1
        assert out[0].chunk_tokens == 10 and out[0].start_tok == 1

    def test_overlap_and_tail(self, spark):
        # 100 tokens, window 64 stride 48: chunks at 1 (1-64) and 49 (49-100)
        out = sorted(
            chunk_overlap(self._doc(spark, 100), "doc_id", "text", 64, 48).collect(),
            key=lambda r: r.start_tok,
        )
        assert [(r.start_tok, r.chunk_tokens) for r in out] == [(1, 64), (49, 52)]
        # the overlap region (tokens 49-64) appears in both chunks
        assert out[0].chunk_text.split()[48:] == out[1].chunk_text.split()[:16]

    def test_no_redundant_tail(self, spark):
        # 60 tokens: chunk 1 covers 1-60 entirely; start 49 must NOT emit
        out = chunk_overlap(self._doc(spark, 60), "doc_id", "text", 64, 48).collect()
        assert [(r.start_tok, r.chunk_tokens) for r in out] == [(1, 60)]


class TestQuantizeInt8:
    def test_roundtrip_and_clip(self, spark):
        df = spark.createDataFrame(
            [(1, [0.0, 1.0, -1.0, 0.5, 2.0, -3.0])],
            "vec_id BIGINT, embedding ARRAY<FLOAT>",
        )
        r = quantize_int8(df, "vec_id", "embedding", clip=1.0).collect()[0]
        # 0.5*127+0.5 = 64.0 -> floor 64; out-of-range clips to ±127
        assert r.qvec == [0, 127, -127, 64, 127, -127]
        assert r.qnorm_sq == 127 * 127 * 4 + 64 * 64
        assert r.qerr_max >= r.qerr_mean >= 0.0
        # clipped elements dominate the error: |127/127 - 2.0| = 1.0
        assert r.qerr_max == 2.0  # | -127/127 - (-3.0) |

    def test_error_small_in_range(self, spark):
        df = spark.createDataFrame(
            [(1, [0.1, -0.2, 0.33])], "vec_id BIGINT, embedding ARRAY<FLOAT>"
        )
        r = quantize_int8(df, "vec_id", "embedding", clip=1.0).collect()[0]
        assert r.qerr_max <= 0.5 / 127 + 1e-9  # half-step bound in range


class TestBigramLift:
    def test_lift_values(self, spark):
        rows = [
            (1, _ts(0), 1, "a"), (1, _ts(1), 2, "b"),
            (1, _ts(2), 3, "a"), (1, _ts(3), 4, "b"),
            (2, _ts(0), 5, "a"), (2, _ts(1), 6, "c"),
        ]
        df = spark.createDataFrame(
            rows, "user_id BIGINT, ts TIMESTAMP, event_id BIGINT, event_type STRING"
        )
        out = {(r.a, r.b): r for r in
               bigram_lift(df, "user_id", "ts", "event_type", "event_id").collect()}
        # bigrams: (a,b)x2, (b,a)x1, (a,c)x1 -> N=4
        assert out[("a", "b")].n_ab == 2
        # lift(a,b) = (2*4)/(c_a=3 * c_b=2) = 8/6
        assert abs(out[("a", "b")].lift - round(8 / 6, 6)) < 1e-9
        # lift(a,c) = (1*4)/(3*1)
        assert abs(out[("a", "c")].lift - round(4 / 3, 6)) < 1e-9


class TestOpqSampleTrained:
    def test_rotation_orthogonal_and_catalog_shape(self, spark):
        import numpy as np

        from gcpdatapipelines_spark.operators.similarity import opq_train_sample
        from gcpdatapipelines_spark.queries import sim_opq_topk

        emb = spark.createDataFrame(
            [
                (i, [float((i * 7 + j * 3) % 5) - 2.0 for j in range(16)])
                for i in range(40)
            ],
            "vec_id BIGINT, embedding ARRAY<FLOAT>",
        )
        R, cb = opq_train_sample(
            emb, sample_n=32, m=4, ksub=4, iters=1, kmeans_iter=3
        )
        assert np.allclose(R.T @ R, np.eye(16), atol=1e-8)
        assert cb.count() == 4 * 4
        out = sim_opq_topk(spark, "/root/testdata/sf0.001")
        rows = out.collect()
        assert len(rows) == 3 * 10  # 3 queries x top-10
        assert {r.q_id for r in rows} == {0, 1, 2}
        # ranks are 1..10 per query, distances non-decreasing in rank
        per_q = {}
        for r in rows:
            per_q.setdefault(r.q_id, []).append((r.rnk, r.adc_dist))
        for q, lst in per_q.items():
            lst.sort()
            assert [t[0] for t in lst] == list(range(1, 11))
            dists = [t[1] for t in lst]
            assert dists == sorted(dists)


class TestWinsorizeStats:
    def test_clamps_and_mean(self, spark):
        # 10 values 1..9 + one 1000.0 outlier, single group
        rows = [("g", float(i)) for i in range(1, 10)] + [("g", 1000.0)]
        df = spark.createDataFrame(rows, "k STRING, v DOUBLE")
        from gcpdatapipelines_spark.operators.agg import winsorize_stats

        r = winsorize_stats(df, "k", "v", 0.05, 0.95).collect()[0]
        # p95 of 1..9,1000 via the engine's exact interpolation float
        # sequence (h=(10-1)*0.95, v = lo + (h-floor(h))*(hi-lo)), then
        # floor-truncated at 4 dp (portable.trunc_dp). The truncation is
        # boundary-sensitive, so the model must share the engine's float
        # ops bit-for-bit, not an algebraic rearrangement.
        import math

        h = (10 - 1) * 0.95
        v = 9 + (h - math.floor(h)) * (1000 - 9)
        assert r.p_hi == math.floor(v * 1e4) / 1e4
        assert r.n_hi == 1 and r.n_lo == 1
        # winsorized mean uses clamped outlier, so it is far below the raw mean
        raw_mean = (sum(range(1, 10)) + 1000.0) / 10
        assert r.winsor_mean < raw_mean

    def test_no_clamping_when_uniform(self, spark):
        df = spark.createDataFrame(
            [("g", 5.0)] * 8, "k STRING, v DOUBLE"
        )
        from gcpdatapipelines_spark.operators.agg import winsorize_stats

        r = winsorize_stats(df, "k", "v").collect()[0]
        assert (r.n_lo, r.n_hi, r.winsor_mean) == (0, 0, 5.0)


class TestInvertedIndex:
    def test_postings_sorted_and_banded(self, spark):
        docs = spark.createDataFrame(
            [
                (3, "apple banana"),
                (1, "apple apple cherry"),
                (2, "apple banana durian"),
            ],
            "doc_id BIGINT, text STRING",
        )
        from gcpdatapipelines_spark.operators.text import inverted_index

        out = {r.token: r for r in
               inverted_index(docs, "doc_id", "text", min_df=2).collect()}
        # 'apple' in all 3 docs (repeats collapse), postings sorted
        assert out["apple"].df == 3 and out["apple"].postings == [1, 2, 3]
        assert out["banana"].df == 2 and out["banana"].postings == [2, 3]
        # singletons dropped by min_df
        assert "cherry" not in out and "durian" not in out

    def test_max_df_cap(self, spark):
        docs = spark.createDataFrame(
            [(i, "stop word" if i else "stop") for i in range(4)],
            "doc_id BIGINT, text STRING",
        )
        from gcpdatapipelines_spark.operators.text import inverted_index

        out = {r.token for r in
               inverted_index(docs, "doc_id", "text", 2, max_df=3).collect()}
        assert out == {"word"}  # 'stop' df=4 exceeds the cap


class TestSplitStratified:
    def test_exact_proportions_per_stratum(self, spark):
        rows = [(i, "a") for i in range(100)] + [(1000 + i, "b") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id BIGINT, source STRING")
        from gcpdatapipelines_spark.operators.sample import split_stratified

        out = split_stratified(df, "doc_id", "source", test_pct=20)
        counts = {
            (r.source, r.split): r.n
            for r in out.groupBy("source", "split").agg(F.count("*").alias("n")).collect()
        }
        assert counts[("a", "test")] == 20 and counts[("a", "train")] == 80
        # interleaved slots keep even a 10-row stratum at the ratio:
        # exactly 2 of 10 land in test (every 5th rank)
        assert counts[("b", "test")] == 2 and counts[("b", "train")] == 8

    def test_deterministic(self, spark):
        df = spark.createDataFrame(
            [(i, "s") for i in range(50)], "doc_id BIGINT, source STRING"
        )
        from gcpdatapipelines_spark.operators.sample import split_stratified

        a = {(r.doc_id, r.split) for r in split_stratified(df, "doc_id", "source").collect()}
        b = {(r.doc_id, r.split) for r in split_stratified(df, "doc_id", "source").collect()}
        assert a == b


class TestDegreeHistogram:
    def test_path_graph(self, spark):
        # path 1-2-3-4: degrees 1,2,2,1 -> {1: 2 nodes, 2: 2 nodes}
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (2, 1)], "u BIGINT, v BIGINT"
        )  # (2,1) dupes (1,2) after normalization
        got = {r.degree: r.n_nodes for r in degree_histogram(edges).collect()}
        assert got == {1: 2, 2: 2}


class TestSparseCosine:
    def test_identical_docs_most_similar(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "apple banana cherry"),
                (1, "apple banana cherry"),
                (2, "durian elderberry fig"),
                (3, "apple zebra yak"),
            ],
            "doc_id BIGINT, text STRING",
        )
        from gcpdatapipelines_spark.operators.text import sparse_cosine_topk

        out = sparse_cosine_topk(docs, "doc_id", "text", query_max_id=1, k=3)
        rows = sorted(out.collect(), key=lambda r: r.rnk)
        # doc 1 is word-identical to query doc 0 -> rank 1, cosine 1.0
        assert rows[0].doc_id == 1 and abs(rows[0].cos_sim - 1.0) < 1e-9
        # doc 2 shares no tokens -> absent from candidates entirely
        assert all(r.doc_id != 2 for r in rows)


class TestPqEncodeLiteralPath:
    def test_matches_join_path_bitwise(self, spark):
        from gcpdatapipelines_spark.io import read_table
        from gcpdatapipelines_spark.operators import similarity as S

        emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
        cb = S.pq_build_sample(emb, m=4, ksub=16)
        fast = {r.vec_id: r.code for r in S.pq_encode(emb, cb).collect()}
        join = {
            r.vec_id: r.code
            for r in S.pq_encode(emb, cb, literal_max_entries=0).collect()
        }
        assert fast == join and len(fast) > 0

    def test_literal_path_no_exchange(self, spark):
        from gcpdatapipelines_spark import plans as P
        from gcpdatapipelines_spark.io import read_table
        from gcpdatapipelines_spark.operators import similarity as S

        emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
        cb = S.pq_build_sample(emb, m=4, ksub=16)
        assert P.num_exchanges(S.pq_encode(emb, cb)) == 0


class TestApproxQuantiles:
    def test_within_rank_tolerance_of_exact(self, spark):
        from gcpdatapipelines_spark.io import read_table
        from gcpdatapipelines_spark.operators.agg import (
            approx_quantiles_per_key,
            exact_quantiles,
        )

        li = read_table(spark, "/root/testdata/sf0.001", "lineitem")
        probs = [0.25, 0.5, 0.75, 0.95]
        approx = {
            (r.l_returnflag, r.p): r.q
            for r in approx_quantiles_per_key(
                li, "l_returnflag", "l_extendedprice", probs
            ).collect()
        }
        exact = {
            (r.l_returnflag, r.p): r.l_extendedprice_q
            for r in exact_quantiles(
                li, "l_returnflag", ["l_extendedprice"], probs
            ).collect()
        }
        assert set(approx) == set(exact)
        # GK guarantees rank error <= 1/accuracy; on money values a
        # generous relative check suffices as the regression tripwire
        for k in exact:
            assert abs(approx[k] - exact[k]) <= max(0.02 * abs(exact[k]), 1.0), (
                k, approx[k], exact[k],
            )


class TestHashingFeatures:
    def test_counts_and_width(self, spark):
        from gcpdatapipelines_spark.operators.text import hashing_features

        docs = spark.createDataFrame(
            [(1, "apple apple banana"), (2, "apple")],
            "doc_id BIGINT, text STRING",
        )
        out = {r.doc_id: r.features for r in
               hashing_features(docs, "doc_id", "text", dim=16).collect()}
        assert len(out[1]) == 16 and len(out[2]) == 16
        assert sum(out[1]) == 3 and sum(out[2]) == 1
        # same token -> same slot: doc1's apple slot holds 2, doc2's 1
        import hashlib
        slot = int(hashlib.md5(b"apple").hexdigest()[:8], 16) % 16
        assert out[1][slot] == 2 and out[2][slot] == 1
