"""Property-based tests (hypothesis) for the semantics most likely to
hide edge-case bugs: pivot vs a pandas reference model, Jaccard
invariants, salted-agg equivalence."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gcpdatapipelines_spark.operators.dedup import ngram_jaccard_pairs
from gcpdatapipelines_spark.operators.pivot import transpose
from gcpdatapipelines_spark.operators.skew import salted_count_per_key

KEYS = st.integers(min_value=0, max_value=3)
CLASSES = st.sampled_from(["AAA", "BBB", "CCC"])
VALUES = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32)

ROWS = st.lists(st.tuples(KEYS, CLASSES, VALUES), min_size=1, max_size=25)

SLOW = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(rows=ROWS)
@SLOW
def test_pivot_sum_matches_pandas(spark, rows):
    """transpose(agg='sum') must agree with pandas pivot_table for any
    input, including duplicate (key, pivot) pairs and absent cells."""
    df = spark.createDataFrame(rows, "id INT, cls STRING, v DOUBLE")
    wide = transpose(df, ["id"], ["cls"], ["v"], agg="sum").toPandas()

    pdf = pd.DataFrame(rows, columns=["id", "cls", "v"])
    want = pdf.pivot_table(index="id", columns="cls", values="v", aggfunc="sum")
    for _, row in wide.iterrows():
        for cls in ("AAA", "BBB", "CCC"):
            col = f"{cls}_v"
            if col not in wide.columns:
                assert cls not in want.columns
                continue
            got = row[col]
            exp = (
                want.loc[row["id"], cls]
                if cls in want.columns and not pd.isna(want.loc[row["id"], cls])
                else None
            )
            if exp is None:
                assert got is None or pd.isna(got)
            else:
                assert got is not None and math.isclose(got, exp, rel_tol=1e-9)


@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=1, max_size=40), min_size=2, max_size=6
    )
)
@SLOW
def test_jaccard_bounds_and_symmetry(spark, texts):
    """0 < jaccard <= 1 for every emitted pair; id_1 < id_2 always;
    identical texts always score exactly 1.0."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    pairs = ngram_jaccard_pairs(df, "doc_id", "text", n=2, threshold=0.0).collect()
    for p in pairs:
        assert p["id_1"] < p["id_2"]
        assert 0.0 < p["jaccard"] <= 1.0
    scored = {(p["id_1"], p["id_2"]): p["jaccard"] for p in pairs}
    for i, a in rows:
        for j, b in rows:
            if i < j and a == b and a.strip(" "):
                assert scored.get((i, j)) == 1.0, (a, b, scored)


@given(
    keys=st.lists(st.integers(min_value=0, max_value=2), min_size=1, max_size=30),
    buckets=st.integers(min_value=1, max_value=5),
)
@SLOW
def test_salted_count_always_matches_plain(spark, keys, buckets):
    df = spark.createDataFrame([(k,) for k in keys], "k INT")
    plain = {(r["k"], r["n"]) for r in df.groupBy("k").count().withColumnRenamed("count", "n").collect()}
    salted = {
        (r["k"], r["cnt"]) for r in salted_count_per_key(df, "k", buckets, "cnt").collect()
    }
    assert plain == salted


DOC_TEXTS = st.lists(
    st.text(alphabet="ab c.x1", min_size=0, max_size=40), min_size=1, max_size=12
)


@given(texts=DOC_TEXTS, chunk=st.integers(min_value=1, max_value=16))
@SLOW
def test_pack_chunks_covers_token_stream_exactly(spark, texts, chunk):
    """For any corpus and chunk size: within a shard, doc offsets are
    contiguous (end_i == start_{i+1} in id order over non-empty docs),
    each doc appears in exactly the windows it overlaps, and no window
    index is skipped inside the shard's covered range."""
    from gcpdatapipelines_spark.operators.text import pack_chunks, token_count

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    out = pack_chunks(df, "doc_id", "text", chunk_tokens=chunk, num_shards=2)
    rows = out.collect()
    toks = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", token_count(F.col("text")).alias("n")).collect()
    }
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], {}).setdefault(
            r["doc_id"], (r["start_tok"], r["n_tok"], set())
        )[2].add(r["chunk_id"])
    for shard, docs in by_shard.items():
        expected_start = 0
        for doc_id in sorted(docs):
            start, n_tok, chunks = docs[doc_id]
            assert n_tok == toks[doc_id] > 0
            assert start == expected_start
            expected_start += n_tok
            want = set(range(start // chunk, (start + n_tok - 1) // chunk + 1))
            assert chunks == want, (doc_id, chunks, want)


EVENT_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),           # key
        st.integers(min_value=0, max_value=10_000),      # minutes offset
        st.sampled_from(["a", "b", "c"]),                # state/attr
    ),
    min_size=1,
    max_size=30,
)


def _ts_frame(spark, rows):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (k, t0 + dt.timedelta(minutes=m), s, i)
        for i, (k, m, s) in enumerate(rows)
    ]
    return spark.createDataFrame(data, "k BIGINT, ts TIMESTAMP, attr STRING, seq BIGINT")


@given(rows=EVENT_ROWS)
@SLOW
def test_keep_latest_one_row_per_key_from_input(spark, rows):
    from gcpdatapipelines_spark.operators.history import keep_latest

    df = _ts_frame(spark, rows)
    out = keep_latest(df, ["k"], "ts", "seq").collect()
    keys = {r[0] for r in rows}
    assert {r["k"] for r in out} == keys and len(out) == len(keys)
    # each winner is that key's max (ts, seq) input row
    by_key = {}
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    for i, (k, m, s) in enumerate(rows):
        t = t0 + dt.timedelta(minutes=m)
        if k not in by_key or (t, i) > by_key[k][:2]:
            by_key[k] = (t, i, s)
    for r in out:
        assert r["attr"] == by_key[r["k"]][2]


@given(rows=EVENT_ROWS)
@SLOW
def test_scd2_intervals_tile_each_keys_timeline(spark, rows):
    """Per key: intervals are chronologically contiguous (next
    valid_from == previous valid_to), exactly one open interval, and
    adjacent versions always differ in the attribute."""
    from gcpdatapipelines_spark.operators.history import keep_latest, scd2_intervals

    df = _ts_frame(spark, rows)
    one = keep_latest(df, ["k", "ts"], "ts", "seq").drop("seq")
    out = scd2_intervals(one, ["k"], "ts", ["attr"]).collect()
    per_key = {}
    for r in out:
        per_key.setdefault(r["k"], []).append(r)
    for k, ivs in per_key.items():
        ivs.sort(key=lambda r: r["valid_from"])
        opens = [r for r in ivs if r["valid_to"] is None]
        assert len(opens) == 1 and ivs[-1]["is_current"]
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["attr"] != b["attr"] or (
                a["attr"] is None) != (b["attr"] is None)


@given(rows=EVENT_ROWS)
@SLOW
def test_funnel_counts_monotone_nonincreasing(spark, rows):
    from gcpdatapipelines_spark.operators.funnel import funnel_counts

    df = _ts_frame(spark, rows).withColumnRenamed("attr", "ev")
    out = {
        r["step"]: r["n_users"]
        for r in funnel_counts(df, "k", "ts", "ev", ["a", "b", "c"]).collect()
    }
    assert out[1] >= out[2] >= out[3] >= 0


@given(rows=EVENT_ROWS)
@SLOW
def test_event_sequences_are_permutation_of_inputs(spark, rows):
    from gcpdatapipelines_spark.operators.sequences import event_sequences

    df = _ts_frame(spark, rows)
    out = {r["k"]: r["seq"] for r in event_sequences(df, "k", "ts", "attr", "seq").collect()}
    want = {}
    for k, m, s in rows:
        want.setdefault(k, []).append(s)
    assert {k: sorted(v) for k, v in out.items()} == {
        k: sorted(v) for k, v in want.items()
    }


# ---------------------------------------------------------------------------
# round-3 operators
# ---------------------------------------------------------------------------

WORDS = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
DOC_TEXT = st.lists(WORDS, min_size=1, max_size=14).map(" ".join)
DOCS = st.lists(DOC_TEXT, min_size=2, max_size=8)


@given(docs=DOCS, t=st.sampled_from([0.3, 0.5, 0.7]))
@SLOW
def test_prefix_filter_lossless_any_corpus(spark, docs, t):
    """jaccard_prefix_pairs must equal the exact all-pairs join for ANY
    corpus and threshold — the prefix theorem has no luck component."""
    from gcpdatapipelines_spark.operators.dedup import (
        jaccard_prefix_pairs,
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id BIGINT, text STRING")
    exact = {
        (r.id_1, r.id_2, r.jaccard)
        for r in ngram_jaccard_pairs(df, "doc_id", "text", 3, t).collect()
    }
    pruned = {
        (r.id_1, r.id_2, r.jaccard)
        for r in jaccard_prefix_pairs(df, "doc_id", "text", 3, t).collect()
    }
    assert pruned == exact


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
@SLOW
def test_morton_bijective_on_domain(spark, pts):
    """Distinct (x, y) pairs must get distinct z codes (interleaving is
    a bijection on the bounded domain)."""
    from gcpdatapipelines_spark.operators.layout import with_zorder_key

    df = spark.createDataFrame(pts, "x BIGINT, y BIGINT")
    out = with_zorder_key(df, ["x", "y"], bits=8).collect()
    assert len({r.z for r in out}) == len(pts)
    assert all(0 <= r.z < (1 << 16) for r in out)


@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),  # key
            st.integers(min_value=0, max_value=6),  # day offset
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=16),
        ),
        min_size=1,
        max_size=20,
    )
)
@SLOW
def test_gapfill_invariants(spark, obs):
    """For any observation set: the filled series is dense per key,
    observed rows keep their value, and gap rows copy the most recent
    observed value."""
    import datetime as dt

    from gcpdatapipelines_spark.operators.timeseries import gapfill_ffill, resample_sum

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (k, t0 + dt.timedelta(days=d, hours=1), float(v)) for k, d, v in obs
    ]
    df = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP, value DOUBLE")
    filled = gapfill_ffill(
        resample_sum(df, "user_id", "ts", "value", unit="day"), "user_id", unit="day"
    ).collect()
    by_key: dict = {}
    for r in filled:
        by_key.setdefault(r.user_id, []).append(r)
    for k, rs in by_key.items():
        rs.sort(key=lambda r: r.bucket)
        days = [r.bucket.day for r in rs]
        assert days == list(range(days[0], days[-1] + 1))  # dense span
        assert rs[0].is_gap is False  # first point observed
        last = None
        for r in rs:
            if r.is_gap:
                assert r.value == last  # copied forward
            last = r.value
