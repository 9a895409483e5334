"""Similarity-search semantics: brute-force exactness, IVF recall."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gcpdatapipelines_spark.io import read_table
from gcpdatapipelines_spark.operators import similarity as S
from tests.conftest import SF_SMOKE


def test_brute_force_known_nearest(spark):
    vecs = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[0.9, 0.1]),
            Row(vec_id=2, embedding=[0.0, 1.0]),
        ]
    )
    qs = vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = S.brute_force_topk(vecs, qs, k=2).collect()
    assert [r["vec_id"] for r in sorted(out, key=lambda r: r["rnk"])] == [1, 2]
    assert out[0]["sim"] <= 1.0


def test_cosine_self_is_one(spark):
    df = spark.createDataFrame([Row(v=[3.0, 4.0])])
    val = df.select(F.round(S.cosine(F.col("v"), F.col("v")), 6).alias("c")).collect()[0]["c"]
    assert val == 1.0


@pytest.mark.slow
def test_embedding_neardup_threshold(spark):
    vecs = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[1.0, 0.001]),
            Row(vec_id=2, embedding=[0.0, 1.0]),
        ]
    )
    pairs = S.embedding_neardup_pairs(vecs, threshold=0.99).collect()
    assert {(p["id_1"], p["id_2"]) for p in pairs} == {(0, 1)}


def test_ivf_recall_vs_brute_force(spark):
    """IVF with nprobe=4/nlist=8 must recover a decent fraction of the
    exact top-10 on the fixture embeddings (recall floor deliberately
    loose — the centroid sample is a stand-in, not k-means)."""
    emb = read_table(spark, SF_SMOKE, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {
        (r["q_id"], r["vec_id"])
        for r in S.brute_force_topk(emb, qs, k=10).collect()
    }
    assignments, centroids = S.ivf_build(emb, nlist=8)
    approx = {
        (r["q_id"], r["vec_id"])
        for r in S.ivf_topk(assignments, centroids, qs, k=10, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall@10 {recall:.2f} unexpectedly low"


def test_ivf_assignment_covers_all_vectors(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    assignments, centroids = S.ivf_build(emb, nlist=8)
    assert assignments.count() == emb.count()
    assert centroids.count() == 8


def test_ivf_kmeans_recall_at_least_sample(spark):
    """Trained centroids must not lose to the naive sample quantizer
    (and typically beat it) at the same nlist/nprobe."""
    emb = read_table(spark, SF_SMOKE, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {
        (r["q_id"], r["vec_id"]) for r in S.brute_force_topk(emb, qs, k=10).collect()
    }

    def recall(build_fn):
        assignments, centroids = build_fn(emb, nlist=8)
        approx = {
            (r["q_id"], r["vec_id"])
            for r in S.ivf_topk(assignments, centroids, qs, k=10, nprobe=4).collect()
        }
        return len(exact & approx) / len(exact)

    r_sample = recall(S.ivf_build)
    r_kmeans = recall(S.ivf_build_kmeans)
    assert r_kmeans >= max(r_sample - 0.1, 0.3), (r_kmeans, r_sample)


def test_codegen_neardup_bit_identical_to_lambda(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    lam = {
        (r["id_1"], r["id_2"]): r["sim"]
        for r in S.embedding_neardup_pairs(emb, threshold=0.3).collect()
    }
    cg = {
        (r["id_1"], r["id_2"]): r["sim"]
        for r in S.embedding_neardup_pairs_codegen(emb, threshold=0.3).collect()
    }
    assert lam == cg and lam


def test_pruned_equals_exact_on_fixture(spark):
    """The pruned default must be bit-identical to the exact O(n^2)
    scan — the soundness guarantee users rely on."""
    emb = read_table(spark, SF_SMOKE, "embeddings")
    exact = {
        (r["id_1"], r["id_2"]): r["sim"]
        for r in S.embedding_neardup_pairs_codegen(emb, threshold=0.3).collect()
    }
    pruned = {
        (r["id_1"], r["id_2"]): r["sim"]
        for r in S.embedding_neardup_pairs_pruned(emb, threshold=0.3, nlist=16).collect()
    }
    assert pruned == exact and pruned


def _clustered_vectors(spark, per_cluster=40, dim=8):
    """Three tight clusters around orthogonal axes + planted near-dups;
    at threshold 0.95 only intra-cluster pairs qualify, so cross-axis
    cell pairs are provably prunable."""
    rows = []
    vid = 0
    # interleave clusters across ids so the lowest-id centroid sample
    # (the deterministic quantizer) spans all clusters
    for i in range(per_cluster):
        for axis in range(3):
            v = [0.0] * dim
            v[axis] = 1.0
            v[(axis + 3) % dim] = 0.001 * (i % 7)  # tiny jitter
            rows.append((vid, v))
            vid += 1
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")


@pytest.mark.slow
def test_pruned_equals_exact_clustered_high_threshold(spark):
    vecs = _clustered_vectors(spark)
    exact = {
        (r["id_1"], r["id_2"]): r["sim"]
        for r in S.embedding_neardup_pairs(vecs, threshold=0.95).collect()
    }
    pruned = {
        (r["id_1"], r["id_2"]): r["sim"]
        for r in S.embedding_neardup_pairs_pruned(vecs, threshold=0.95, nlist=6).collect()
    }
    assert pruned == exact and pruned


def test_cell_pair_pruning_actually_prunes(spark):
    """On clustered data at a near-dup threshold the candidate cell
    pairs must be a strict subset of all nlist^2 pairs — the operator
    must not silently degrade to an all-pairs scan."""
    vecs = _clustered_vectors(spark)
    _, cells = S._cell_index(vecs, "vec_id", "embedding", 6)
    n_cells = cells.count()
    n_pairs = S._candidate_cell_pairs(cells, 0.95).count()
    assert n_pairs < n_cells * n_cells, (n_pairs, n_cells)


@pytest.mark.slow
def test_pruned_with_trained_centroids_equals_exact(spark):
    """Trained (k-means) centroids only change PRUNING POWER, never
    the result — equality with the exact scan must hold for any
    centroid frame."""
    vecs = _clustered_vectors(spark)
    _, centroids = S.ivf_build_kmeans(vecs, nlist=4)
    exact = {
        (r["id_1"], r["id_2"]): r["sim"]
        for r in S.embedding_neardup_pairs(vecs, threshold=0.95).collect()
    }
    pruned = {
        (r["id_1"], r["id_2"]): r["sim"]
        for r in S.embedding_neardup_pairs_pruned(
            vecs, threshold=0.95, nlist=4, centroids=centroids
        ).collect()
    }
    assert pruned == exact and pruned


def test_pq_codebook_and_code_shapes(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    cb = S.pq_build(emb, m=8, ksub=16, max_iter=5)
    assert cb.count() == 8 * 16
    codes = S.pq_encode(emb, cb)
    row = codes.first()
    assert len(row["code"]) == 8
    assert all(0 <= c < 16 for c in row["code"])
    assert codes.count() == emb.count()


def test_pq_identical_vectors_share_codes(spark):
    from pyspark.sql import Row

    base = [float(i % 7) / 7 for i in range(16)]
    vecs = spark.createDataFrame(
        [Row(vec_id=0, embedding=base), Row(vec_id=1, embedding=base),
         Row(vec_id=2, embedding=[x + 3.0 for x in base])]
    )
    cb = S.pq_build(vecs, m=4, ksub=2, max_iter=5)
    codes = {r["vec_id"]: r["code"] for r in S.pq_encode(vecs, cb).collect()}
    assert codes[0] == codes[1]


@pytest.mark.slow
def test_pq_topk_recall_vs_exact_l2(spark):
    """ADC ranking must recover a meaningful slice of the exact
    squared-L2 top-10 (random-ish fixture embeddings are the hard
    case for PQ; chance level is 10/500 = 0.02)."""
    from pyspark.sql import Window

    emb = read_table(spark, SF_SMOKE, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cb = S.pq_build(emb, m=8, ksub=16, max_iter=10)
    codes = S.pq_encode(emb, cb)
    approx = {
        (r["q_id"], r["vec_id"]) for r in S.pq_topk(codes, cb, qs, k=10).collect()
    }
    v = emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    q = qs.select("q_id", F.transform("q_vec", lambda x: x.cast("double")).alias("q"))
    d = (
        v.crossJoin(F.broadcast(q))
        .select("q_id", "vec_id", S._sq_l2(F.col("q"), F.col("v")).alias("d2"))
        .filter(F.col("q_id") != F.col("vec_id"))
    )
    w = Window.partitionBy("q_id").orderBy("d2", "vec_id")
    exact = {
        (r["q_id"], r["vec_id"])
        for r in d.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= 10).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.2, f"PQ recall@10 {recall:.2f} below floor"


def test_srp_signatures_shape_and_determinism(spark):
    vecs = _clustered_vectors(spark)
    s1 = S.srp_signatures(vecs, nbits=16, bands=4, seed=7)
    assert s1.columns == ["vec_id", "band_0", "band_1", "band_2", "band_3"]
    rows = {r["vec_id"]: tuple(r)[1:] for r in s1.collect()}
    rows2 = {
        r["vec_id"]: tuple(r)[1:]
        for r in S.srp_signatures(vecs, nbits=16, bands=4, seed=7).collect()
    }
    assert rows == rows2  # seeded hyperplanes -> reproducible plans
    # 4 bits per band
    assert all(0 <= b <= 15 for sig in rows.values() for b in sig)


def test_srp_rejects_uneven_bands(spark):
    vecs = _clustered_vectors(spark)
    import pytest

    with pytest.raises(ValueError):
        S.srp_signatures(vecs, nbits=10, bands=4)


@pytest.mark.slow
def test_srp_lsh_pairs_subset_and_recall(spark):
    """Verified SRP candidates must be a SUBSET of the exact pair set
    (precision 1.0 by construction) with near-total recall at a
    near-dup threshold on clustered data."""
    vecs = _clustered_vectors(spark)
    exact = {
        (r["id_1"], r["id_2"]): r["sim"]
        for r in S.embedding_neardup_pairs(vecs, threshold=0.95).collect()
    }
    got = {
        (r["id_1"], r["id_2"]): r["sim"]
        for r in S.srp_lsh_pairs(vecs, threshold=0.95, nbits=32, bands=8, seed=42).collect()
    }
    assert set(got) <= set(exact)
    assert len(got) >= 0.9 * len(exact) and exact
    # verified sims are the SAME exact scorer -> values match exactly
    assert all(exact[k] == v for k, v in got.items())


def test_srp_max_bucket_caps_degenerate_bands(spark):
    """With a tiny cap every bucket (three 40-member clusters sharing
    band keys) trips the guardrail and the candidate set empties —
    the cap is a real cost ceiling, not advisory."""
    vecs = _clustered_vectors(spark)
    got = S.srp_lsh_pairs(vecs, threshold=0.95, max_bucket=2).count()
    assert got == 0


def _correlated_vecs(spark, n=400, dim=16, seed=7):
    """Synthetic worst case for contiguous-subspace PQ: strongly
    decaying per-dim energy mixed by a fixed dense rotation, so the
    identity subspace split quantizes badly until OPQ un-mixes it."""
    import numpy as np

    rng = np.random.default_rng(seed)
    scales = np.exp(-np.arange(dim) / 2.0)
    Z = rng.standard_normal((n, dim)) * scales
    Q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    X = Z @ Q
    return spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )


def _mse(spark, vecs, R, cb):
    import numpy as np

    rot = S.rotate_vectors(vecs, R)
    recon = S.pq_decode(S.pq_encode(rot, cb), cb)
    joined = rot.join(recon, "vec_id").select(
        S._sq_l2(F.col("embedding"), F.col("recon")).alias("e")
    )
    return joined.agg(F.avg("e")).first()[0]


@pytest.mark.slow
def test_opq_rotation_is_orthogonal(spark):
    import numpy as np

    vecs = _correlated_vecs(spark)
    R, cb = S.opq_train(vecs, m=4, ksub=8, iters=1, kmeans_iter=5)
    assert np.allclose(R.T @ R, np.eye(16), atol=1e-8)
    assert cb.count() == 4 * 8


@pytest.mark.slow
def test_opq_beats_plain_pq_on_correlated_data(spark):
    """The learned rotation must cut reconstruction MSE vs identity-
    rotation PQ on dimension-mixed data — the objective OPQ directly
    minimizes (Ge et al. 2013, Table 1 shape)."""
    import numpy as np

    vecs = _correlated_vecs(spark)
    cb_plain = S.pq_build(vecs, m=4, ksub=8, max_iter=10)
    mse_plain = _mse(spark, vecs, np.eye(16), cb_plain)
    R, cb_opq = S.opq_train(vecs, m=4, ksub=8, iters=2, kmeans_iter=10)
    mse_opq = _mse(spark, vecs, R, cb_opq)
    assert mse_opq < mse_plain * 0.9, (mse_opq, mse_plain)


def test_pq_decode_roundtrip_exact_on_centroids(spark):
    """A vector that IS a concatenation of centroids reconstructs
    exactly: encode->decode is lossless at the codebook points."""
    from pyspark.sql import Row

    base = [float(i % 5) for i in range(16)]
    far = [x + 10.0 for x in base]
    vecs = spark.createDataFrame(
        [Row(vec_id=0, embedding=base), Row(vec_id=1, embedding=far)]
    )
    cb = S.pq_build(vecs, m=4, ksub=2, max_iter=5)
    recon = {
        r["vec_id"]: r["recon"]
        for r in S.pq_decode(S.pq_encode(vecs, cb), cb).collect()
    }
    assert [round(x, 9) for x in recon[0]] == base
    assert [round(x, 9) for x in recon[1]] == far


def test_label_centroids_match_numpy(spark):
    import numpy as np

    emb = read_table(spark, SF_SMOKE, "embeddings")
    got = S.label_centroids_long(emb, "label", "embedding").toPandas()
    pdf = emb.toPandas()
    for label, grp in pdf.groupby("label"):
        want = np.mean(np.stack(grp["embedding"].map(np.asarray)), axis=0)
        g = got[got["label"] == label].sort_values("pos")["mean_val"].to_numpy()
        assert np.allclose(g, want, atol=2e-6), label


def test_pack_centroids_roundtrip(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    long = S.label_centroids_long(emb, "label", "embedding")
    packed = {r["label"]: r["centroid"] for r in S.pack_centroids(long).collect()}
    dim = len(emb.select("embedding").first()[0])
    assert all(len(v) == dim for v in packed.values())
    # spot-check one label against the long form
    some = sorted(packed)[0]
    want = [
        r["mean_val"]
        for r in long.filter(F.col("label") == some).orderBy("pos").collect()
    ]
    assert packed[some] == want


def test_norm_stats_bounds(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    out = S.norm_stats_per_label(emb, "label", "embedding").collect()
    assert out
    for r in out:
        assert 0 < r["min_norm"] <= r["mean_norm"] <= r["max_norm"]


@pytest.mark.slow
def test_opq_end_to_end_retrieval_via_pq_topk(spark):
    """The full OPQ query path — encode rotated corpus, rotate the
    queries the same way, ADC top-k — must beat (or match) plain PQ's
    recall@10 vs exact L2 on dimension-mixed data."""
    import numpy as np

    vecs = _correlated_vecs(spark)
    queries = vecs.limit(8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )

    def exact_topk():
        got = {}
        pdf = vecs.toPandas()
        X = np.stack(pdf["embedding"].map(np.asarray))
        ids = pdf["vec_id"].to_numpy()
        for q in queries.collect():
            qv = np.asarray(q["q_vec"])
            d = ((X - qv) ** 2).sum(axis=1)
            order = np.argsort(d, kind="stable")
            got[q["q_id"]] = {
                int(ids[i]) for i in order if ids[i] != q["q_id"]
            } and {int(ids[i]) for i in order[:11] if ids[i] != q["q_id"]}
        return got

    def recall(codes, cb, qdf):
        want = exact_topk()
        got = S.pq_topk(codes, cb, qdf, k=10)
        hits = tot = 0
        rows = got.collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["q_id"], set()).add(r["vec_id"])
        for qid, w in want.items():
            w = set(list(w)[:10])
            hits += len(w & by_q.get(qid, set()))
            tot += len(w)
        return hits / tot

    cb_plain = S.pq_build(vecs, m=4, ksub=8, max_iter=10)
    r_plain = recall(S.pq_encode(vecs, cb_plain), cb_plain, queries)

    R, cb_opq = S.opq_train(vecs, m=4, ksub=8, iters=2, kmeans_iter=10)
    rot_corpus = S.rotate_vectors(vecs, R)
    rot_queries = S.rotate_vectors(queries, R, id_col="q_id", vec_col="q_vec")
    r_opq = recall(S.pq_encode(rot_corpus, cb_opq), cb_opq, rot_queries)

    # rotation is distance-preserving, so exact neighbors are unchanged;
    # OPQ codes approximate those distances better on mixed dims
    assert r_opq >= r_plain - 0.02, (r_opq, r_plain)
    # sanity floor: far above chance (10/400 = 0.025) for 8-centroid,
    # 4-subspace codes on 16 dims — absolute recall is codebook-bounded
    assert r_opq > 0.3, r_opq


def test_pq_build_sample_contract_and_determinism(spark):
    from gcpdatapipelines_spark.operators.similarity import (
        pq_build_sample,
        pq_encode,
        pq_topk,
    )

    emb_small = read_table(spark, SF_SMOKE, "embeddings")
    cb = pq_build_sample(emb_small, m=4, ksub=4)
    rows = cb.collect()
    # m*ksub rows, dsub-length centroids, ids in range
    assert len(rows) == 16
    assert all(len(r.cent_vec) == len(emb_small.first().embedding) // 4 for r in rows)
    assert {r.sub_id for r in rows} == {0, 1, 2, 3}
    assert {r.cent_id for r in rows} == {0, 1, 2, 3}
    # centroid j == subvector of the j-th lowest-id vector
    low = [r.embedding for r in emb_small.orderBy("vec_id").limit(4).collect()]
    d = len(low[0]) // 4
    for r in rows:
        want = [float(x) for x in low[r.cent_id][r.sub_id * d:(r.sub_id + 1) * d]]
        assert r.cent_vec == want
    # the ADC pipeline runs on the sample codebook with the same contract
    codes = pq_encode(emb_small, cb)
    qs = emb_small.limit(1).selectExpr("vec_id AS q_id", "embedding AS q_vec")
    out = pq_topk(codes, cb, qs, k=3).collect()
    assert len(out) == 3 and [r.rnk for r in out] == [1, 2, 3]


# ---------------------------------------------------------------------------
# hard_negatives
# ---------------------------------------------------------------------------

from gcpdatapipelines_spark.operators.similarity import hard_negatives  # noqa: E402


def test_hard_negatives_excludes_same_label_and_ranks(spark):
    rows = [
        (1, [1.0, 0.0], 0),   # anchor
        (2, [0.99, 0.1], 0),  # same label: excluded though nearest
        (3, [0.9, 0.4], 1),   # hardest negative
        (4, [0.0, 1.0], 1),   # easy negative
    ]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>, label INT")
    qs = emb.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    out = hard_negatives(emb, qs, k=2).collect()
    assert [(r.vec_id, r.rnk) for r in out] == [(3, 1), (4, 2)]
    assert all(r.vec_id != 2 for r in out)


# ---------------------------------------------------------------------------
# diverse_kcenter
# ---------------------------------------------------------------------------

from gcpdatapipelines_spark.operators.similarity import diverse_kcenter  # noqa: E402


def test_diverse_kcenter_picks_the_spread(spark):
    # two tight clusters + one outlier: k=3 must take one per group
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 1: never picked at k=3
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.999, 0.01]),   # near-dup of 3
        (5, [0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    out = diverse_kcenter(emb, k=3).collect()
    picked = {r.vec_id for r in out}
    assert out[0].vec_id == 1 and out[0].rank == 0  # deterministic seed
    assert picked == {1, 3, 5} or picked == {1, 5, 3}
    assert 2 not in picked and 4 not in picked
    # each later pick records its similarity to the already-selected set
    assert all(r.max_cos_to_prior is not None for r in out if r.rank > 0)


@pytest.mark.slow
def test_diverse_kcenter_deterministic_under_partitioning(spark):
    rows = [(i, [float((i * 7) % 5), float((i * 3) % 4), 1.0]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    a = [(r.rank, r.vec_id) for r in diverse_kcenter(emb, k=5).collect()]
    b = [(r.rank, r.vec_id) for r in diverse_kcenter(emb.repartition(9), k=5).collect()]
    assert a == b


def test_diverse_kcenter_portable_agrees_with_dgemm_tier(spark):
    """The portable (codegen literal-scan) tier selects the SAME
    traversal as the Arrow-dgemm production tier on the fixture — the
    two differ only in float summation order, which the 9-dp
    truncation + id tiebreak absorbs."""
    from gcpdatapipelines_spark.operators.similarity import diverse_kcenter_portable

    emb = read_table(spark, SF_SMOKE, "embeddings")
    a = [(r.rank, r.vec_id) for r in diverse_kcenter(emb, k=5).collect()]
    b = [(r.rank, r.vec_id) for r in diverse_kcenter_portable(emb, k=5).collect()]
    assert a == b


def test_diverse_kcenter_portable_partitioning_invariant(spark):
    from gcpdatapipelines_spark.operators.similarity import diverse_kcenter_portable

    emb = read_table(spark, SF_SMOKE, "embeddings")
    a = [
        (r.rank, r.vec_id, r.max_cos_to_prior)
        for r in diverse_kcenter_portable(emb, k=4).collect()
    ]
    b = [
        (r.rank, r.vec_id, r.max_cos_to_prior)
        for r in diverse_kcenter_portable(emb.repartition(9), k=4).collect()
    ]
    assert a == b


# ---------------------------------------------------------------------------
# SemDeDup within-cell pair scan (the scale-safe semantic-dedup recipe)
# ---------------------------------------------------------------------------

from gcpdatapipelines_spark.operators.similarity import (  # noqa: E402
    embedding_neardup_pairs_codegen,
    semdedup_pairs_seeded,
)


def _interleaved_cluster_vecs(spark, n_clusters=4, per_cluster=20, dim=8):
    """Tight unit clusters with ids INTERLEAVED across clusters, so the
    nlist lowest-id seed vectors cover every cluster and the seeded
    quantizer maps each cluster to its own cell."""
    import math

    rows = []
    for j in range(per_cluster):
        for c in range(n_clusters):
            base = [1.0 if i == c else 0.0 for i in range(dim)]
            eps = 0.001 * (j % 7)
            v = [x + (eps if i == (c + 1) % dim else 0.0) for i, x in enumerate(base)]
            nrm = math.sqrt(sum(x * x for x in v))
            rows.append((j * n_clusters + c, [x / nrm for x in v]))
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")


@pytest.mark.slow
def test_semdedup_equals_exact_when_cells_cover_clusters(spark):
    """With seeds covering every cluster and a near-dup threshold, all
    qualifying pairs are intra-cluster == intra-cell, so the SemDeDup
    approximation loses nothing and matches the exact O(n^2) scan."""
    vecs = _interleaved_cluster_vecs(spark)
    got = {
        (r.id_1, r.id_2)
        for r in semdedup_pairs_seeded(vecs, threshold=0.95, nlist=4).collect()
    }
    want = {
        (r.id_1, r.id_2)
        for r in embedding_neardup_pairs_codegen(vecs, threshold=0.95).collect()
    }
    assert got == want and len(want) > 0


@pytest.mark.slow
def test_semdedup_is_subset_of_exact_on_diffuse_data(spark):
    """On diffuse data (no cluster structure) the within-cell scan is a
    SUBSET of the exact pairs (pure precision, recall = the documented
    approximation) — never a false positive."""
    rows = [
        (i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(6)])
        for i in range(60)
    ]
    vecs = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    got = {
        (r.id_1, r.id_2)
        for r in semdedup_pairs_seeded(vecs, threshold=0.8, nlist=8).collect()
    }
    want = {
        (r.id_1, r.id_2)
        for r in embedding_neardup_pairs_codegen(vecs, threshold=0.8).collect()
    }
    assert got <= want and len(want) > 0


def test_semdedup_deterministic_under_partitioning(spark):
    vecs = _interleaved_cluster_vecs(spark)
    a = sorted(
        (r.id_1, r.id_2, r.sim)
        for r in semdedup_pairs_seeded(vecs, threshold=0.95, nlist=4).collect()
    )
    b = sorted(
        (r.id_1, r.id_2, r.sim)
        for r in semdedup_pairs_seeded(
            vecs.repartition(7), threshold=0.95, nlist=4
        ).collect()
    )
    assert a == b and a
