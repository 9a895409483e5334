"""Similarity search over embedding columns (north-star extension;
fixture table ``embeddings`` with array<float> vectors).

Two tiers:

- brute-force cosine top-k: the correctness baseline. Query vectors are
  broadcast; the scan side computes dot products with built-in
  higher-order functions (zip_with/aggregate — JVM-side, codegen'd, no
  Python). Cost O(n_queries * n_vectors): right up to ~10^4 queries at
  100 TB scan widths, and the oracle-checkable reference for recall.

- IVF (inverted-file) top-k: the scale path. A deterministic coarse
  quantizer (centroid sample) partitions vectors into nlist cells;
  queries probe only the nprobe nearest cells, cutting the scanned
  fraction to ~nprobe/nlist. Same scoring expressions; candidate set
  differs, so recall<1.0 — measured against brute force in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_unit_vectors(df: DataFrame, vec_col: str, out_col: str = "unit_vec") -> DataFrame:
    """Pre-normalize vectors (cast to double, divide by L2 norm) so
    cosine reduces to a dot product at query time."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn(out_col, F.transform(v, lambda x: x / _norm(v)))


def _with_vec_norm(df: DataFrame, vec_col: str, out_vec: str, out_norm: str) -> DataFrame:
    """Cast to float64 and attach the L2 norm ONCE per vector. Pair
    scoring then costs a single dot product: cosine(a,b) =
    dot(a,b)/(norm_a*norm_b), arithmetically identical to computing the
    norms inline (same sqrt-of-sequential-self-dot), but O(n) instead
    of O(n^2) norm evaluations across a pair join."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn(out_vec, v).withColumn(out_norm, _norm(F.col(out_vec)))


def cosine(a, b):
    """Cosine similarity of two array columns, computed in float64."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    return _dot(da, db) / (_norm(da) * _norm(db))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k per query vector.

    queries is broadcast (it is small by construction); ranking is a
    per-query window — one shuffle on q_id, k rows kept per query.
    Deterministic: similarity rounded to 6 digits before ranking, id
    tiebreak."""
    v = _with_vec_norm(vectors, vec_col, "__v", "__vn")
    q = _with_vec_norm(queries, q_vec_col, "__q", "__qn")
    joined = v.crossJoin(F.broadcast(q))
    scored = joined.select(
        q_id_col,
        id_col,
        F.round(
            _dot(F.col("__q"), F.col("__v")) / (F.col("__qn") * F.col("__vn")), 6
        ).alias("sim"),
    )
    if exclude_self:
        scored = scored.filter(F.col(q_id_col) != F.col(id_col))
    from pyspark.sql import Window

    w = Window.partitionBy(q_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(q_id_col, id_col, "sim", "rnk")
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_1 < id_2, sim >=
    threshold). O(n^2) scoring — correct baseline; at scale restrict
    candidates first (IVF cells or LSH buckets) and reuse the same
    scoring. Norms are precomputed per vector (not per pair), so each
    pair costs exactly one dot product."""
    vn = _with_vec_norm(vectors, vec_col, "__v", "__vn")
    a = vn.select(
        F.col(id_col).alias("id_1"), F.col("__v").alias("v1"), F.col("__vn").alias("n1")
    )
    b = vn.select(
        F.col(id_col).alias("id_2"), F.col("__v").alias("v2"), F.col("__vn").alias("n2")
    )
    pairs = a.crossJoin(b).filter(F.col("id_1") < F.col("id_2"))
    return (
        pairs.select(
            "id_1",
            "id_2",
            F.round(
                _dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")), 6
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def embedding_neardup_pairs_codegen(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int | None = None,
) -> DataFrame:
    """Exact near-dup pair scan with the dot product unrolled into
    scalar column arithmetic.

    Higher-order functions (aggregate/zip_with) are interpreted per
    element — outside whole-stage codegen. Widening the fixed-dim
    vector into dim scalar columns turns the pair score into a plain
    arithmetic expression that codegen compiles, ~2x faster and far
    less variant than the lambda form at sf0.1. The addition chain is
    left-to-right exactly like the sequential list fold, so results
    stay bit-identical to embedding_neardup_pairs and the DuckDB
    oracle.

    Side effect: disables spark.sql.constraintPropagation for the
    session — Catalyst's constraint inference is super-linear in the
    depth of the 64-term arithmetic chain and stalls the optimizer;
    the conf only affects optimization effort, never results."""
    vectors.sparkSession.conf.set("spark.sql.constraintPropagation.enabled", "false")
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    wide = vectors.select(
        id_col,
        *[F.col(vec_col).getItem(i).cast("double").alias(f"e{i}") for i in range(dim)],
    )
    self_dot = sum_chain = None
    for i in range(dim):
        term = F.col(f"e{i}") * F.col(f"e{i}")
        self_dot = term if self_dot is None else self_dot + term
    wide = wide.withColumn("nrm", F.sqrt(self_dot))

    a = wide.select(
        F.col(id_col).alias("id_1"),
        F.col("nrm").alias("n1"),
        *[F.col(f"e{i}").alias(f"a{i}") for i in range(dim)],
    )
    b = wide.select(
        F.col(id_col).alias("id_2"),
        F.col("nrm").alias("n2"),
        *[F.col(f"e{i}").alias(f"b{i}") for i in range(dim)],
    )
    pair_dot = None
    for i in range(dim):
        term = F.col(f"a{i}") * F.col(f"b{i}")
        pair_dot = term if pair_dot is None else pair_dot + term
    return (
        a.crossJoin(b)
        .filter(F.col("id_1") < F.col("id_2"))
        .select(
            "id_1",
            "id_2",
            F.round(pair_dot / (F.col("n1") * F.col("n2")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def neardup_pairs_blas(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """BLAS path for the pair scan: the full (small) vector matrix is
    broadcast as numpy; each Arrow batch of rows computes
    block @ matrix.T in one dgemm and emits pairs over threshold.

    Same O(n^2) math as embedding_neardup_pairs but ~vectorized-C per
    block instead of an interpreted per-element expression — this is
    the shape to use when the pair space is already candidate-pruned
    (IVF cell or LSH bucket) and the per-bucket matrix fits an
    executor. Results can differ from the JVM version only in the last
    float bits (BLAS reassociates the dot-product sum), hence rows-only
    in the oracle catalog; equivalence is unit-tested with tolerance."""
    import numpy as np

    rows = vectors.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sc = vectors.sparkSession.sparkContext
    b_ids, b_mat = sc.broadcast(ids), sc.broadcast(mat)

    def run(batches):
        import pandas as pd

        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            block = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            block /= np.linalg.norm(block, axis=1, keepdims=True)
            sims = block @ all_mat.T
            bid = pdf[id_col].to_numpy()
            bi, aj = np.nonzero(sims >= threshold)
            keep = bid[bi] < all_ids[aj]
            yield pd.DataFrame(
                {
                    "id_1": bid[bi][keep],
                    "id_2": all_ids[aj][keep],
                    "sim": np.round(sims[bi, aj][keep], 6),
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        run, schema="id_1 BIGINT, id_2 BIGINT, sim DOUBLE"
    )


def ivf_build_kmeans(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """IVF with k-means|| centroids (Spark ML KMeans, fixed seed):
    trained cells are balanced around the data's actual structure, so
    probing nprobe cells recovers more of the true top-k than the
    sample quantizer at the same scan fraction. Same (assignments,
    centroids) contract as ivf_build; recall is compared in tests."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = vectors.withColumn(
        "__features", array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double")))
    )
    model = KMeans(k=nlist, seed=seed, featuresCol="__features", predictionCol="__cell").fit(
        feats
    )
    centroids = vectors.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cent_id INT, cent_vec ARRAY<DOUBLE>",
    )
    assignments = (
        model.transform(feats)
        .select(id_col, vec_col, F.col("__cell").alias("cent_id"))
    )
    return assignments, centroids


def ivf_build(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF index: centroids = the nlist lowest-id vectors
    (a seeded sample stand-in; ivf_build_kmeans is the trained
    upgrade — the assignment/probe machinery is identical). Returns
    (assignments, centroids); assignments carry each vector's
    nearest-centroid id."""
    centroids = (
        vectors.orderBy(id_col)
        .limit(nlist)
        .select(
            F.col(id_col).alias("cent_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cent_vec"),
        )
    )
    vn = _with_vec_norm(vectors, vec_col, "__v", "__vn")
    cn = centroids.withColumn("__cn", _norm(F.col("cent_vec")))
    scored = vn.crossJoin(F.broadcast(cn)).select(
        id_col,
        vec_col,
        "cent_id",
        (_dot(F.col("__v"), F.col("cent_vec")) / (F.col("__vn") * F.col("__cn"))).alias("cs"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("cs").desc(), F.col("cent_id"))
    assignments = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(id_col, vec_col, "cent_id")
    )
    return assignments, centroids


def ivf_topk(
    assignments: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    k: int = 10,
    nprobe: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """ANN top-k: score each query against only the vectors in its
    nprobe nearest IVF cells. The cell join is an equi-join on cent_id,
    so the big side shuffles once on cell id — the scanned fraction is
    ~nprobe/nlist instead of 1."""
    from pyspark.sql import Window

    q_cells = queries.crossJoin(F.broadcast(centroids)).select(
        q_id_col,
        q_vec_col,
        "cent_id",
        cosine(F.col(q_vec_col), F.col("cent_vec")).alias("cs"),
    )
    wq = Window.partitionBy(q_id_col).orderBy(F.col("cs").desc(), F.col("cent_id"))
    probes = (
        q_cells.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= nprobe)
        .select(q_id_col, q_vec_col, "cent_id")
    )
    an = _with_vec_norm(assignments, vec_col, "__v", "__vn")
    pn = _with_vec_norm(probes, q_vec_col, "__q", "__qn")
    cand = an.join(F.broadcast(pn), "cent_id")
    scored = cand.select(
        q_id_col,
        id_col,
        F.round(
            _dot(F.col("__q"), F.col("__v")) / (F.col("__qn") * F.col("__vn")), 6
        ).alias("sim"),
    )
    if exclude_self:
        scored = scored.filter(F.col(q_id_col) != F.col(id_col))
    w = Window.partitionBy(q_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(q_id_col, id_col, "sim", "rnk")
    )
