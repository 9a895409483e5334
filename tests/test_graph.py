"""Connected-components clustering (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcpdatapipelines_spark.io import read_table
from gcpdatapipelines_spark.operators import graph as G
from tests.conftest import SF_SMOKE


def _cc(spark, edges):
    pairs = spark.createDataFrame(edges, "id_1 LONG, id_2 LONG")
    return {
        (r["node"], r["component"])
        for r in G.connected_components(pairs).collect()
    }


def test_cc_single_chain(spark):
    # transitive closure: 1-2, 2-3, 3-4 is ONE component rooted at 1
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1)}


def test_cc_two_components_any_orientation(spark):
    got = _cc(spark, [(2, 1), (1, 2), (5, 6), (7, 6), (2, 2)])
    assert got == {(1, 1), (2, 1), (5, 5), (6, 5), (7, 5)}


def test_cc_long_path_exceeds_round_count(spark):
    # a 64-node path needs label propagation across 63 hops — far more
    # than the handful of star rounds, which must still converge
    # (log^2 n rounds, not diameter rounds)
    n = 64
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert got == {(i, 0) for i in range(n + 1)}


def test_cc_brute_force_parity_random_graph(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(40))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(30)]
    edges = [e for e in edges if e[0] != e[1]]

    # brute-force union-find oracle
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {
        (v, find(v)) for v in nodes if any(v in e for e in edges)
    }
    assert _cc(spark, edges) == want


def test_cluster_assignments_singletons_and_canonicals(spark):
    df = spark.createDataFrame([(i, f"d{i}") for i in range(6)], "doc_id LONG, text STRING")
    pairs = spark.createDataFrame([(1, 3), (3, 5)], "id_1 LONG, id_2 LONG")
    out = G.cluster_assignments(df, pairs, "doc_id")
    rows = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in out.collect()}
    assert rows == {
        0: (0, True),
        1: (1, True),
        2: (2, True),
        3: (1, False),
        4: (4, True),
        5: (1, False),
    }
    # exactly one canonical per cluster
    per_cluster = (
        out.groupBy("cluster_id")
        .agg(F.sum(F.col("is_canonical").cast("int")).alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in per_cluster)


def test_cluster_assignments_broadcast_valve(spark):
    """Small component maps broadcast; past the size valve (or with
    broadcasting disabled) the label join falls back to a shuffle —
    both paths produce identical labels (VERDICT r2 #8)."""
    from gcpdatapipelines_spark import plans as PL

    df = spark.createDataFrame([(i, f"d{i}") for i in range(6)], "doc_id LONG, text STRING")
    pairs = spark.createDataFrame([(1, 3), (3, 5)], "id_1 LONG, id_2 LONG")
    small = G.cluster_assignments(df, pairs, "doc_id")
    assert any("Broadcast" in s for s in PL.join_strategies(small))
    valved = G.cluster_assignments(df, pairs, "doc_id", broadcast_threshold=0)
    strategies = [s for s in PL.join_strategies(valved)]
    assert strategies and not any("BroadcastHashJoin" in s for s in strategies)
    assert {(r["doc_id"], r["cluster_id"]) for r in valved.collect()} == {
        (r["doc_id"], r["cluster_id"]) for r in small.collect()
    }


def test_cc_fixture_documents_clusters(spark):
    """End-to-end over the documents fixture: clusters from jaccard
    pairs must be consistent with the pair set (every pair inside one
    cluster) and reflexively complete (every doc labeled)."""
    from gcpdatapipelines_spark.operators.dedup import ngram_jaccard_pairs

    docs = read_table(spark, SF_SMOKE, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=5, threshold=0.5)
    out = G.cluster_assignments(docs, pairs, "doc_id")
    assert out.count() == docs.count()
    lbl = out.select("doc_id", "cluster_id")
    both = (
        pairs.join(lbl.withColumnRenamed("doc_id", "id_1"), "id_1")
        .withColumnRenamed("cluster_id", "c1")
        .join(lbl.withColumnRenamed("doc_id", "id_2"), "id_2")
        .withColumnRenamed("cluster_id", "c2")
    )
    assert both.filter(F.col("c1") != F.col("c2")).count() == 0


# ---------------------------------------------------------------------------
# triangle counting + PageRank
# ---------------------------------------------------------------------------


def test_triangle_counts_k4_plus_tail(spark):
    from gcpdatapipelines_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles, each node in 3) + tail 4-5-6 (none)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "u BIGINT, v BIGINT")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_orientation_invariance_and_dedup(spark):
    from gcpdatapipelines_spark.operators.graph import triangle_counts

    # duplicate + reversed + self-loop edges must not change counts
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    df = spark.createDataFrame(edges, "u BIGINT, v BIGINT")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_no_cartesian(spark):
    from gcpdatapipelines_spark.operators.graph import triangle_counts

    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "u BIGINT, v BIGINT")
    plan = triangle_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _dense_pagerank(edges, damping=0.85, iters=200):
    """Reference dense power iteration over the symmetrized graph."""
    import numpy as np

    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for u, v in edges:
        adj[idx[u]][idx[v]] = adj[idx[v]][idx[u]] = 1.0
    out = adj.sum(axis=1)
    m = adj / out[:, None]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1 - damping) / n + damping * (m.T @ r)
    return {nodes[i]: r[i] for i in range(n)}


@pytest.mark.slow
def test_pagerank_matches_dense_solver(spark):
    from gcpdatapipelines_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "u BIGINT, v BIGINT")
    got = {r.node: r.rank for r in pagerank(df, tol=1e-12, max_iter=200).collect()}
    want = _dense_pagerank(edges)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def _int_model_pagerank(edges, iters=10, scale=10**12, d_num=85, d_den=100):
    """Pure-python restatement of pagerank_exact_scaled's integer
    recurrence — the bit-exact reference the distributed run must hit
    EXACTLY (not approximately)."""
    sym = set()
    for u, v in edges:
        if u != v:
            sym.add((min(u, v), max(u, v)))
    adj: dict[int, list[int]] = {}
    for u, v in sym:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    n = len(adj)
    base = (d_den - d_num) * scale // (d_den * n)
    r = {u: scale // n for u in adj}
    for _ in range(iters):
        contrib = {u: 0 for u in adj}
        for u, nbrs in adj.items():
            c = r[u] // len(nbrs)
            for v in nbrs:
                contrib[v] += c
        r = {u: base + (d_num * contrib[u]) // d_den for u in adj}
    return r


def test_pagerank_exact_scaled_matches_integer_model(spark):
    from gcpdatapipelines_spark.operators.graph import pagerank_exact_scaled

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 1), (6, 1)]
    df = spark.createDataFrame(edges, "u BIGINT, v BIGINT")
    got = {r.node: r.rank_e12 for r in pagerank_exact_scaled(df, iters=10).collect()}
    want = _int_model_pagerank(edges, iters=10)
    assert got == want  # bit-exact, not approximate


def test_pagerank_exact_scaled_tracks_float_ranks(spark):
    """The quantized iteration stays within ~1e-9 of the float path at
    the same iteration count (quantization bound << rank resolution)."""
    from gcpdatapipelines_spark.operators.graph import pagerank, pagerank_exact_scaled

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "u BIGINT, v BIGINT")
    exact = {r.node: r.rank_e12 / 1e12 for r in pagerank_exact_scaled(df, iters=10).collect()}
    flt = {r.node: r.rank for r in pagerank(df, tol=None, max_iter=10).collect()}
    assert set(exact) == set(flt)
    for k in flt:
        assert abs(exact[k] - flt[k]) < 1e-9


def test_pagerank_exact_scaled_partitioning_invariant(spark):
    from gcpdatapipelines_spark.operators.graph import pagerank_exact_scaled

    edges = [(i, (i * 7) % 23 + 100) for i in range(60)] + [(100, 101), (101, 102)]
    df = spark.createDataFrame(edges, "u BIGINT, v BIGINT")
    a = sorted((r.node, r.rank_e12) for r in pagerank_exact_scaled(df, iters=5).collect())
    b = sorted(
        (r.node, r.rank_e12)
        for r in pagerank_exact_scaled(df.repartition(13), iters=5).collect()
    )
    assert a == b


def test_cluster_best_pick_longest(spark):
    """Quality-aware canonical: the longest member of each component
    is kept (policy window over cluster_assignments)."""
    from pyspark.sql import Window
    from gcpdatapipelines_spark.operators.graph import cluster_assignments

    docs = spark.createDataFrame(
        [(1, 50), (2, 80), (3, 70), (9, 10)], "doc_id BIGINT, n_chars BIGINT"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_1 BIGINT, id_2 BIGINT")
    assigned = cluster_assignments(docs, pairs, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    out = assigned.select(
        "doc_id", "cluster_id", (F.row_number().over(w) == 1).alias("is_kept")
    )
    got = {r.doc_id: (r.cluster_id, r.is_kept) for r in out.collect()}
    assert got[2] == (1, True)  # longest of {1,2,3} kept, cluster id = min
    assert got[1] == (1, False) and got[3] == (1, False)
    assert got[9] == (9, True)  # singleton keeps itself


# ---------------------------------------------------------------------------
# adamic_adar_topk
# ---------------------------------------------------------------------------

from gcpdatapipelines_spark.operators.graph import adamic_adar_topk  # noqa: E402


def test_adamic_adar_path_graph(spark):
    # Path 1-2-3: only non-edge pair at distance 2 is (1,3) via center 2
    # with deg(2)=2 -> score = 1/ln(2).
    edges = spark.createDataFrame([(1, 2), (2, 3)], "u BIGINT, v BIGINT")
    out = adamic_adar_topk(edges, k=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.u, r.v, r.n_common) == (1, 3, 1)
    import math

    assert r.aa_score == round(round(1.0 / math.log(2.0), 12), 6)


def test_adamic_adar_excludes_existing_edges_and_sums_centers(spark):
    # Square 1-2-3-4-1 plus diagonal 1-3: pair (2,4) shares centers 1,3
    # (deg 3 each) -> 2/ln(3); pairs joined by an edge never appear.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], "u BIGINT, v BIGINT"
    )
    rows = adamic_adar_topk(edges, k=10).collect()
    got = {(r.u, r.v): r for r in rows}
    assert set(got) == {(2, 4)}
    import math

    assert got[(2, 4)].n_common == 2
    assert got[(2, 4)].aa_score == round(2 * round(1.0 / math.log(3.0), 12), 6)


def test_adamic_adar_plan_no_cartesian(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "u BIGINT, v BIGINT")
    plan = adamic_adar_topk(edges)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort


# ---------------------------------------------------------------------------
# kcore
# ---------------------------------------------------------------------------

from gcpdatapipelines_spark.operators.graph import kcore  # noqa: E402


def _py_kcore(edge_list, k):
    edges = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    while True:
        deg = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        pruned = {e for e in edges if e[0] in keep and e[1] in keep}
        if pruned == edges:
            break
        edges = pruned
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return {n: d for n, d in deg.items() if d >= k}


def test_kcore_matches_python_model(spark):
    # triangle with a pendant chain: 2-core = the triangle only
    edge_list = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edge_list, "u BIGINT, v BIGINT")
    got = {r.node: r.degree for r in kcore(df, k=2).collect()}
    assert got == _py_kcore(edge_list, 2) == {1: 2, 2: 2, 3: 2}


def test_kcore_cascading_peel(spark):
    # star: hub has degree 5 but every leaf has 1 -> k=2 empties it all
    edge_list = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edge_list, "u BIGINT, v BIGINT")
    assert kcore(df, k=2).count() == 0


def test_kcore_random_graph_vs_model(spark):
    import random

    rng = random.Random(7)
    edge_list = [(rng.randrange(15), rng.randrange(15)) for _ in range(40)]
    df = spark.createDataFrame(edge_list, "u BIGINT, v BIGINT")
    got = {r.node: r.degree for r in kcore(df, k=3).collect()}
    assert got == _py_kcore(edge_list, 3)
