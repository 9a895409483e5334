"""JVM-expression vs BLAS pair-scan equivalence."""

from __future__ import annotations

import pytest

from gcpdatapipelines_spark.io import read_table
from gcpdatapipelines_spark.operators import similarity as S
from tests.conftest import SF_SMOKE

THRESHOLD = 0.3


def test_blas_matches_jvm_pairs(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    jvm = {
        (r["id_1"], r["id_2"]): r["sim"]
        for r in S.embedding_neardup_pairs(emb, threshold=THRESHOLD).collect()
    }
    blas = {
        (r["id_1"], r["id_2"]): r["sim"]
        for r in S.neardup_pairs_blas(emb, threshold=THRESHOLD).collect()
    }
    # pairs may differ only at the threshold boundary (BLAS reassociates
    # the dot-product sum); everything else must agree to 1e-6
    only = set(jvm) ^ set(blas)
    for pair in only:
        sim = jvm.get(pair, blas.get(pair))
        assert abs(sim - THRESHOLD) < 1e-5, f"non-boundary pair mismatch: {pair} {sim}"
    for pair in set(jvm) & set(blas):
        assert abs(jvm[pair] - blas[pair]) <= 1e-6


@pytest.mark.slow
def test_blas_bucketed_matches_exact_clustered(spark):
    """Per-cell-pair dgemm over pruned cell pairs must reproduce the
    exact pair set on clustered data at a real near-dup threshold."""
    from tests.test_similarity import _clustered_vectors

    vecs = _clustered_vectors(spark)
    jvm = {
        (r["id_1"], r["id_2"]): r["sim"]
        for r in S.embedding_neardup_pairs(vecs, threshold=0.95).collect()
    }
    blas = {
        (r["id_1"], r["id_2"]): r["sim"]
        for r in S.neardup_pairs_blas(vecs, threshold=0.95, nlist=6).collect()
    }
    assert set(jvm) == set(blas) and jvm
    for pair in jvm:
        assert abs(jvm[pair] - blas[pair]) <= 1e-6
