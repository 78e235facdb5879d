"""Approximation quality of the ANN operators, quantified: recall@10 vs the
exact brute-force baseline on clustered vectors (the geometry real
embeddings have — on uniformly random vectors recall is necessarily ~the
fraction of the index probed, measured and documented in SCALE.md)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.RandomState(5)
    centers = rng.randn(20, 64) * 3
    rows = []
    for i in range(2000):
        v = centers[i % 20] + rng.randn(64) * 0.5
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    emb.count()
    return emb


def _topk_sets(df):
    out: dict = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def test_ann_recall_on_clustered_vectors(clustered):
    from bert_namedentityrecognition_spark.operators.similarity import (
        cosine_topk,
        ivf_cosine_topk,
        lsh_cosine_topk,
    )

    queries = clustered.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = _topk_sets(cosine_topk(clustered, queries, k=10))
    assert len(exact) == 40 and all(len(s) == 10 for s in exact.values())

    def recall(df):
        approx = _topk_sets(df)
        rs = [len(approx.get(q, set()) & exact[q]) / 10 for q in exact]
        return sum(rs) / len(rs)

    # measured 0.988 / 0.887 / 0.778 on this seeded corpus; bounds leave
    # slack for numerical jitter only — a structural regression (wrong
    # bucketing, broken probe selection) lands far below them
    r_ivf4 = recall(ivf_cosine_topk(clustered, queries, k=10, n_centroids=16, n_probe=4))
    r_ivf2 = recall(ivf_cosine_topk(clustered, queries, k=10, n_centroids=16, n_probe=2))
    r_lsh = recall(lsh_cosine_topk(clustered, queries, k=10, m_bits=4, dim=64))
    r_lsh_mp = recall(
        lsh_cosine_topk(clustered, queries, k=10, m_bits=4, dim=64, multi_probe=1)
    )
    assert r_ivf4 >= 0.9, r_ivf4
    assert r_ivf2 >= 0.75, r_ivf2
    assert r_ivf4 >= r_ivf2  # more probes can only help
    assert r_lsh >= 0.6, r_lsh
    # hamming-1 multi-probe strictly widens the candidate set
    assert r_lsh_mp >= r_lsh, (r_lsh_mp, r_lsh)
    assert r_lsh_mp >= 0.85, r_lsh_mp


def test_pq_recall_code_only_vs_reranked(clustered):
    """PQ quality ladder on the clustered corpus: 4×4-bit codes alone are
    cluster-grained (within-cluster ranking collapses to ADC ties → recall
    ≈ k/cluster_size), and the exact-rerank stage recovers quality —
    recall 1.0 once the candidate budget covers the cluster (C=100 =
    cluster size). Measured 0.105 / 0.515 / 1.0; bounds leave jitter slack
    only."""
    import numpy as np

    from bert_namedentityrecognition_spark.operators.similarity import pq_topk

    queries = clustered.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    X = np.array([r["embedding"] for r in clustered.orderBy("vec_id").collect()])

    def exact_l2(q, k=10):
        d = ((X - X[q]) ** 2).sum(1)
        d[q] = np.inf
        return set(np.argsort(d, kind="stable")[:k].tolist())

    def recall(df):
        approx = _topk_sets(df)
        return sum(
            len(approx.get(q, set()) & exact_l2(q)) / 10 for q in range(40)
        ) / 40

    r_code = recall(pq_topk(clustered, queries, k=10, m_subspaces=4, k_codes=16))
    r_c50 = recall(
        pq_topk(clustered, queries, k=10, m_subspaces=4, k_codes=16, rerank=50)
    )
    r_c100 = recall(
        pq_topk(clustered, queries, k=10, m_subspaces=4, k_codes=16, rerank=100)
    )
    assert r_code >= 0.08, r_code
    assert r_c50 >= 0.45, r_c50
    assert r_c100 >= 0.95, r_c100
    assert r_code < r_c50 < r_c100  # the dial is monotone on this corpus


def test_pq_train_shapes_and_errors(clustered):
    import pytest as _pytest

    from bert_namedentityrecognition_spark.operators.similarity import pq_train

    books = pq_train(clustered, m_subspaces=4, k_codes=8, train_mod=7)
    assert len(books) == 4
    assert all(len(b) == 8 for b in books)
    assert all(len(c) == 16 for b in books for c in b)
    # deterministic: identical second run
    assert books == pq_train(clustered, m_subspaces=4, k_codes=8, train_mod=7)
    with _pytest.raises(ValueError, match="not divisible"):
        pq_train(clustered, m_subspaces=5, k_codes=8, train_mod=7)
    with _pytest.raises(ValueError, match="smaller than k_codes"):
        pq_train(clustered, m_subspaces=4, k_codes=16, train_mod=10**9)
