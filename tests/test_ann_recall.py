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
