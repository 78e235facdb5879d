"""BM25 ranking and mutual-kNN graph semantics on handcrafted inputs."""

import math

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bert_namedentityrecognition_spark.operators.retrieval import bm25_rank
from bert_namedentityrecognition_spark.operators.similarity import (
    knn_within_clusters,
)

DOCS = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)
VECS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _bm25_py(docs, terms, k1=1.2, b=0.75):
    toks = {d: t.strip().split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {q: sum(1 for t in toks.values() if q in t) for q in terms}
    out = {}
    for d, t in toks.items():
        s = 0.0
        for q in terms:
            tf = t.count(q)
            idf = (n - df[q] + 0.5) / (df[q] + 0.5)
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        out[d] = s
    return out


def test_bm25_matches_pure_python_ranking(spark):
    docs = [
        (0, "merge merge merge window"),
        (1, "window customer window"),
        (2, "the fast key order sort"),
        (3, "merge customer"),
        (4, "customer customer customer customer customer customer"),
    ]
    terms = ["merge", "window", "customer"]
    got = bm25_rank(spark.createDataFrame(docs, DOCS), terms, top_n=5).collect()
    exp = _bm25_py(docs, terms)
    order = sorted(exp, key=lambda d: (-exp[d], d))
    assert [r["doc_id"] for r in got] == order
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]
    for r in got:
        assert math.isclose(r["bm25_score"], exp[r["doc_id"]], abs_tol=5e-7)


def test_bm25_absent_term_contributes_zero(spark):
    docs = [(0, "merge window"), (1, "window window")]
    both = bm25_rank(
        spark.createDataFrame(docs, DOCS), ["window", "zzz_absent"], top_n=2
    ).collect()
    only = bm25_rank(
        spark.createDataFrame(docs, DOCS), ["window"], top_n=2
    ).collect()
    assert [(r["doc_id"], r["bm25_score"]) for r in both] == [
        (r["doc_id"], r["bm25_score"]) for r in only
    ]


def test_knn_mutual_flag_asymmetry(spark):
    # chain on the unit circle: a–b adjacent, c nearer b than a, d far off.
    # k=1: a→b, b→a (mutual pair); c→b but b's top-1 is a → c's edge
    # NOT mutual; d→c one-way.
    def unit(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    rows = [(0, unit(0)), (1, unit(10)), (2, unit(25)), (3, unit(80))]
    out = knn_within_clusters(
        spark.createDataFrame(rows, VECS), k=1, n_centroids=1
    ).collect()
    edges = {r["src_id"]: (r["dst_id"], r["mutual"]) for r in out}
    assert edges[0] == (1, True)
    assert edges[1] == (0, True)
    assert edges[2] == (1, False)
    assert edges[3] == (2, False)


def test_knn_rank_order_and_k(spark):
    rows = [(i, [float(10 - i), 1.0]) for i in range(5)]
    out = knn_within_clusters(
        spark.createDataFrame(rows, VECS), k=3, n_centroids=1
    ).collect()
    per_src = {}
    for r in out:
        per_src.setdefault(r["src_id"], []).append(r["rank"])
    assert set(per_src) == set(range(5))
    assert all(sorted(v) == [1, 2, 3] for v in per_src.values())
