"""Corpus-aware PPJoin default: the naive-join-blowup probe picks the naive
join where the shingle self-join is cheap (bench-scale synthetic corpus) and
prefix filtering where hot shingles blow it up (boilerplate-bearing web
text), with identical output either way."""

from __future__ import annotations

import random

import pytest


def _web_docs(
    n_docs: int = 900,
    doc_len: int = 60,
    vocab: int = 20000,
    boiler_share: float = 0.4,
    seed: int = 9,
):
    """Web-like corpus: Zipf-ish token frequencies (rank r weight 1/r) over a
    large vocabulary, a shared navigation/footer boilerplate phrase in
    ``boiler_share`` of docs (the hot-shingle source real crawls have), and
    planted near-dup pairs."""
    rng = random.Random(seed)
    weights = [1.0 / (r + 1) for r in range(vocab)]
    total = sum(weights)
    cdf, acc = [], 0.0
    for w in weights:
        acc += w / total
        cdf.append(acc)

    def tok():
        x = rng.random()
        lo, hi = 0, vocab - 1
        while lo < hi:
            mid = (lo + hi) // 2
            if cdf[mid] < x:
                lo = mid + 1
            else:
                hi = mid
        return f"w{lo}"

    boiler = " ".join(f"nav{j}" for j in range(12))
    docs = []
    for i in range(n_docs):
        body = " ".join(tok() for _ in range(doc_len))
        if rng.random() < boiler_share:
            body = body + " " + boiler
        docs.append((i, body))
    for j in range(3):  # planted near-dups: copy with one token changed
        _bid, text = docs[j]
        toks = text.split()
        toks[5] = "changed"
        docs.append((10_000_000 + j, " ".join(toks)))
    return docs


@pytest.fixture(scope="module")
def web_docs(spark):
    return spark.createDataFrame(_web_docs(), "doc_id long, text string")


def test_blowup_probe_separates_corpora(spark):
    """Boilerplate web text at scale probes above the cutoff (hot shingles →
    naive join explodes, prefix filter measured 2× faster at 15k docs); the
    synthetic documents table at bench scale probes below it (where the
    naive join measured 2× faster). The statistic grows with corpus size —
    the same distribution at 900 docs sits below the cutoff, correctly."""
    from bert_namedentityrecognition_spark.operators.dedup import (
        BLOWUP_CUTOFF,
        naive_join_blowup,
        token_shingles,
    )

    closed = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    large = spark.createDataFrame(
        _web_docs(15000, boiler_share=0.3, seed=5), "doc_id long, text string"
    )
    web_score = naive_join_blowup(token_shingles(large), sample_mod=8)
    doc_score = naive_join_blowup(token_shingles(closed), sample_mod=1)
    assert web_score >= BLOWUP_CUTOFF, web_score
    assert doc_score < BLOWUP_CUTOFF, doc_score


def test_blowup_probe_sampling_estimator(spark, web_docs):
    """The 1/mod sample estimator lands within ~3x of the full-corpus
    statistic (it only needs to land on the right side of the cutoff, which
    real corpora clear by orders of magnitude)."""
    from bert_namedentityrecognition_spark.operators.dedup import (
        naive_join_blowup,
        token_shingles,
    )

    sh = token_shingles(web_docs)
    full = naive_join_blowup(sh, sample_mod=1)
    est = naive_join_blowup(sh, sample_mod=4)
    assert full / 3 <= est <= full * 3, (full, est)


def test_auto_equals_both_pinned_plans_on_web(web_docs):
    """auto and both pinned plans return identical pairs — pruning, not
    approximation — and find the planted near-dups."""
    from bert_namedentityrecognition_spark.operators.dedup import ngram_jaccard_pairs

    def pairs(pf):
        return {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in ngram_jaccard_pairs(
                web_docs, threshold=0.6, prefix_filter=pf
            ).collect()
        }

    auto = pairs("auto")
    assert auto == pairs(True) == pairs(False)
    assert {(a, b) for a, b, _ in auto} >= {
        (0, 10_000_000),
        (1, 10_000_001),
        (2, 10_000_002),
    }


def test_unknown_prefix_filter_value_rejected(web_docs):
    from bert_namedentityrecognition_spark.operators.dedup import ngram_jaccard_pairs

    with pytest.raises(ValueError, match="prefix_filter"):
        ngram_jaccard_pairs(web_docs, prefix_filter="always")
