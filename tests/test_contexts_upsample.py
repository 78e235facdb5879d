"""Mention-context snippet extraction (`mention_contexts`) and
deterministic fractional replication (`mixture_upsample`)."""

from pyspark.sql import functions as F

from bert_namedentityrecognition_spark.operators.corpus import mixture_upsample
from bert_namedentityrecognition_spark.operators.triples import mention_contexts

DOCS = "doc_id long, text string"


def test_contexts_window_and_edges(spark):
    df = spark.createDataFrame(
        [(1, "a b spark c d e fast"), (2, "spark"), (3, None), (4, "")], DOCS
    )
    out = {
        (r["doc_id"], r["p"]): (r["term"], r["kind"], r["left_ctx"], r["right_ctx"])
        for r in mention_contexts(df, {"spark": "drug", "fast": "symptom"}).collect()
    }
    assert out == {
        (1, 2): ("spark", "drug", "a b", "c d e"),
        (1, 6): ("fast", "symptom", "c d e", ""),
        (2, 0): ("spark", "drug", "", ""),  # boundary-clipped, never null
    }


def test_contexts_repeated_term_every_occurrence(spark):
    df = spark.createDataFrame([(1, "spark x spark")], DOCS)
    out = mention_contexts(df, {"spark": "drug"}, ctx_tokens=1).collect()
    got = {(r["p"]): (r["left_ctx"], r["right_ctx"]) for r in out}
    assert got == {0: ("", "x"), 2: ("x", "")}


UP = "doc_id long, source string"


def test_upsample_rate_branches_and_accounting(spark):
    rows = [(i, "a") for i in range(100)] + [(i, "b") for i in range(100, 200)] + [
        (i, "c") for i in range(200, 300)
    ]
    df = spark.createDataFrame(rows, UP)
    # a: exact 2x; b: 0.5x downsample; c: 2.5x fractional
    rate = (
        F.when(F.col("source") == "a", 2_000_000)
        .when(F.col("source") == "b", 500_000)
        .otherwise(2_500_000)
        .cast("long")
    )
    out = mixture_upsample(df, rate).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # exact integer rate: every doc exactly 2 copies, copy ids 1..2
    assert len(by_src["a"]) == 200
    assert all(r["n_copies"] == 2 for r in by_src["a"])
    # fractional downsample: docs appear 0 or 1 times, roughly half
    n_b = len({r["doc_id"] for r in by_src["b"]})
    assert len(by_src["b"]) == n_b and 25 <= n_b <= 75
    # 2.5x: every doc 2 or 3 copies, between 200 and 300 rows total
    assert all(r["n_copies"] in (2, 3) for r in by_src["c"])
    assert 200 <= len(by_src["c"]) <= 300
    # per-doc copy ids are exactly 1..n_copies
    for src in by_src:
        per_doc = {}
        for r in by_src[src]:
            per_doc.setdefault(r["doc_id"], []).append(r["copy"])
        for d, copies in per_doc.items():
            assert sorted(copies) == list(range(1, len(copies) + 1))


def test_upsample_partitioning_invariant(spark):
    rows = [(i, f"s{i % 7}") for i in range(200)]
    rate = (F.lit(500_000) + (F.length("source") * 700_000)).cast("long")
    a = mixture_upsample(spark.createDataFrame(rows, UP), rate).collect()
    b = mixture_upsample(
        spark.createDataFrame(rows, UP).repartition(13), rate
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
