"""Hashed-feature quality-classifier distillation
(`distill_quality_classifier`) — the teacher label, the integer weight
arithmetic, and the degenerate inputs the verify recipe prescribes."""

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from bert_namedentityrecognition_spark.functions.textstats import quality_score
from bert_namedentityrecognition_spark.operators.corpus import (
    distill_quality_classifier,
)

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs to the forest "
    "in a bright morning while the birds sing of summer and the wind is "
    "soft in the trees of the old valley where the river bends to the sea"
)
BAD = "@@@ ### !!! $$$ %%% ^^^ &&& *** ((( ))) ___ +++ === ~~~ ``` |||"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = distill_quality_classifier(df, **kw).collect()
    assert len(out) == len(rows)
    return {r["doc_id"]: (r["score"], r["student_keep"], r["teacher_keep"]) for r in out}


def test_student_separates_disjoint_vocabularies(spark):
    # 3 good docs + 3 bad docs with disjoint token sets: every good token's
    # bucket is purely positive, every bad token's purely negative — the
    # student must reproduce the teacher exactly.
    rows = [(i, GOOD + f" extra{i} words here") for i in range(3)] + [
        (10 + i, BAD + f" @@{i}") for i in range(3)
    ]
    got = _run(spark, rows)
    for i in range(3):
        assert got[i][2] is True and got[i][1] is True and got[i][0] > 0
    for i in range(3):
        s, student, teacher = got[10 + i]
        assert teacher is False and student is False and s <= 0


def test_teacher_matches_gated_quality_predicate(spark):
    rows = [(1, GOOD), (2, BAD), (3, "short text")]
    df = spark.createDataFrame(rows, SCHEMA)
    expected = {
        r["doc_id"]: r["k"]
        for r in df.select(
            "doc_id", (F.round(quality_score(F.col("text")), 6) >= 0.5).alias("k")
        ).collect()
    }
    got = _run(spark, rows)
    for i, k in expected.items():
        assert got[i][2] == k


def test_degenerate_docs_score_zero_and_survive(spark):
    rows = [(1, ""), (2, "   "), (3, None), (4, GOOD)]
    got = _run(spark, rows)
    for i in (1, 2, 3):
        assert got[i] == (0, False, False)
    assert got[4][1] is True


def test_weights_bounded_by_scale(spark):
    # score magnitude ≤ n_tokens·scale — the overflow-safety contract
    rows = [(1, GOOD), (2, BAD)]
    got = _run(spark, rows, scale=1000)
    for i, (score, _, _) in got.items():
        n_toks = len([t for t in (GOOD if i == 1 else BAD).split() if t])
        assert abs(score) <= (n_toks + 2) * 1000


def test_empty_corpus(spark):
    df = spark.createDataFrame([], SCHEMA)
    assert distill_quality_classifier(df).collect() == []


def test_unicode_tokens(spark):
    rows = [(1, "日本語 テスト 文書 " + GOOD), (2, BAD)]
    got = _run(spark, rows)
    assert got[1][2] is True and got[2][2] is False
