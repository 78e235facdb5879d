"""Cross-document repeated-window dedup anchor (`repeated_window_flags`) —
semantics on handcrafted fixtures plus the degenerate inputs the verify
recipe prescribes (empty/short/null/identical/unicode docs)."""

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from bert_namedentityrecognition_spark.operators.dedup import (
    repeated_window_flags,
)

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r["doc_id"]: (r["n_windows"], r["dup_windows"], r["keep"])
        for r in repeated_window_flags(df, **kw).collect()
    }


def test_cross_doc_shared_window_detected(spark):
    shared = "alpha beta gamma delta epsilon"  # exactly one 5-token window
    rows = [
        (1, shared + " zeta"),  # 2 windows, 1 duplicated
        (2, "prefix " + shared),  # 2 windows, 1 duplicated
        (3, "one two three four five six"),  # 2 windows, 0 duplicated
    ]
    got = _run(spark, rows, window=5)
    assert got[1] == (2, 1, False)  # 1*4 > 2*1 → dropped
    assert got[2] == (2, 1, False)
    assert got[3] == (2, 0, True)


def test_intra_doc_repeat_alone_not_duplicated(spark):
    # The same window twice within ONE doc is repetition_signals' job.
    text = "a b c d e a b c d e"
    got = _run(spark, [(1, text)], window=5)
    n, dup, keep = got[1]
    assert n == 6 and dup == 0 and keep


def test_identical_docs_all_windows_duplicated(spark):
    text = "w x y z q r s"
    got = _run(spark, [(1, text), (2, text)], window=5)
    assert got[1] == (3, 3, False)
    assert got[2] == (3, 3, False)


def test_degenerate_inputs(spark):
    rows = [
        (1, ""),  # empty
        (2, "only four tokens here"),  # < window
        (3, None),  # null text
        (4, "   "),  # whitespace only
        (5, "héllo wörld ünïcode tokens here extra"),  # unicode, 2 windows
    ]
    got = _run(spark, rows, window=5)
    for d in (1, 2, 3, 4):
        assert got[d] == (0, 0, True), (d, got[d])
    assert got[5] == (2, 0, True)


def test_case_and_whitespace_normalization(spark):
    a = "Alpha  Beta\tGamma Delta Epsilon"
    b = "alpha beta gamma delta epsilon"
    got = _run(spark, [(1, a), (2, b)], window=5)
    assert got[1] == (1, 1, False)
    assert got[2] == (1, 1, False)


def test_threshold_boundary_integer_exact(spark):
    # 1 dup of 4 windows == exactly 25 % → keep (<=, not <).
    shared = "s1 s2 s3 s4 s5"
    rows = [(1, shared + " u1 u2 u3"), (2, shared)]
    got = _run(spark, rows, window=5, max_dup_num=1, max_dup_den=4)
    assert got[1] == (4, 1, True)
    assert got[2] == (1, 1, False)
