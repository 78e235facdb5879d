"""SemDeDup within-cluster semantic dedup — keeper determinism, norm
guards, and the cluster-confinement property on handcrafted vectors."""

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from bert_namedentityrecognition_spark.operators.similarity import semdedup_flags

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _flags(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = semdedup_flags(df, n_centroids=2, threshold=0.9, **kw)
    return {r["vec_id"]: (r["is_dup"], r["dup_of"]) for r in out.collect()}


def test_parallel_vectors_dedup_min_keeper(spark):
    # ids 0,1,2 exactly parallel (+x, scaled) — cosine 1.0 pairwise;
    # ids 10,11 parallel (+y). Orthogonal groups never flag each other
    # even if co-clustered (cos 0 < 0.9).
    rows = [
        (0, [1.0, 0.0]),
        (1, [2.0, 0.0]),
        (2, [0.5, 0.0]),
        (10, [0.0, 1.0]),
        (11, [0.0, 3.0]),
    ]
    got = _flags(spark, rows)
    assert got[0] == (False, None)  # min id of its group keeps
    assert got[1] == (True, 0)
    assert got[2] == (True, 0)  # min qualifying partner, not 1
    assert got[10] == (False, None)
    assert got[11] == (True, 10)


def test_zero_vector_never_matches(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.0, 0.0])]
    got = _flags(spark, rows)
    # zero vectors: undefined cosine -> norm guard keeps them, pairwise too
    assert got[1] == (False, None)
    assert got[2] == (False, None)


def test_every_input_row_present(spark):
    rows = [(i, [float(i + 1), 1.0]) for i in range(7)]
    got = _flags(spark, rows)
    assert set(got) == set(range(7))
