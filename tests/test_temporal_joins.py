"""As-of join (union + ordered-window merge) and bucketized range join —
semantics on handcrafted fixtures: tie rules at equal timestamps, strict
variant, NULL payload shadowing, left semantics, bucket-boundary intervals,
and a brute-force cross-check on a pseudo-random corpus."""

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from bert_namedentityrecognition_spark.operators.temporal import (
    asof_join,
    range_join_buckets,
)

FACT = StructType(
    [
        StructField("k", LongType()),
        StructField("ts", LongType()),
        StructField("fid", LongType()),
    ]
)
DIM = StructType(
    [
        StructField("k", LongType()),
        StructField("ts", LongType()),
        StructField("v", StringType()),
    ]
)


def _asof(spark, fact_rows, dim_rows, **kw):
    fact = spark.createDataFrame(fact_rows, FACT)
    dim = spark.createDataFrame(dim_rows, DIM)
    out = asof_join(fact, dim, ["k"], "ts", ["v"], **kw)
    return {r["fid"]: r["v"] for r in out.collect()}


def test_asof_basic_and_left(spark):
    got = _asof(
        spark,
        [(1, 5, 10), (1, 12, 11), (2, 3, 20)],
        [(1, 4, "a"), (1, 9, "b"), (2, 99, "z")],
    )
    # fid 10: last dim <= 5 is ts=4 'a'; fid 11: ts=9 'b'; fid 20: none -> NULL
    assert got == {10: "a", 11: "b", 20: None}


def test_asof_equal_ts_inclusive_vs_strict(spark):
    fact = [(1, 5, 10)]
    dim = [(1, 2, "old"), (1, 5, "now")]
    assert _asof(spark, fact, dim)[10] == "now"  # <= : version AT ts wins
    assert _asof(spark, fact, dim, strict=True)[10] == "old"  # < : excluded


def test_asof_null_payload_field_shadows(spark):
    # the ts=5 version exists with a NULL value — it must SHADOW ts=2,
    # not be skipped (ignoreNulls applies to missing rows, not fields)
    got = _asof(spark, [(1, 7, 10)], [(1, 2, "old"), (1, 5, None)])
    assert got == {10: None}


def test_asof_matches_bruteforce(spark):
    # pseudo-random corpus via a deterministic LCG, checked against an
    # O(n*m) python reference
    seed = 1234567
    facts, dims = [], []
    for i in range(300):
        seed = (seed * 1103515245 + 12345) % (1 << 31)
        facts.append((seed % 7, (seed // 7) % 1000, i))
    for j in range(120):
        seed = (seed * 1103515245 + 12345) % (1 << 31)
        dims.append((seed % 7, (seed // 7) % 1000, f"v{j}"))
    # dedupe dim on (k, ts) keeping max tag (operator contract)
    best = {}
    for k, ts, v in dims:
        if (k, ts) not in best or v > best[(k, ts)]:
            best[(k, ts)] = v
    dims = [(k, ts, v) for (k, ts), v in best.items()]

    expect = {}
    for k, ts, fid in facts:
        cand = [(dts, v) for dk, dts, v in dims if dk == k and dts <= ts]
        expect[fid] = max(cand)[1] if cand else None
    got = _asof(spark, facts, dims)
    assert got == expect


PT = StructType([StructField("k", LongType()), StructField("p", LongType()),
                 StructField("pid", LongType())])
IV = StructType([StructField("k", LongType()), StructField("lo", LongType()),
                 StructField("hi", LongType()), StructField("iid", LongType())])


def _pairs(spark, pts, ivs, width):
    out = range_join_buckets(
        spark.createDataFrame(pts, PT),
        spark.createDataFrame(ivs, IV),
        ["k"], "p", "lo", "hi", width,
    )
    return {(r["pid"], r["iid"]) for r in out.collect()}


def test_range_join_inclusive_bounds_and_keys(spark):
    pts = [(1, 10, 1), (1, 20, 2), (1, 21, 3), (2, 15, 4)]
    ivs = [(1, 10, 20, 100), (2, 0, 14, 200)]
    assert _pairs(spark, pts, ivs, 16) == {(1, 100), (2, 100)}


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    # interval spans 3 buckets (width 4: buckets 0,1,2) — each contained
    # point must appear exactly once
    out = range_join_buckets(
        spark.createDataFrame([(1, 5, 1), (1, 5, 2)], PT),
        spark.createDataFrame([(1, 0, 11, 9)], IV),
        ["k"], "p", "lo", "hi", 4,
    )
    rows = [(r["pid"], r["iid"]) for r in out.collect()]
    assert sorted(rows) == [(1, 9), (2, 9)]


def test_range_join_matches_bruteforce(spark):
    seed = 42
    pts, ivs = [], []
    for i in range(400):
        seed = (seed * 1103515245 + 12345) % (1 << 31)
        pts.append((seed % 5, (seed // 5) % 500, i))
    for j in range(80):
        seed = (seed * 1103515245 + 12345) % (1 << 31)
        lo = (seed // 5) % 500
        ivs.append((seed % 5, lo, lo + (seed % 60), j))
    expect = {
        (pid, iid)
        for k, p, pid in pts
        for ik, lo, hi, iid in ivs
        if k == ik and lo <= p <= hi
    }
    assert _pairs(spark, pts, ivs, 32) == expect
