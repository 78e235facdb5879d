"""Count-min sketch (`cms_sketch` / `cms_heavy_hitters`) — the defining
guarantees on handcrafted corpora: estimates never undershoot, collide
exactly as the bucket arithmetic says, and a wide-enough sketch is exact."""

from pyspark.sql import functions as F

from bert_namedentityrecognition_spark.operators.corpus import (
    cms_heavy_hitters,
    cms_sketch,
)

DOCS = "doc_id long, text string"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, DOCS)
    return {
        r["token"]: (r["true_count"], r["est_count"], r["overestimated"])
        for r in cms_heavy_hitters(df, **kw).collect()
    }


def test_estimates_never_undershoot_and_wide_sketch_exact(spark):
    rows = [(i, "alpha beta gamma delta " * (i + 1)) for i in range(5)]
    tight = _run(spark, rows, width=2, depth=1)
    wide = _run(spark, rows, width=4096, depth=4)
    for tok, (t, e, over) in tight.items():
        assert e >= t and over == (e > t)
    # 4 tokens in 4096 buckets across 4 rows: no full-depth collision
    for tok, (t, e, over) in wide.items():
        assert (e, over) == (t, False)
    # true counts identical under both sketches
    assert {k: v[0] for k, v in tight.items()} == {k: v[0] for k, v in wide.items()}


def test_deeper_sketch_never_worse(spark):
    rows = [(1, "a b c d e f g h i j " * 10)]
    d1 = _run(spark, rows, width=4, depth=1)
    d3 = _run(spark, rows, width=4, depth=3)
    for tok in d1:
        assert d3[tok][1] <= d1[tok][1]  # min over more rows


def test_sketch_mass_conservation(spark):
    # every sketch row holds the full token stream: sum of cells == total
    # token count, per depth row
    rows = [(1, "x y z x y x"), (2, "p q")]
    df = spark.createDataFrame(rows, DOCS)
    cells = cms_sketch(df, width=8, depth=3).collect()
    per_d = {}
    for r in cells:
        per_d[r["d"]] = per_d.get(r["d"], 0) + r["cnt"]
    assert per_d == {0: 8, 1: 8, 2: 8}


def test_degenerate_docs(spark):
    assert _run(spark, [(1, ""), (2, None), (3, "   ")]) == {}


def test_hll_registers_merge_and_estimate(spark):
    import math

    from bert_namedentityrecognition_spark.operators.corpus import hll_registers

    # one source, 2000 distinct tokens spread over 40 docs
    rows = [
        (i, " ".join(f"tok{j}" for j in range(i * 50, (i + 1) * 50)))
        for i in range(40)
    ]
    df = spark.createDataFrame([(d, "s", t) for d, t in rows],
                               "doc_id long, source string, text string")
    regs = {r["j"]: r["max_rank"] for r in hll_registers(df).collect()}
    m = 64
    # standard HLL estimate from the integer register state
    s = sum(2.0 ** -regs.get(j, 0) for j in range(m))
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / s
    zeros = sum(1 for j in range(m) if j not in regs)
    if e <= 2.5 * m and zeros:
        e = m * math.log(m / zeros)
    # m=64 → 13% standard error; this draw measures 2521 (+26%, ~2σ).
    # The bound pins structure (right order of magnitude, sane registers),
    # not tight accuracy.
    assert 1300 <= e <= 2800, e

    # mergeability: registers of two halves combine by max to the whole
    half1 = hll_registers(df.filter(F.col("doc_id") < 20))
    half2 = hll_registers(df.filter(F.col("doc_id") >= 20))
    merged = {}
    for r in half1.collect() + half2.collect():
        merged[r["j"]] = max(merged.get(r["j"], 0), r["max_rank"])
    assert merged == regs


def test_hll_degenerate(spark):
    from bert_namedentityrecognition_spark.operators.corpus import hll_registers

    df = spark.createDataFrame(
        [(1, "s", ""), (2, "s", None)], "doc_id long, source string, text string"
    )
    assert hll_registers(df).collect() == []


def test_bloom_decontaminate_containment_and_fp(spark):
    from bert_namedentityrecognition_spark.operators.corpus import (
        bloom_decontaminate,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(1, base), (2, base + " extra tokens here now"),
            (3, "completely different words in this training document okay"),
            (4, "xy"), (5, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame([(100, base)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in bloom_decontaminate(docs, ev, m_bits=4096).collect()}
    assert len(out) == 5
    for r in out.values():
        # the defining guarantee: no false negatives
        assert r["n_bloom_hits"] >= r["n_overlap"]
        if r["contaminated_exact"]:
            assert r["contaminated_bloom"]
    assert out[1]["n_overlap"] == out[1]["n_shingles"] > 0  # fully contained
    assert out[1]["contaminated_exact"] and out[1]["contaminated_bloom"]
    assert out[3]["n_shingles"] > 0 and out[3]["n_overlap"] == 0  # disjoint doc
    assert out[4]["n_shingles"] == 0 and not out[4]["contaminated_bloom"]
    assert out[5]["n_shingles"] == 0


def test_bloom_tiny_filter_forces_false_positives(spark):
    from bert_namedentityrecognition_spark.operators.corpus import (
        bloom_decontaminate,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(30)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "q1 q2 q3 q4 q5 q6 q7 q8")], "doc_id long, text string"
    )
    # m=8 bits, k=3, 6 eval shingles: nearly every bit set → disjoint
    # corpora still "hit" — the overshoot branch must fire
    out = bloom_decontaminate(docs, ev, m_bits=8, k=3).collect()
    assert all(r["n_overlap"] == 0 for r in out)
    assert sum(r["n_bloom_hits"] for r in out) > 0
