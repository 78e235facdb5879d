"""Proximity-weighted KG edges (`proximity_edges`) and deterministic
negative sampling for embedding-training prep (`negative_samples`) —
semantics on handcrafted fixtures + the degenerate inputs the verify
recipe prescribes."""

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from bert_namedentityrecognition_spark.operators.triples import (
    negative_samples,
    proximity_edges,
)

DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def _prox(spark, rows, **kw):
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    out = proximity_edges(df, ["spark", "merge"], ["slow", "fast"], **kw)
    return {(r["subj"], r["obj"]): (r["n_close"], r["min_dist"]) for r in out.collect()}


def test_proximity_window_and_min_dist(spark):
    rows = [
        # spark@0 slow@1 (dist 1) ... fast@8 (dist 8, outside window 5)
        (1, "spark slow pad pad pad pad pad pad fast"),
        # merge@0 ... slow@6 — outside window; merge@8 slow@6 dist 2
        (2, "merge a b c d e slow f merge"),
    ]
    got = _prox(spark, rows, window=5)
    assert got[("spark", "slow")] == (1, 1)
    assert ("spark", "fast") not in got  # dist 8 > window
    assert got[("merge", "slow")] == (1, 2)  # only the near occurrence counts


def test_proximity_multiple_occurrences_counted(spark):
    # spark@0 slow@1, spark@2 slow@1(d1) and slow@3(d1 from spark@2, d3 from spark@0)
    got = _prox(spark, [(1, "spark slow spark slow")], window=5)
    assert got[("spark", "slow")] == (4, 1)  # 2 spark × 2 slow, all within 5


def test_proximity_degenerate_docs(spark):
    got = _prox(spark, [(1, ""), (2, None), (3, "   "), (4, "no dict words here")])
    assert got == {}


def test_proximity_distance_zero_is_impossible_but_adjacent_is_one(spark):
    got = _prox(spark, [(1, "fast merge")], window=1)
    assert got[("merge", "fast")] == (1, 1)


POS_SCHEMA = StructType(
    [StructField("subj", StringType()), StructField("obj", StringType())]
)


def _ents(spark, names):
    return spark.createDataFrame(
        [(n, i) for i, n in enumerate(sorted(names))], "entity string, entity_id long"
    )


def test_negative_samples_shape_and_determinism(spark):
    pos = spark.createDataFrame([("a", "x"), ("b", "y")], POS_SCHEMA)
    ents = _ents(spark, ["a", "b", "x", "y", "z"])
    out = negative_samples(pos, ents, k=3).collect()
    assert len(out) == 2 * 2 * 3  # positives × slots × k
    # deterministic: identical second run
    out2 = negative_samples(pos, ents, k=3).collect()
    key = lambda r: (r["subj"], r["obj"], r["slot"], r["j"])
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # every neg_entity is from the entity table
    assert all(r["neg_entity"] in {"a", "b", "x", "y", "z"} for r in out)


def test_negative_samples_filtered_setting(spark):
    # complete bipartite positives {a,b}×{x}: any tail-corruption to x is
    # a positive (unusable); head-corruptions to x give (x, x)-style
    # triples that are never positive (usable)
    pos = spark.createDataFrame([("a", "x"), ("b", "x")], POS_SCHEMA)
    ents = _ents(spark, ["a", "b", "x"])
    out = negative_samples(pos, ents, k=3).collect()
    for r in out:
        corrupted = (
            (r["neg_entity"], r["obj"])
            if r["slot"] == "head"
            else (r["subj"], r["neg_entity"])
        )
        expect_usable = corrupted not in {("a", "x"), ("b", "x")}
        assert r["usable"] == expect_usable, r
    assert any(r["usable"] for r in out) and any(not r["usable"] for r in out)


def test_negative_samples_empty_positives(spark):
    pos = spark.createDataFrame([], POS_SCHEMA)
    ents = _ents(spark, ["a"])
    assert negative_samples(pos, ents, k=2).collect() == []


def test_merge_triple_counts_full_outer_sum(spark):
    from bert_namedentityrecognition_spark.operators.triples import (
        merge_triple_counts,
    )

    S = "subj string, pred string, obj string, count long"
    old = spark.createDataFrame(
        [("a", "P", "x", 5), ("b", "P", "y", 2)], S
    )
    delta = spark.createDataFrame(
        [("a", "P", "x", 3), ("c", "P", "z", 7)], S
    )
    got = {
        (r["subj"], r["pred"], r["obj"]): r["count"]
        for r in merge_triple_counts(old, delta).collect()
    }
    assert got == {("a", "P", "x"): 8, ("b", "P", "y"): 2, ("c", "P", "z"): 7}
    # empty delta is the identity
    empty = spark.createDataFrame([], S)
    same = {
        (r["subj"], r["pred"], r["obj"]): r["count"]
        for r in merge_triple_counts(old, empty).collect()
    }
    assert same == {("a", "P", "x"): 5, ("b", "P", "y"): 2}


def test_merge_equals_recount_on_partitioned_docs(spark):
    # the incremental-maintenance invariant on a local corpus: triples of
    # two disjoint doc subsets merged == triples of the union
    from bert_namedentityrecognition_spark.operators.tagger import tag_sentences
    from bert_namedentityrecognition_spark.operators.triples import (
        build_triples,
        merge_triple_counts,
    )

    rows = [
        (i, f"spark slow text {i} merge fast batch dup") for i in range(10)
    ] + [(i, f"window small stream {i}") for i in range(10, 16)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        F.col("doc_id").cast("string").alias("url"),
        F.lit(0).alias("sent_id"),
        F.col("text").alias("sent"),
    )
    terms = {"spark": "drug", "merge": "drug", "window": "drug",
             "slow": "symptom", "fast": "symptom", "small": "symptom"}
    m = tag_sentences(docs, terms, normalize=False)
    full = build_triples(m, scope="document", remove_duplicates=True,
                         use_canonical=False)
    old = build_triples(m.filter(F.col("url").cast("long") % 3 != 0),
                        scope="document", remove_duplicates=True,
                        use_canonical=False)
    delta = build_triples(m.filter(F.col("url").cast("long") % 3 == 0),
                          scope="document", remove_duplicates=True,
                          use_canonical=False)
    key = lambda df: {
        (r["subj"], r["pred"], r["obj"]): r["count"] for r in df.collect()
    }
    assert key(merge_triple_counts(old, delta)) == key(full)


def test_disambiguation_context_beats_prior(spark):
    from bert_namedentityrecognition_spark.operators.normalize import (
        disambiguate_mentions,
    )

    cand = spark.createDataFrame(
        [("merge", "MERGE_JOIN", 3, ["join", "hash"]),
         ("merge", "MERGE_SORT", 1, ["sort", "order"])],
        "surface string, entity_id string, prior long, signature array<string>",
    )
    rows = [
        (1, "sort order merge now done"),   # context → MERGE_SORT despite prior
        (2, "hash join merge table x"),     # context → MERGE_JOIN
        (3, "nothing relevant merge here"), # no context → prior → MERGE_JOIN
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["entity_id"], r["score"])
           for r in disambiguate_mentions(docs, cand).collect()}
    assert got[1] == ("MERGE_SORT", 2001)   # 2 signature hits + prior 1
    assert got[2] == ("MERGE_JOIN", 2003)
    assert got[3] == ("MERGE_JOIN", 3)      # prior only


def test_disambiguation_window_clips_and_every_occurrence_linked(spark):
    from bert_namedentityrecognition_spark.operators.normalize import (
        disambiguate_mentions,
    )

    cand = spark.createDataFrame(
        [("x", "A", 1, ["left"]), ("x", "B", 0, ["right"])],
        "surface string, entity_id string, prior long, signature array<string>",
    )
    docs = spark.createDataFrame(
        [(1, "x right"), (2, "left x"), (3, "x x")], "doc_id long, text string"
    )
    got = {(r["doc_id"], r["p"]): r["entity_id"]
           for r in disambiguate_mentions(docs, cand, ctx_tokens=1).collect()}
    assert got == {
        (1, 0): "B",   # right-context only (left clipped at doc start)
        (2, 1): "A",   # left-context only
        (3, 0): "A", (3, 1): "A",  # no signal → prior, both occurrences linked
    }
