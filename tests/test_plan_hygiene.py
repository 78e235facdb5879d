"""Plan hygiene the 100 TB design depends on, asserted from the physical
plan text: partition pruning on a date-partitioned pages table, predicate
pushdown to the parquet scan, and column pruning (ReadSchema carries only
what the query touches)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _scan_line(df) -> str:
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "FileScan parquet" in line:
            return line
    raise AssertionError(f"no parquet FileScan in plan:\n{plan}")


def test_date_partitioned_pages_prune_and_push(spark, tmp_path):
    """SURVEY §7's `days(warc_ts)` partitioning: a date filter becomes a
    PartitionFilter (directories never listed), the lang filter is pushed
    into the scan, and only the projected columns are read."""
    from bert_namedentityrecognition_spark.sources import fixtures

    pages = fixtures.pages_to_spark(spark, fixtures.generate_pages(300, seed=42))
    base = str(tmp_path / "pages")
    pages.withColumn("dt", F.to_date("warc_ts")).write.partitionBy("dt").parquet(base)

    q = (
        spark.read.parquet(base)
        .filter(F.col("dt") == "2024-01-02")
        .filter(F.col("lang") == "ja")
        .select("url", "text")
    )
    scan = _scan_line(q)
    assert "PartitionFilters" in scan and "dt" in scan.split("PartitionFilters")[1].split("]")[0]
    pushed = scan.split("PushedFilters: [")[1].split("]")[0]
    assert "EqualTo(lang,ja)" in pushed or "EqualTo(lang, ja)" in pushed, pushed
    read_schema = scan.split("ReadSchema:")[1]
    # html (the big binary column) must NOT be read for this projection
    assert "html" not in read_schema, read_schema


def test_headline_scan_pushdown(spark):
    """q6-style scan: filters reach the parquet reader, ReadSchema is the
    3-column projection, not the full lineitem row."""
    l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = (
        l.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .select("l_extendedprice", "l_discount")
    )
    scan = _scan_line(q)
    pushed = scan.split("PushedFilters: [")[1].split("]")[0]
    assert "l_shipdate" in pushed and "l_quantity" in pushed, pushed
    read_schema = scan.split("ReadSchema:")[1]
    for col in ("l_orderkey", "l_comment", "l_partkey"):
        assert col not in read_schema, read_schema


def test_near_dup_guard_single_source_scan(spark, tmp_path):
    """Round-3 regression lock: the guarded near-dup self-join must not
    re-derive its lineage per refinement level. Before localCheckpoint
    materialization the EXECUTED plan showed 32 parquet scans for one query
    (exchange reuse does NOT dedup the almost-identical agg subtrees);
    materialized, the source is scanned once and the guard's joins are
    broadcasts of the oversized-key sets."""
    import numpy as np

    from bert_namedentityrecognition_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    rng = np.random.RandomState(31)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(400)]
    path = str(tmp_path / "emb")
    spark.createDataFrame(rows, "vec_id long, embedding array<double>").write.parquet(path)

    df = embedding_near_dup_pairs(
        spark.read.parquet(path), threshold=0.8, m_bits=4, dim=16
    )
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 0  # source consumed at checkpoint time
    assert plan.count("BroadcastExchange") >= 2  # hot-key sets broadcast
    assert "SortMergeJoin" not in plan


def test_ngram_jaccard_ppjoin_branch_plan_shape(spark):
    """Both dedup_ngram_jaccard branch plans are recorded in PLANS.md
    (probe pinned); this asserts the PPJoin branch's distinguishing shape:
    a rarity-ranking Window (df asc, shingle asc prefix order) that the
    naive branch must NOT have, and the candidate-then-verify double pass
    over the shingle table (strictly more shingle joins than naive's one
    self-join). Plans only — identical OUTPUT is pinned separately in
    tests/test_ppjoin_openvocab.py."""
    from bert_namedentityrecognition_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def plan(pf):
        df = ngram_jaccard_pairs(docs, n=3, threshold=0.6, prefix_filter=pf)
        return df._jdf.queryExecution().optimizedPlan().toString()

    naive, pp = plan(False), plan(True)
    assert "Window" not in naive
    assert "Window" in pp and "row_number" in pp  # rarity prefix rank
    # candidate generation + verification re-join: more shingle joins
    assert pp.count("Join") > naive.count("Join")


def test_bpe_encode_plan_single_shuffle_broadcast(spark):
    """The BPE corpus tokenize pass must be scan → explode_outer →
    BroadcastHashJoin(segmentation) → one doc_id aggregation exchange: no
    SortMergeJoin anywhere (the naive join-back to restore zero-token docs
    planned corpus⋈corpus SMJ — eliminated via explode_outer sentinels)."""
    from bert_namedentityrecognition_spark.operators.bpe import (
        bpe_encode,
        segmented_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "ab ab cd"), (2, ""), (3, None)], "doc_id long, text string"
    )
    seg = segmented_vocab(docs, 4)
    df = bpe_encode(docs, seg)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # zero-token docs survive without a second corpus-side join
    rows = {r["doc_id"]: (r["n_tokens"], r["n_pieces"]) for r in df.collect()}
    assert rows[2] == (0, 0) and rows[3] == (0, 0)


def test_curation_per_doc_ops_no_corpus_join_back(spark):
    """decontaminate / repetition_signals / oov_ratio must aggregate to
    per-doc rows in ONE pass via explode_outer sentinels — no
    SortMergeJoin of corpus-sized sides to restore gram-less/zero-token
    docs (the first cuts joined per-doc aggregates back onto the corpus)."""
    from bert_namedentityrecognition_spark.operators.corpus import (
        decontaminate,
        oov_ratio,
        repetition_signals,
    )

    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "x"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    for df in (
        decontaminate(docs, ev),
        repetition_signals(docs),
        oov_ratio(docs, top_k=2),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan, plan
        # every doc row survives, including gram-less and null-text ones
        assert {r["doc_id"] for r in df.collect()} == {1, 2, 3, 4}
