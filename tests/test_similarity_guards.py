"""Scale-guard behavior of the similarity operators (VERDICT r2 items 1-3):

- IVF training sample is BOUNDED by max_train_sample regardless of corpus
  size (the round-2 default train_mod=2 collected n/2 rows to the driver);
- embedding_near_dup_pairs survives an adversarial all-in-one-bucket corpus
  (10k near-identical vectors) without a quadratic candidate stage, and is
  unchanged on corpora where the guard never fires;
- per-type strict metrics (seqeval classification_report analogue).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_ivf_resolve_train_mod_bounds():
    from bert_namedentityrecognition_spark.operators.similarity import (
        ivf_resolve_train_mod,
    )

    # small corpus: sample everything
    assert ivf_resolve_train_mod(500, 16) == 1
    # default target = 256 * n_centroids = 4096
    assert ivf_resolve_train_mod(4096, 16) == 1
    assert ivf_resolve_train_mod(4097, 16) == 2
    # the 100x-scale case the round-2 default got wrong: 10^9 vectors must
    # NOT collect n/2 — expected sample = n / train_mod ≈ 4096
    tm = ivf_resolve_train_mod(10**9, 16)
    assert 10**9 / tm <= 4096 + 1
    with pytest.raises(ValueError):
        ivf_resolve_train_mod(100, 16, max_train_sample=0)


def test_ivf_training_collect_bounded_at_100x(spark):
    """Corpus 100× the sample target: the driver collect must stay ~target
    rows (VERDICT r2 'Next round' #1 done-condition)."""
    from bert_namedentityrecognition_spark.operators.similarity import (
        ivf_resolve_train_mod,
        ivf_train,
        ivf_training_sample,
    )

    target = 8
    n = 100 * target
    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(4)]) for i in range(n)]
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    tm = ivf_resolve_train_mod(n, n_centroids=4, max_train_sample=target)
    assert tm == 100
    sample = ivf_training_sample(vectors, tm)
    # universal-hash residues are near-uniform; 2x leaves room for variance
    assert len(sample) <= 2 * target
    assert len(sample) >= 4  # still enough to seed n_centroids=4
    cents = ivf_train(vectors, n_centroids=4, max_train_sample=target)
    assert len(cents) == 4 and all(len(c) == 4 for c in cents)


def _near_identical(spark, n: int, dim: int):
    rng = np.random.RandomState(11)
    base = rng.randn(dim) * 2.0
    rows = [
        (i, [float(x) for x in base + rng.randn(dim) * 1e-6]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_hot_bucket_guard_adversarial(spark):
    """10k near-identical vectors: every vector lands in ONE bucket at every
    re-hash level (identical signs survive any hyperplane set), so the
    neighbor-window fallback must fire. Candidate count is k·W − W(W+1)/2 —
    linear in k — where all-pairs would be k²/2 ≈ 50M."""
    from bert_namedentityrecognition_spark.operators.similarity import (
        embedding_near_dup_bucket_stats,
        embedding_near_dup_pairs,
    )

    n, w = 10_000, 64
    vectors = _near_identical(spark, n, dim=8)
    pairs = embedding_near_dup_pairs(
        vectors, threshold=0.95, m_bits=4, dim=8,
        bucket_cap=100, rehash_levels=2, rehash_bits=4, neighbor_window=w,
    )
    expected = n * w - w * (w + 1) // 2
    # all candidates are near-identical → every one passes the threshold;
    # equality also proves the candidate stage emitted exactly k·W − ... rows
    assert pairs.count() == expected
    stats = embedding_near_dup_bucket_stats(
        vectors, m_bits=4, dim=8, bucket_cap=100,
        rehash_levels=2, rehash_bits=4, neighbor_window=w,
    ).collect()
    assert len(stats) == 1 and stats[0].truncated
    assert stats[0].size == n
    assert stats[0].pairs_skipped == n * (n - 1) // 2 - expected


def test_rehash_splits_mixed_hot_bucket(spark):
    """A bucket that is hot because DISTINCT clusters collided (not
    near-identical mass) gets split by the re-hash levels instead of
    truncated: stats must show no truncated bucket."""
    from bert_namedentityrecognition_spark.operators.similarity import (
        embedding_near_dup_bucket_stats,
    )

    rng = np.random.RandomState(7)
    centers = rng.randn(8, 16) * 3
    rows = [
        (i, [float(x) for x in centers[i % 8] + rng.randn(16) * 0.3])
        for i in range(2000)
    ]
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # m_bits=0 would be degenerate; m_bits=1 forces heavy initial collision
    stats = embedding_near_dup_bucket_stats(
        vectors, m_bits=1, dim=16, bucket_cap=400,
        rehash_levels=2, rehash_bits=6, neighbor_window=64,
    ).collect()
    assert sum(s.size for s in stats) == 2000
    assert not any(s.truncated for s in stats), [
        (s.key, s.size) for s in stats if s.truncated
    ]


def test_guard_identity_when_idle(spark):
    """On a corpus with no oversized bucket the guard must be a no-op:
    identical pairs at bucket_cap=default and bucket_cap=∞, and
    portable=True agrees with the float path away from the boundary."""
    from bert_namedentityrecognition_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    rng = np.random.RandomState(23)
    centers = rng.randn(10, 16)
    rows = [
        (i, [float(x) for x in centers[i % 10] + rng.randn(16) * 0.2])
        for i in range(500)
    ]
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def pairset(**kw):
        return {
            (r.vec_a, r.vec_b)
            for r in embedding_near_dup_pairs(
                vectors, threshold=0.8, m_bits=4, dim=16, **kw
            ).collect()
        }

    guarded = pairset()
    unguarded = pairset(bucket_cap=10**9)
    assert guarded == unguarded and len(guarded) > 0
    assert pairset(portable=True) == guarded


def test_strict_counts_by_type(spark):
    """Per-type strict P/R/F1 (seqeval classification_report analogue):
    hand-built gold/pred with one fully-missed type."""
    from bert_namedentityrecognition_spark.operators.metrics import (
        strict_span_counts_by_type,
    )

    cols = "url string, sent_id int, start int, end int, type string"
    gold = spark.createDataFrame(
        [
            ("u1", 0, 0, 2, "drug"),
            ("u1", 0, 5, 8, "symptom"),
            ("u1", 1, 1, 3, "drug"),
            ("u2", 0, 0, 4, "disease"),  # type never predicted
        ],
        cols,
    )
    pred = spark.createDataFrame(
        [
            ("u1", 0, 0, 2, "drug"),      # tp drug
            ("u1", 0, 5, 9, "symptom"),   # wrong end: fp symptom + fn symptom
            ("u1", 1, 1, 3, "drug"),      # tp drug
            ("u1", 1, 4, 6, "drug"),      # fp drug
        ],
        cols,
    )
    rows = {r.type: r for r in strict_span_counts_by_type(gold, pred).collect()}
    assert set(rows) == {"drug", "symptom", "disease"}
    d = rows["drug"]
    assert (d.tp, d.fp, d.fn) == (2, 1, 0)
    assert d.precision == pytest.approx(2 / 3, abs=1e-6)
    assert d.recall == 1.0 and d.f1 == pytest.approx(0.8, abs=1e-6)
    s = rows["symptom"]
    assert (s.tp, s.fp, s.fn) == (0, 1, 1)
    assert s.precision == 0.0 and s.recall == 0.0 and s.f1 == 0.0
    z = rows["disease"]
    assert (z.tp, z.fp, z.fn) == (0, 0, 1)
    assert z.precision == 0.0 and z.recall == 0.0 and z.f1 == 0.0


def test_ivf_derived_train_mod_twin_agreement_above_threshold(spark, tmp_path):
    """The driver gate runs at sf0.01/sf0.1 where n <= 2000 < 4096, so the
    derived train_mod is always 1 there — this test is the only place the
    tm>1 branch of BOTH twins (Spark count()-derived modulus vs the DuckDB
    params CTE) executes against each other: n=10000 → tm=3."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entrymod
    from bert_namedentityrecognition_spark.operators.similarity import (
        ivf_cosine_topk,
        ivf_resolve_train_mod,
    )

    n, dim = 10_000, 64
    rng = np.random.RandomState(17)
    vecs = rng.randn(n, dim).astype(np.float32)
    path = str(tmp_path / "emb.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        ),
        path,
    )
    assert ivf_resolve_train_mod(n, 16) == 3  # the branch under test

    emb = spark.read.parquet(path)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        (r.query_id, r.rank, r.vec_id)
        for r in ivf_cosine_topk(
            emb, queries, k=5, n_centroids=16, n_probe=4
        ).select("query_id", "rank", "vec_id").collect()
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
    want = sorted(map(tuple, con.execute(entrymod._ivf_ann_sql()).fetchall()))
    assert got == want and len(got) == 15


def test_ivf_persisted_index_partition_pruned_probe(spark, tmp_path):
    """ivf_write_index → ivf_probe_index: identical results to the direct
    ivf_cosine_topk, and the probe's parquet scan lists ONLY the probed
    list_id directories (PartitionFilters — the n_probe/n_centroids scan
    cost the scale story promises, pruned at file listing, not post-scan)."""
    from bert_namedentityrecognition_spark.operators.similarity import (
        ivf_cosine_topk,
        ivf_probe_index,
        ivf_write_index,
    )

    rng = np.random.RandomState(41)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(1000)]
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = vectors.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    path = str(tmp_path / "ivf_index")
    ivf_write_index(vectors, path, n_centroids=8, seed=42)
    probed = ivf_probe_index(spark, path, queries, k=5, n_probe=3)
    direct = ivf_cosine_topk(vectors, queries, k=5, n_centroids=8, n_probe=3, seed=42)
    key = lambda df: sorted(
        (r.query_id, r.rank, r.vec_id) for r in df.select("query_id", "rank", "vec_id").collect()
    )
    assert key(probed) == key(direct) and len(key(probed)) == 15

    probed.count()
    plan = probed._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    pf = scan.split("PartitionFilters: [")[1].split("]")[0]
    assert "list_id" in pf, pf
