"""Idempotent-resume gate (BASELINE.md): kill mid-run, rerun, identical
final triples, no duplicates."""

import pytest

from bert_namedentityrecognition_spark.plans.ledger import MetricsLedger, resume_run
from bert_namedentityrecognition_spark.plans.pipeline import run_kg_pipeline
from bert_namedentityrecognition_spark.sources import fixtures


def _triples_set(df):
    return {(r.subj, r.obj): r["count"] for r in df.collect()}


def test_kill_rerun_identical_triples(spark, tmp_path):
    corpus = fixtures.generate_pages(120, seed=5)
    pages = fixtures.pages_to_spark(spark, corpus)
    dim = fixtures.entity_dim_to_spark(spark)
    tt = fixtures.pipeline_term_types()
    base = str(tmp_path / "run")

    # single-shot ground truth (no bucketing)
    want = _triples_set(run_kg_pipeline(pages, dim, tt)["triples"])

    # first attempt dies after bucket 2
    with pytest.raises(RuntimeError, match="injected failure"):
        resume_run(spark, pages, dim, tt, base, n_buckets=6, fail_after_bucket=2)
    ledger = MetricsLedger(base)
    committed_first = ledger.committed_buckets("mentions")
    assert committed_first == {0, 1, 2}

    # rerun resumes from the ledger: only the remaining buckets process
    got = _triples_set(resume_run(spark, pages, dim, tt, base, n_buckets=6))
    assert got == want

    # no duplicate processing: exactly one committed ledger row per bucket
    rows = ledger.rows()
    assert len(rows) == 6
    assert sorted(r["bucket"] for r in rows) == list(range(6))
    assert sum(r["n_pages"] for r in rows) == len(corpus)

    # a third run is a full no-op on the mention stage yet returns the same
    got_again = _triples_set(resume_run(spark, pages, dim, tt, base, n_buckets=6))
    assert got_again == want
    assert len(ledger.rows()) == 6
