"""Skew-handling evidence (SURVEY §4 / north rule): a deliberately skewed
corpus — one drug surface in ~30% of pages and one hot (drug, symptom) cell
— must produce identical triples with and without explicit two-phase
salting, and the skew must actually be present in the data."""

from __future__ import annotations


def _skewed_pages(n: int = 1500, hot_share: float = 0.3):
    import random

    from bert_namedentityrecognition_spark.sources import fixtures

    rng = random.Random(11)
    rows = []
    n_hot = int(n * hot_share)
    for i in range(n):
        if i < n_hot:
            # the hot cell: same drug AND same symptom
            text = f"{fixtures.HOT_DRUG}を服用後、頭痛が出現した。"
        else:
            d = rng.choice(fixtures.DRUGS[1:])
            s = rng.choice(fixtures.SYMPTOMS[1:])
            text = f"{d}の投与により{s}を認めた。"
        rows.append((f"https://s/{i}", None, None, text, "ja"))
    return rows


def test_salted_pipeline_identical_on_skewed_corpus(spark):
    from bert_namedentityrecognition_spark.plans.pipeline import run_kg_pipeline
    from bert_namedentityrecognition_spark.sources import fixtures

    pages = spark.createDataFrame(
        _skewed_pages(),
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).repartition(8)
    dim = fixtures.entity_dim_to_spark(spark)
    tt = fixtures.pipeline_term_types()

    plain = {
        (r.subj, r.obj): r["count"]
        for r in run_kg_pipeline(pages, dim, tt, salt_buckets=0, persist=False)[
            "triples"
        ].collect()
    }
    salted = {
        (r.subj, r.obj): r["count"]
        for r in run_kg_pipeline(pages, dim, tt, salt_buckets=16, persist=False)[
            "triples"
        ].collect()
    }
    assert plain == salted
    # the skew is real: one cell carries ~30% of all pages
    assert plain[(fixtures.HOT_DRUG, "頭痛")] >= 0.29 * 1500
    total = sum(plain.values())
    assert plain[(fixtures.HOT_DRUG, "頭痛")] / total >= 0.25
