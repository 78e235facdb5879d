"""End-to-end Spark pipeline vs pure-Python oracle — the P/R ≥ 0.95 gate."""

import pytest

from bert_namedentityrecognition_spark.plans.oracle_pipeline import (
    oracle_mentions,
    oracle_triples,
    triples_prf,
)
from bert_namedentityrecognition_spark.plans.pipeline import run_kg_pipeline
from bert_namedentityrecognition_spark.sources import fixtures


@pytest.fixture(scope="module")
def corpus():
    return fixtures.generate_pages(n_docs=150, seed=42)


@pytest.fixture(scope="module")
def term_types():
    return fixtures.pipeline_term_types()


def test_sentences_match_oracle(spark, corpus):
    from bert_namedentityrecognition_spark.operators.sentences import pages_to_sentences
    from bert_namedentityrecognition_spark.oracle.textproc import (
        preprocess_text,
        split_sentences,
    )

    pages = fixtures.pages_to_spark(spark, corpus)
    got = {
        (r.url, r.sent_id, r.sent)
        for r in pages_to_sentences(pages).collect()
    }
    want = set()
    for row in corpus:
        if row["text"] in (None, "") or row["lang"] != "ja":
            continue
        for i, s in enumerate(split_sentences(preprocess_text(row["text"]))):
            if len(s) <= 512:
                want.add((row["url"], i, s))
    assert got == want
    assert len(want) > 50


def test_mentions_match_oracle_exactly(spark, corpus, term_types):
    from bert_namedentityrecognition_spark.operators.sentences import pages_to_sentences
    from bert_namedentityrecognition_spark.operators.tagger import tag_sentences

    pages = fixtures.pages_to_spark(spark, corpus)
    mentions = tag_sentences(pages_to_sentences(pages), term_types)
    got = {
        (r.url, r.sent_id, r.start, r.end, r.type, r.word)
        for r in mentions.collect()
    }
    want = {
        (m["url"], m["sent_id"], m["start"], m["end"], m["type"], m["word"])
        for m in oracle_mentions(corpus, term_types)
    }
    assert got == want
    assert len(want) > 100


def test_triples_match_oracle(spark, corpus, term_types):
    pages = fixtures.pages_to_spark(spark, corpus)
    dim = fixtures.entity_dim_to_spark(spark)
    out = run_kg_pipeline(pages, dim, term_types, threshold=70.0)
    got = {(r.subj, r.obj): r["count"] for r in out["triples"].collect()}
    want = oracle_triples(corpus, fixtures.generate_entity_dim(), term_types)
    prf = triples_prf(want, got)
    assert prf["precision"] >= 0.95, (prf, sorted(set(got) - set(want))[:10])
    assert prf["recall"] >= 0.95, (prf, sorted(set(want) - set(got))[:10])
    # we target exactness, not just the 0.95 gate
    assert got == want


def test_no_symptoms_rows_present(spark, corpus, term_types):
    pages = fixtures.pages_to_spark(spark, corpus)
    dim = fixtures.entity_dim_to_spark(spark)
    out = run_kg_pipeline(pages, dim, term_types)
    ns = out["triples"].filter("obj = 'No Symptoms'").count()
    want = oracle_triples(corpus, fixtures.generate_entity_dim(), term_types)
    want_ns = sum(1 for (d, o) in want if o == "No Symptoms")
    assert (ns > 0) == (want_ns > 0)


def test_fuzzy_normalization_fires(spark, corpus, term_types):
    pages = fixtures.pages_to_spark(spark, corpus)
    dim = fixtures.entity_dim_to_spark(spark)
    out = run_kg_pipeline(pages, dim, term_types)
    methods = {
        r.method for r in out["normalized"].select("method").distinct().collect()
    }
    assert "exact" in methods
    assert "fuzzy" in methods  # near-miss surfaces route through the fuzzy join


def test_alias_canonicalization(spark):
    from bert_namedentityrecognition_spark.operators.canonicalize import (
        canonical_alias_map,
        connected_components,
    )

    edges = spark.createDataFrame(
        [("B", "A"), ("C", "B"), ("Y", "X")], ["src", "dst"]
    )
    comp = {r.node: r.component for r in connected_components(edges).collect()}
    assert comp["A"] == comp["B"] == comp["C"]
    assert comp["X"] == comp["Y"]
    assert comp["A"] != comp["X"]

    dim = fixtures.entity_dim_to_spark(spark)
    alias = spark.createDataFrame(fixtures.generate_alias_edges(), ["src", "dst"])
    amap = {
        r.surface: r.canonical_surface
        for r in canonical_alias_map(alias, dim).collect()
    }
    assert amap["ロキソプロフェンナトリウム"] == "ロキソニン"
    assert amap["ロキソプロフェン"] == "ロキソニン"


def test_oracle_mentions_html_fallback_and_langless_parity(spark):
    """The P/R ground-truth twin must apply the same input contract as the
    Spark paths (CLAUDE.md rule 10): html-only rows decode via the html
    fallback, and rows without a lang column are NOT filtered."""
    from bert_namedentityrecognition_spark.operators.tagger import extract_mentions

    tt = fixtures.pipeline_term_types()
    text = "ロキソニンを服用後、頭痛が出現した。"
    html = ("<html><body><p>" + text + "</p></body></html>").encode()
    corpus = [
        {"url": "https://h", "warc_ts": None, "html": html, "text": None,
         "lang": "ja"},
        {"url": "https://t", "warc_ts": None, "html": None, "text": text,
         "lang": "ja"},
    ]
    want = {
        (m["url"], m["sent_id"], m["start"], m["end"], m["type"], m["word"])
        for m in oracle_mentions(corpus, tt)
    }
    assert any(u == "https://h" for (u, *_) in want)  # fallback fired
    pages = fixtures.pages_to_spark(spark, corpus)
    got = {
        (r.url, r.sent_id, r.start, r.end, r.type, r.word)
        for r in extract_mentions(pages, tt).collect()
    }
    assert got == want

    # lang-less row dicts (no 'lang' key) pass through, mirroring the
    # column-existence check on the Spark side
    langless = [{"url": "https://x", "text": text}]
    assert oracle_mentions(langless, tt)
