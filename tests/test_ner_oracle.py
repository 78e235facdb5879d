"""The real-model NER driver query (ner_model_mentions) and its SQL twin.

The twin replays the ENTIRE BertForTokenClassification forward in DuckDB
(oracle/bert_sql.py); these tests pin the generator's exactness
preconditions and run the same Spark-vs-DuckDB comparison the driver gate
performs."""

import numpy as np
import pytest

from bert_namedentityrecognition_spark.oracle import bert_sql


def test_checkpoint_margin_and_coverage():
    """The generator's own invariants: corpus-wide argmax margin clears the
    floor, vocab covers every normalized char, sentences fit max_len-1."""
    sd, tok_itos, label_itos, seed, margin = bert_sql.ner_tiny_checkpoint()
    assert margin >= bert_sql.MARGIN_MIN
    sents = bert_sql.ner_fixture_sentences()
    alphabet = set(tok_itos)
    assert all(ch in alphabet for _, _, s in sents for ch in s)
    assert max(len(s) for _, _, s in sents) <= 511
    # float64 tensors — the forward must run in double for the replay bound
    assert sd["classifier.weight"].dtype == np.float64
    assert str(sd["_meta.hidden_act"][0]) == "gelu_new"


def test_sql_twin_matches_python_reference():
    """DuckDB full-forward replay == the pure-Python decode of the numpy
    logits (the same kernel the executors run), span for span."""
    import duckdb

    from bert_namedentityrecognition_spark.oracle.iob import iob_to_spans

    sd, tok_itos, label_itos, _seed, _margin = bert_sql.ner_tiny_checkpoint()
    sents = bert_sql.ner_fixture_sentences()
    stoi = {c: i for i, c in enumerate(tok_itos)}
    logits = bert_sql._corpus_logits(sd, sents, stoi)
    expected = set()
    for bi, (u, sid, s) in enumerate(sents):
        pred = logits[bi, 1 : len(s) + 1].argmax(axis=1)
        labels = ["O" if label_itos[i] == "[PAD]" else label_itos[i] for i in pred]
        for sp in iob_to_spans(list(s), labels):
            expected.add((u, sid, sp["start"], sp["end"], sp["type"], sp["word"]))
    # n_events=100000 → n_pages clamps to N_PAGES_MAX: the FULL inlined corpus
    con = duckdb.connect()
    got = set(
        map(tuple, con.sql(bert_sql.ner_model_mentions_sql(n_events=100000)).fetchall())
    )
    assert got == expected and len(got) > 100


def test_sf_scaled_twin_is_a_prefix_subset():
    """The params-CTE filter must select EXACTLY the url-prefix subset: the
    200-page replay == the 2000-page replay restricted to page idx < 200,
    and pages_for_events matches the SQL's integer arithmetic."""
    import duckdb

    assert bert_sql.pages_for_events(1000) == 200
    assert bert_sql.pages_for_events(10000) == 600
    assert bert_sql.pages_for_events(100000) == 2000
    assert bert_sql.pages_for_events(0) == 200  # clamp floor
    assert bert_sql.pages_for_events(10**9) == 2000  # clamp ceiling
    con = duckdb.connect()
    small = set(map(tuple, con.sql(bert_sql.ner_model_mentions_sql(n_events=1000)).fetchall()))
    big = set(map(tuple, con.sql(bert_sql.ner_model_mentions_sql(n_events=100000)).fetchall()))
    assert small == {r for r in big if int(r[0][-7:]) < 200}
    assert len(small) < len(big)


def test_spark_query_matches_oracle(spark):
    """The driver-gate comparison itself: distributed ner_pages from the
    .npz checkpoint vs the SQL twin (rows + values)."""
    import duckdb

    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    df = entrymod.queries()["ner_model_mentions"](spark, sf)
    spark_rows = {tuple(r) for r in df.collect()}
    con = duckdb.connect()
    # the production oracle string reads the sf probe from the registered
    # events view, exactly like the driver gate
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    duck_rows = set(
        map(tuple, con.sql(entrymod.oracle_sql()["ner_model_mentions"]).fetchall())
    )
    assert spark_rows == duck_rows
    assert df.columns == ["url", "sent_id", "start", "end", "type", "word"]


def test_checkpoint_roundtrip_preserves_dtype(tmp_path):
    """npz round-trip keeps float64 tensors and the vocab tables — the
    executors must see the exact doubles the oracle inlined."""
    from bert_namedentityrecognition_spark.operators.bert_numpy import (
        load_checkpoint,
    )

    p = str(tmp_path / "ck.npz")
    bert_sql.write_ner_checkpoint(p)
    sd = load_checkpoint(p)
    ref, tok_itos, label_itos, _seed, _margin = bert_sql.ner_tiny_checkpoint()
    assert sd["classifier.weight"].dtype == np.float64
    np.testing.assert_array_equal(sd["classifier.weight"], ref["classifier.weight"])
    assert [str(t) for t in sd["_meta.label_itos"]] == label_itos
