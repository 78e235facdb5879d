"""Streaming windowed triple counts: watermark + window aggregation."""


from bert_namedentityrecognition_spark.sources import fixtures


def test_streaming_triples_windowed_counts(spark, tmp_path):
    from bert_namedentityrecognition_spark.streaming.stream_pipeline import (
        stream_pages,
        streaming_triples,
    )

    corpus = fixtures.generate_pages(100, seed=9)
    pages = fixtures.pages_to_spark(spark, corpus)
    src = str(tmp_path / "pages")
    pages.write.mode("overwrite").parquet(src)
    dim = fixtures.entity_dim_to_spark(spark)
    tt = fixtures.pipeline_term_types()

    agg = streaming_triples(
        stream_pages(spark, src, pages.schema), dim, tt, window="1 hour"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("triples_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "select subj, obj, sum(count) as c from triples_stream group by subj, obj"
    ).collect()
    got_map = {(r.subj, r.obj): r.c for r in got}
    assert got_map, "stream produced no windowed counts"

    # batch equivalent over the same pages (document scope, dedup, canonical)
    from bert_namedentityrecognition_spark.plans.pipeline import run_kg_pipeline

    batch = run_kg_pipeline(pages, dim, tt)["triples"]
    want = {(r.subj, r.obj): r["count"] for r in batch.collect()}
    # summed across time windows, streaming counts must equal batch counts
    assert got_map == want


def test_streaming_model_path_equals_batch(spark, tmp_path):
    """The real-model NER stage streams unchanged: streaming_mentions with
    a numpy-BERT checkpoint over micro-batches produces exactly the batch
    mention set (mapInPandas is stateless, weights broadcast once)."""
    from bert_namedentityrecognition_spark.operators.bert_numpy import (
        init_token_classifier_state,
    )
    from bert_namedentityrecognition_spark.operators.ner import (
        CharTokenizer,
        NumpyTokenClassifier,
        label_vocab_for_types,
        ner_pages,
    )
    from bert_namedentityrecognition_spark.oracle.textproc import han_to_zen
    from bert_namedentityrecognition_spark.streaming.stream_pipeline import (
        stream_pages,
        streaming_mentions,
    )

    corpus = fixtures.generate_pages(40, seed=3)
    pages = fixtures.pages_to_spark(spark, corpus)
    src = str(tmp_path / "pages")
    pages.write.mode("overwrite").parquet(src)

    alphabet = sorted(
        {c for r in corpus if r["text"] for c in han_to_zen(r["text"])}
    )
    tok = CharTokenizer(alphabet)
    vocab = label_vocab_for_types(["drug", "symptom"])
    sd = init_token_classifier_state(
        vocab_size=len(tok.itos), num_labels=len(vocab.itos), hidden=32,
        layers=1, heads=2, intermediate=64, seed=13,
    )
    model = NumpyTokenClassifier(sd, tok)

    m = streaming_mentions(
        stream_pages(spark, src, pages.schema), {}, model=model, label_vocab=vocab
    )
    q = (
        m.writeStream.format("memory")
        .queryName("model_mentions_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.url, r.sent_id, r.start, r.end, r.type, r.word)
        for r in spark.sql("select * from model_mentions_stream").collect()
    }
    want = {
        (r.url, r.sent_id, r.start, r.end, r.type, r.word)
        for r in ner_pages(pages, model, vocab).collect()
    }
    assert got == want and len(got) > 0
