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
