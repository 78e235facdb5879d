"""Cross-batch stateful dedup via applyInPandasWithState."""

import time


def test_dedup_stream_across_microbatches(spark, tmp_path):
    from bert_namedentityrecognition_spark.streaming.stateful import dedup_stream

    src = tmp_path / "docs"
    src.mkdir()
    df1 = spark.createDataFrame([(1, "a b c"), (10, "x y z")], "doc_id long, text string")
    df2 = spark.createDataFrame([(2, "a b c"), (3, "unique doc")], "doc_id long, text string")
    df1.coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    time.sleep(1.1)  # distinct mtimes → deterministic batch order
    df2.coalesce(1).write.mode("overwrite").parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = dedup_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.doc_id: r.is_duplicate for r in spark.sql("select * from dedup_state").collect()}
    assert len(rows) == 4
    # docs 1 and 2 share a fingerprint; exactly one (the earlier batch's) is
    # the keeper, the other is flagged — across micro-batch boundaries
    assert rows[1] != rows[2]
    assert rows[10] is False and rows[3] is False
