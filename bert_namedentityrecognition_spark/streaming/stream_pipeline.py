"""Structured Streaming variant of the KG pipeline.

The reference is pure batch; its closest analogue is the chunked
append-per-1000-lines loop (``scripts/predict/predict_for_jst_data_parallel.py:57-79``)
— micro-batching with an append sink. Here that becomes a real
``readStream → transform → writeStream`` pipeline:

- source: file stream over a pages directory (parquet), i.e. new WARC drops
- the stateless stages (sentences → mentions → normalize) are the *same
  operator functions* as batch — they're plan builders, so they compose with
  streaming DataFrames unchanged
- triple counting is a watermarked windowed aggregation on ``warc_ts``
  (late pages beyond the watermark are dropped deterministically)
- sink: parquet append with checkpointLocation — the exactly-once
  resume/checkpoint story the reference's XML-append loop lacked
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.normalize import normalize_mentions_udf
from ..operators.tagger import extract_mentions


def stream_pages(spark: SparkSession, pages_dir: str, schema) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )


def streaming_mentions(pages_stream: DataFrame, term_types: dict[str, str]) -> DataFrame:
    """Stateless stages compose identically on a streaming DataFrame."""
    return extract_mentions(pages_stream, term_types)


def streaming_triples(
    pages_stream: DataFrame,
    dim: DataFrame,
    term_types: dict[str, str],
    watermark: str = "1 hour",
    window: str = "1 hour",
) -> DataFrame:
    """Windowed (subj, obj) counts with late-data handling.

    Join-dedup ordering differs from batch (per-doc dedup needs the whole
    doc in one trigger — guaranteed because a page is one row), so the
    per-window counts match the batch pipeline run over the same window of
    pages.
    """
    ts = pages_stream.select("url", "warc_ts").withWatermark("warc_ts", watermark)
    mentions = streaming_mentions(pages_stream, term_types)
    normalized = normalize_mentions_udf(mentions, [r.asDict() for r in dim.collect()])
    drugs = (
        normalized.filter(F.col("type") == "drug")
        .select("url", F.trim("word").alias("subj"))
        .filter(F.length("subj") >= 2)
        .dropDuplicates(["url", "subj"])
    )
    syms = (
        normalized.filter(F.col("type") == "symptom")
        .dropDuplicates(["url", "word"])
        .select("url", F.trim("canonical").alias("obj"))
        .filter((F.col("obj") != "") & (F.length("obj") >= 2))
    )
    pairs = drugs.join(syms, "url").join(ts, "url")
    return pairs.groupBy(
        F.window("warc_ts", window).alias("w"), "subj", "obj"
    ).agg(F.count("*").alias("count"))


def start_mentions_sink(
    mentions: DataFrame, out_dir: str, checkpoint_dir: str, trigger_once: bool = True
):
    """Append mentions to parquet with exactly-once checkpointing."""
    writer = (
        mentions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
