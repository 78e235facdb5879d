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

from ..operators.tagger import extract_mentions


def stream_pages(spark: SparkSession, pages_dir: str, schema) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )


def streaming_mentions(
    pages_stream: DataFrame,
    term_types: dict[str, str],
    model=None,
    label_vocab=None,
) -> DataFrame:
    """Stateless stages compose identically on a streaming DataFrame.

    With ``model``/``label_vocab`` the NER stage is the real model path
    (``ner_pages`` — fused preprocess + split + batched forward + BIO
    decode in one Arrow section, broadcast weights): ``mapInPandas`` is
    stateless, so the identical operator runs on micro-batches unchanged
    and the streaming mention set equals the batch one
    (tests/test_streaming_triples.py)."""
    if model is not None:
        from ..operators.ner import ner_pages

        return ner_pages(pages_stream, model, label_vocab)
    return extract_mentions(pages_stream, term_types)


def streaming_pairs(
    pages_stream: DataFrame,
    dim_rows: list[dict],
    term_types: dict[str, str],
    threshold: float = 70.0,
    remove_duplicates: bool = True,
    lang_filter: str | None = "ja",
) -> DataFrame:
    """pages stream → (warc_ts, subj, obj) pair rows, ONE Arrow stage.

    Streaming needs no pairing join at all: a page is a single row, so
    extract → normalize (broadcast dim, oracle kernels) → per-doc dedup →
    all-pairs (+No Symptoms) are row-local. The only stateful operator left
    downstream is the windowed count — exactly the shape Structured
    Streaming supports without stream-stream joins.
    """
    from collections.abc import Iterator

    import pandas as pd

    from ..operators.normalize import build_dim_index, resolve_surfaces_driver
    from ..operators.tagger import _pages_text_source
    from ..oracle.ade import NO_SYMPTOMS
    from ..oracle.matcher import automaton_match, build_automaton
    from ..oracle.textproc import (
        han_to_zen,
        html_to_text,
        preprocess_text,
        split_sentences,
    )

    normalized_types = {han_to_zen(k): v for k, v in term_types.items()}
    sc = pages_stream.sparkSession.sparkContext
    bc = sc.broadcast((list(normalized_types), normalized_types, dim_rows, threshold))

    # the shared pages contract (rule 10): html→text fallback rows pass
    # through with _html set — a WARC-sourced stream carries text=None by
    # design, and a bare text filter would silently drop every page
    src = _pages_text_source(
        pages_stream, "text", "url", "html", lang_filter, extra_cols=("warc_ts",)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        terms, types, dims, thr = bc.value
        automaton = build_automaton(terms)
        # one O(|dim|) index build per task, not one per distinct surface
        idx = build_dim_index(dims)
        cache: dict[tuple[str, str], tuple] = {}

        def canon(word: str, mtype: str) -> str:
            key = (word, mtype)
            if key not in cache:
                rec = resolve_surfaces_driver([key], dims, thr, index=idx)[0]
                cache[key] = rec
            return cache[key][2] or ""

        for pdf in batches:
            ts_out, subj_out, obj_out = [], [], []
            for ts, text, hb in zip(pdf["warc_ts"], pdf["text"], pdf["_html"]):
                if text is None or text == "":
                    text = html_to_text(hb) if hb is not None else ""
                    if not text:
                        continue
                drugs: list[str] = []
                syms_raw: list[str] = []
                for sent in split_sentences(preprocess_text(text)):
                    if len(sent) > 512:
                        continue
                    norm = han_to_zen(sent)
                    for s, e, term in automaton_match(norm, automaton):
                        if types[term] == "drug":
                            drugs.append(norm[s:e])
                        else:
                            syms_raw.append(norm[s:e])
                if remove_duplicates:
                    drug_list = sorted(set(drugs))
                    sym_list = sorted(set(syms_raw))
                else:
                    drug_list, sym_list = drugs, syms_raw
                objs = [
                    c
                    for c in (canon(w, "symptom").strip() for w in sym_list)
                    if c != "" and len(c) >= 2
                ]
                for d in drug_list:
                    d = d.strip()
                    if len(d) < 2:
                        continue
                    if not syms_raw:
                        ts_out.append(ts)
                        subj_out.append(d)
                        obj_out.append(NO_SYMPTOMS)
                    else:
                        for o in objs:
                            ts_out.append(ts)
                            subj_out.append(d)
                            obj_out.append(o)
            yield pd.DataFrame({"warc_ts": ts_out, "subj": subj_out, "obj": obj_out})

    return src.mapInPandas(run, schema="warc_ts timestamp, subj string, obj string")


def streaming_triples(
    pages_stream: DataFrame,
    dim: DataFrame,
    term_types: dict[str, str],
    watermark: str = "1 hour",
    window: str = "1 hour",
) -> DataFrame:
    """Windowed (subj, obj) counts with late-data handling: the row-local
    pair extraction above + exactly one watermarked streaming aggregation."""
    pairs = streaming_pairs(
        pages_stream, [r.asDict() for r in dim.collect()], term_types
    )
    return (
        pairs.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "subj", "obj")
        .agg(F.count("*").alias("count"))
    )


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
