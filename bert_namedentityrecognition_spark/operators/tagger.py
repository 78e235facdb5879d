"""Dictionary (gazetteer) NER tagger — sentences → mentions.

The scale path of the reference's containment join
(``util/text_utils.py:154-192`` + ``knowledge_bases/hyakuyaku.py:71-88``):
instead of scanning the text once per dictionary term (O(|text|·|dict|)),
an Aho-Corasick automaton is built ONCE on the driver from the (small)
dictionary, broadcast to executors, and each Arrow batch is scanned in
O(|text|). Longest-first overlap masking matches the reference greedy loop
exactly (property-tested in tests/test_oracle_text_fuzzy.py).

Matching happens on han_to_zen-normalized text — identical normalization to
the dictionary side (``knowledge_bases/manbyo.py:58``), the invariant that
keeps downstream joins consistent.

Output: mentions(url, sent_id, start, end, type, word) — char offsets into
the normalized sentence, end-exclusive.

For parity with the model path the matcher result is round-tripped through
char-level IOB tags and the reference BIO FSM (so the production decode code
path is exercised even with the dictionary stand-in model).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..oracle.iob import iob_to_spans
from ..oracle.matcher import automaton_match, build_automaton
from ..oracle.textproc import han_to_zen, html_to_text

MENTION_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("sent_id", T.IntegerType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("word", T.StringType(), False),
    ]
)


def matches_to_iob(text: str, matches: list[tuple[int, int, str]], types: dict[str, str]) -> list[str]:
    """Char-level IOB2 tags from non-overlapping matches."""
    tags = ["O"] * len(text)
    for s, e, term in matches:
        ttype = types[term]
        tags[s] = "B-" + ttype
        for i in range(s + 1, e):
            tags[i] = "I-" + ttype
    return tags


def tag_sentences(
    sentences: DataFrame,
    term_types: dict[str, str],
    decode_via_iob: bool = True,
    normalize: bool = True,
) -> DataFrame:
    """sentences(url, sent_id, sent) → mentions. One Arrow stage, no shuffle.

    term_types: dictionary surface → entity type (e.g. 'drug'/'symptom').
    With ``normalize`` (reference behavior) text and surfaces are
    han_to_zen-normalized before matching; disable for ASCII corpora where
    surfaces should surface verbatim.
    """
    normalized_types = {
        (han_to_zen(k) if normalize else k): v for k, v in term_types.items()
    }
    terms = list(normalized_types)
    sc = sentences.sparkSession.sparkContext
    bc = sc.broadcast((terms, normalized_types, normalize))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        term_list, types, do_norm = bc.value
        automaton = build_automaton(term_list)
        for pdf in batches:
            urls, sids, starts, ends, tps, words = [], [], [], [], [], []
            for url, sid, sent in zip(pdf["url"], pdf["sent_id"], pdf["sent"]):
                text = han_to_zen(sent) if do_norm else sent
                matches = automaton_match(text, automaton)
                if decode_via_iob:
                    tags = matches_to_iob(text, matches, types)
                    for span in iob_to_spans(list(text), tags):
                        urls.append(url)
                        sids.append(sid)
                        starts.append(span["start"])
                        ends.append(span["end"])
                        tps.append(span["type"])
                        words.append(span["word"])
                else:
                    for s, e, term in matches:
                        urls.append(url)
                        sids.append(sid)
                        starts.append(s)
                        ends.append(e)
                        tps.append(types[term])
                        words.append(term)
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="object"),
                    "sent_id": pd.Series(sids, dtype="int32"),
                    "start": pd.Series(starts, dtype="int32"),
                    "end": pd.Series(ends, dtype="int32"),
                    "type": pd.Series(tps, dtype="object"),
                    "word": pd.Series(words, dtype="object"),
                }
            )

    return sentences.mapInPandas(run, schema=MENTION_SCHEMA)


def _pages_text_source(
    pages: DataFrame,
    text_col: str,
    key_col: str,
    html_col: str | None,
    lang_filter: str | None,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(url, text, _html[, *extra_cols]) source for the fused Arrow stages.

    _html is null unless the row needs the html→text fallback (text null or
    empty): the pushable filter keeps text-or-html rows, and the JVM-side
    ``when`` gate keeps html bytes out of the Arrow transfer for text rows.
    EVERY pages consumer must come through here (CLAUDE.md rule 10) so the
    input contract — fallback + lang gating — stays in one place;
    ``extra_cols`` carries additional passthrough columns (e.g. warc_ts
    for the streaming pair path)."""
    has_text = F.col(text_col).isNotNull() & (F.col(text_col) != "")
    if html_col is not None and html_col in pages.columns:
        df = pages.filter(has_text | F.col(html_col).isNotNull())
        html_arg = F.when(~has_text, F.col(html_col))
    else:
        df = pages.filter(has_text)
        html_arg = F.lit(None).cast("binary")
    if lang_filter is not None and "lang" in pages.columns:
        df = df.filter(F.col("lang") == lang_filter)
    return df.select(
        F.col(key_col).alias("url"),
        F.col(text_col).alias("text"),
        html_arg.alias("_html"),
        *[F.col(c) for c in extra_cols],
    )


def extract_mentions(
    pages: DataFrame,
    term_types: dict[str, str],
    max_length: int = 512,
    lang_filter: str | None = "ja",
    normalize: bool = True,
    text_col: str = "text",
    key_col: str = "url",
    html_col: str | None = "html",
) -> DataFrame:
    """Fused pages → mentions: preprocess + sentence-split + 512-filter +
    han_to_zen + tag + BIO decode in ONE Arrow stage.

    Semantically identical to ``pages_to_sentences`` → ``tag_sentences``
    (sent_ids are assigned before the length filter, matching the oracle),
    but with a single Python runner section per Spark stage. Chaining two
    Python sections inside one stage serializes them through paired workers
    with blocking JVM handoffs — measured 10-15× slower at 32 local cores —
    so the fused form is the production path; the two-step form remains for
    when a sentences table is itself a wanted output.

    html→text fallback (input_hint): null/empty-text rows with html bytes
    are decoded inside the SAME Python section. The html argument is
    null-gated JVM-side (``when(NOT has_text, html)``) so Arrow never ships
    html bytes for pages that already carry text.
    """
    from ..oracle.textproc import preprocess_text, split_sentences

    normalized_types = {
        (han_to_zen(k) if normalize else k): v for k, v in term_types.items()
    }
    sc = pages.sparkSession.sparkContext
    bc = sc.broadcast((list(normalized_types), normalized_types, normalize, max_length))

    src = _pages_text_source(pages, text_col, key_col, html_col, lang_filter)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        term_list, types, do_norm, maxlen = bc.value
        automaton = build_automaton(term_list)
        for pdf in batches:
            urls, sids, starts, ends, tps, words = [], [], [], [], [], []
            for url, text, hb in zip(pdf["url"], pdf["text"], pdf["_html"]):
                if text is None or text == "":
                    text = html_to_text(hb) if hb is not None else ""
                    if not text:
                        continue
                for sid, sent in enumerate(split_sentences(preprocess_text(text))):
                    if len(sent) > maxlen:
                        continue
                    norm = han_to_zen(sent) if do_norm else sent
                    matches = automaton_match(norm, automaton)
                    if not matches:
                        continue
                    tags = matches_to_iob(norm, matches, types)
                    for span in iob_to_spans(list(norm), tags):
                        urls.append(url)
                        sids.append(sid)
                        starts.append(span["start"])
                        ends.append(span["end"])
                        tps.append(span["type"])
                        words.append(span["word"])
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="object"),
                    "sent_id": pd.Series(sids, dtype="int32"),
                    "start": pd.Series(starts, dtype="int32"),
                    "end": pd.Series(ends, dtype="int32"),
                    "type": pd.Series(tps, dtype="object"),
                    "word": pd.Series(words, dtype="object"),
                }
            )

    return src.mapInPandas(run, schema=MENTION_SCHEMA)
