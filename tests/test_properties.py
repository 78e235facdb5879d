"""Hypothesis property tests for the oracle kernels (pure Python)."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from bert_namedentityrecognition_spark.oracle import (
    han_to_zen,
    iob_to_spans,
    ratio,
    split_sentences,
)
from bert_namedentityrecognition_spark.oracle.iob import spans_to_xml
from bert_namedentityrecognition_spark.oracle.xmlspan import xml_to_taglist

JP = "頭痛発熱薬を服用した。improvedＡＢ ab12。．？！"


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=JP, max_size=80))
def test_split_sentences_invariants(text):
    parts = split_sentences(text)
    # no empties, all stripped, and content preserved up to whitespace
    assert all(p == p.strip() and p != "" for p in parts)
    joined = "".join(parts)
    assert re.sub(r"\s", "", joined) == re.sub(r"\s", "", text)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_han_to_zen_idempotent_and_length_bounded(text):
    once = han_to_zen(text)
    assert han_to_zen(once) == once  # idempotent
    assert len(once) <= len(text)  # dakuten pairs can only shrink


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abc", max_size=12), st.text(alphabet="abc", max_size=12))
def test_ratio_metric_properties(a, b):
    r = ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert ratio(a, b) == ratio(b, a)  # symmetric
    assert ratio(a, a) == 100.0


_tag_strategy = st.lists(
    st.sampled_from(["O", "B-C", "I-C", "B-M", "I-M"]), max_size=20
)


@settings(max_examples=300, deadline=None)
@given(_tag_strategy)
def test_iob_spans_wellformed(tags):
    spans = iob_to_spans(["x"] * len(tags), tags)
    prev_end = -1
    for d in spans:
        assert 0 <= d["start"] < d["end"] <= len(tags)
        assert d["start"] >= prev_end  # non-overlapping, ordered
        prev_end = d["end"]
        assert d["word"] == "x" * (d["end"] - d["start"])
        # every position inside a span is non-O
        assert all(tags[i] != "O" for i in range(d["start"], d["end"]))
    # every non-O position is covered by some span
    covered = {i for d in spans for i in range(d["start"], d["end"])}
    assert covered == {i for i, t in enumerate(tags) if t != "O"}


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(1, 5), st.sampled_from(["C", "M"])),
        max_size=4,
    )
)
def test_xml_roundtrip_spans(raw):
    """spans → inline XML → parse back: offsets and words survive."""
    text = "абвгдежзиклмнопрст"[:18]
    spans = []
    cursor = 0
    for start_off, length, t in sorted(raw):
        start = max(cursor, start_off)
        end = min(start + length, len(text))
        if start >= end:
            continue
        spans.append({"start": start, "end": end, "type": t})
        cursor = end
    xml = spans_to_xml(text, spans)
    clean, labels = xml_to_taglist(xml)
    assert clean == text
    got = [(s, e, t) for s, e, t, _ in labels]
    assert sorted(got) == sorted((d["start"], d["end"], d["type"]) for d in spans)
    for s, e, _, w in labels:
        assert clean[s:e] == w
