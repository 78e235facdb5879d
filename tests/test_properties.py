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


@given(
    st.lists(
        st.text(alphabet="abc日本語 ", min_size=0, max_size=12), min_size=0, max_size=6
    ),
    st.text(alphabet="var x=1;<>&", min_size=0, max_size=20),
)
def test_html_to_text_properties(paragraphs, script_body):
    """html_to_text: deterministic; script/style subtrees never leak; block
    structure becomes newlines; re-applying to the (tag-free) output only
    ever re-collapses whitespace."""
    from bert_namedentityrecognition_spark.oracle.textproc import html_to_text

    html = (
        "<html><head><script>" + script_body + "</script>"
        "<style>p { color: red }</style></head><body>"
        + "".join(f"<p>{p}</p>" for p in paragraphs)
        + "</body></html>"
    ).encode("utf-8")
    out = html_to_text(html)
    assert out == html_to_text(html)  # deterministic
    assert "color: red" not in out
    # every non-whitespace paragraph survives (whitespace-collapsed)
    import re
    for p in paragraphs:
        collapsed = re.sub(r"[ \t]+", " ", p).strip()
        if collapsed:
            assert collapsed in out
    # no angle brackets survive from well-formed tags
    assert "<p>" not in out and "</p>" not in out


@given(st.binary(min_size=0, max_size=64))
def test_html_to_text_arbitrary_bytes_never_crash(blob):
    from bert_namedentityrecognition_spark.oracle.textproc import html_to_text

    out = html_to_text(blob)
    assert isinstance(out, str)
    assert out == html_to_text(blob)
