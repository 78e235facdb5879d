"""Golden test: nested-XML span extraction (``util/iob_util.py:421-428``).

The expected tuples were derived by tracing the reference algorithm
(start/end pull-parser events, running char offset, inner-close extends
enclosing spans, tails NOT appended to enclosing words) over its own
``__main__`` smoke string.
"""

import pytest

from bert_namedentityrecognition_spark.oracle import xml_to_taglist, xml_text_to_iob
from bert_namedentityrecognition_spark.oracle.xmlspan import XmlSpanError

GOLDEN = (
    "This is a <c><core>test</core></c> <a>string <core>containing</core> "
    "multiple</a> tags <d>stacked</d>."
)
CLEAN = "This is a test string containing multiple tags stacked."


def test_nested_golden_case():
    res, label = xml_to_taglist(GOLDEN)
    assert res == CLEAN
    assert label == [
        (10, 14, "core", "test"),
        (10, 14, "c", "test"),
        (22, 32, "core", "containing"),
        (15, 32, "a", "string containing"),
        (47, 54, "d", "stacked"),
    ]
    for s, e, _, w in label:
        assert res[s:e].startswith(w) or w in res[s:e] or res[s:e] == w


def test_tag_filter():
    res, label = xml_to_taglist(GOLDEN, tag_list=["c", "d"])
    assert res == CLEAN
    assert [t[2] for t in label] == ["c", "d"]


def test_attr_concat():
    res, label = xml_to_taglist('頭痛と<C MOD="N">発熱</C>', attr=["MOD"])
    assert res == "頭痛と発熱"
    assert label == [(3, 5, "CN", "発熱")]


def test_attr_ignored_when_not_whitelisted():
    res, label = xml_to_taglist('頭痛と<C MOD="N">発熱</C>')
    assert label == [(3, 5, "C", "発熱")]


def test_mismatched_raises():
    with pytest.raises(XmlSpanError):
        xml_to_taglist("broken <C>tag")


def test_byte_identical_text_invariant():
    # per-row invariant: extracted clean text byte-identical to untagged text
    plain = "ロキソニンを服用後、頭痛が改善した。"
    tagged = "<M>ロキソニン</M>を服用後、<C>頭痛</C>が改善した。"
    res, label = xml_to_taglist(tagged)
    assert res == plain
    assert [(t[0], t[1], t[3]) for t in label] == [(0, 5, "ロキソニン"), (10, 12, "頭痛")]
    for s, e, _, w in label:
        assert res[s:e] == w


def test_xml_text_to_iob_char_tokenizer():
    iob = xml_text_to_iob("私は<C>宇宙人</C>だ")
    assert iob == [
        ("私", "O"),
        ("は", "O"),
        ("宇", "B-C"),
        ("宙", "I-C"),
        ("人", "I-C"),
        ("だ", "O"),
    ]


def test_xml_text_to_iob_drops_spaces_and_newlines():
    iob = xml_text_to_iob("a <C>b</C>\nc")
    assert [t for t, _ in iob] == ["a", "b", "c"]


def test_depth2_nesting_reference_quirk():
    """Depth-2 nesting: the enclosing span absorbs the closed child's TAIL
    (the stale `word` at close time) and drops the child's own text — the
    reference's convert_xml_to_taglist (iob_util.py:231-238) does exactly
    this (`tag[3] += word` after the child's end event reset `word` to its
    tail), and the oracle is bug-compatible by design."""
    from bert_namedentityrecognition_spark.oracle.xmlspan import xml_to_taglist

    res, label = xml_to_taglist("<a>x<b>y<c>z</c>w</b>v</a>")
    assert res == "xyzwv"
    assert label == [
        (2, 3, "c", "z"),
        (1, 3, "b", "yz"),
        (0, 4, "a", "xzw"),
    ]
