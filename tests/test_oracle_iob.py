"""Golden tests for the BIO FSM / span decode (reference parity).

Scenarios derived from the reference's documented behavior:
- docstring example ``util/iob_util.py:9-12``
- lenient O→I chunk start ``util/iob_util.py:386-397``
- chunk FSM edge cases (type change, B after I, leading/trailing entities)
"""

from bert_namedentityrecognition_spark.oracle import (
    iob_to_spans,
    iob_taglist_to_spans,
    is_chunk_start,
    is_chunk_end,
    lenient_entities,
    spans_to_xml,
    split_tag,
    strict_entities,
)


def spans(tags, tokens=None):
    if tokens is None:
        tokens = ["t"] * len(tags)
    return [(d["start"], d["end"], d["type"]) for d in iob_to_spans(tokens, tags)]


def test_split_tag():
    assert split_tag("B-C") == ("B", "C")
    assert split_tag("O") == ("O", None)
    assert split_tag("I-m-key") == ("I", "m-key")
    assert split_tag("X") == ("X", "")


def test_docstring_example():
    # util/iob_util.py:11 example: 私は<C>宇宙人</C>
    toks = ["私", "は", "宇", "宙", "人"]
    tags = ["O", "O", "B-C", "I-C", "I-C"]
    out = iob_to_spans(toks, tags)
    assert out == [{"start": 2, "end": 5, "type": "C", "word": "宇宙人"}]
    assert spans_to_xml("私は宇宙人", out) == "私は<C>宇宙人</C>"


def test_lenient_o_to_i_starts_chunk():
    # differs from strict IOB2: I- after O opens a chunk
    assert spans(["O", "I-C", "I-C", "O"]) == [(1, 3, "C")]
    assert strict_entities(["O", "I-C", "I-C", "O"]) == []


def test_adjacent_chunks_and_type_change():
    assert spans(["B-C", "B-C", "O"]) == [(0, 1, "C"), (1, 2, "C")]
    assert spans(["B-C", "I-M", "O"]) == [(0, 1, "C"), (1, 2, "M")]
    assert spans(["B-C", "I-C", "I-M", "I-M"]) == [(0, 2, "C"), (2, 4, "M")]


def test_boundaries():
    assert spans(["B-C", "I-C"]) == [(0, 2, "C")]
    assert spans(["I-C"]) == [(0, 1, "C")]
    assert spans(["O", "O"]) == []
    assert spans([]) == []


def test_word_accumulation():
    toks = list("abcdef")
    tags = ["O", "B-X", "I-X", "O", "B-Y", "O"]
    out = iob_to_spans(toks, tags)
    assert [d["word"] for d in out] == ["bc", "e"]


def test_taglist_variant_matches():
    tags = ["O", "B-C", "I-C", "O", "I-M", "B-M"]
    a = [(d["start"], d["end"], d["type"]) for d in iob_taglist_to_spans(tags)]
    assert a == spans(tags)


def test_fsm_primitives():
    assert is_chunk_start("O", "B-C")
    assert is_chunk_start("O", "I-C")  # lenient
    assert not is_chunk_start("B-C", "I-C")
    assert is_chunk_start("B-C", "I-M")
    assert is_chunk_end("I-C", "O")
    assert is_chunk_end("I-C", "B-C")
    assert not is_chunk_end("B-C", "I-C")
    assert is_chunk_end("B-C", "I-M")
    assert not is_chunk_end("O", "B-C")


def test_strict_vs_lenient():
    tags = ["O", "I-C", "B-C", "I-C", "O", "I-M"]
    assert lenient_entities(tags) == [(1, 2, "C"), (2, 4, "C"), (5, 6, "M")]
    assert strict_entities(tags) == [(2, 4, "C")]
