"""Oracle tests: text preprocessing, fuzzy scoring, matching, ADE pairing."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from bert_namedentityrecognition_spark.oracle import (
    ade_pairs_from_lists,
    calculate_relaxed_metric,
    exact_match,
    extract_one,
    greedy_dictionary_match,
    han_to_zen,
    preprocess_text,
    ratio,
    span_prf,
    split_sentences,
    token_set_ratio,
)
from bert_namedentityrecognition_spark.oracle.matcher import (
    automaton_match,
    build_automaton,
)
from bert_namedentityrecognition_spark.oracle.normalize import (
    DictNormalizer,
    ExactThenFuzzyNormalizer,
)


# --- textproc ---------------------------------------------------------------


def test_preprocess():
    assert preprocess_text("  <core>頭痛</core>がする  ") == "頭痛がする"
    assert preprocess_text(" x ", remove_core_tag=False) == "x"


def test_split_sentences_japanese():
    assert split_sentences("頭痛がする。薬を飲んだ。治った。") == [
        "頭痛がする。",
        "薬を飲んだ。",
        "治った。",
    ]


def test_split_sentences_english():
    assert split_sentences("I took it. It worked! Did it?") == [
        "I took it.",
        "It worked!",
        "Did it?",
    ]


def test_split_sentences_quote_not_split():
    # 」 after 。 must not split (negative lookahead)
    out = split_sentences("「痛い。」と言った。")
    assert out[0].startswith("「痛い。」")


def test_han_to_zen():
    assert han_to_zen("ABC123") == "ＡＢＣ１２３"
    assert han_to_zen("ｱｽﾋﾟﾘﾝ") == "アスピリン"
    assert han_to_zen("ｶﾞｷﾞｸﾞ") == "ガギグ"
    assert han_to_zen("ﾊﾟﾋﾟ") == "パピ"
    assert han_to_zen("頭痛") == "頭痛"
    assert han_to_zen("a b") == "ａ　ｂ"


# --- fuzzy ------------------------------------------------------------------


def test_ratio_known_values():
    assert ratio("abc", "abc") == 100.0
    assert ratio("", "") == 100.0
    assert ratio("abc", "") == 0.0
    # LCS('abcd','abce')=3 → 2*3/8*100 = 75
    assert ratio("abcd", "abce") == 75.0
    # indel metric, symmetric
    assert ratio("頭痛", "頭痛薬") == ratio("頭痛薬", "頭痛")


def test_token_set_ratio():
    assert token_set_ratio("a b c", "c b a") == 100.0
    assert token_set_ratio("fuzzy was a bear", "fuzzy fuzzy was a bear") == 100.0


def test_extract_one_deterministic_ties():
    # both candidates score equally → lexicographically smaller wins
    cand, score = extract_one("ab", ["ax", "ay"])
    assert cand == "ax"
    assert extract_one("x", []) is None


# --- matcher ----------------------------------------------------------------


def test_exact_match_all_occurrences():
    assert exact_match("abcabc", "abc") == [(0, 3, "abc"), (3, 6, "abc")]
    assert exact_match("aaa", "aa") == [(0, 2, "aa")]  # non-overlapping


def test_exact_match_respects_ignore():
    ignore = [(0, 3)]
    assert exact_match("abcabc", "abc", ignore) == [(3, 6, "abc")]


def test_greedy_longest_first_masking():
    # "頭痛薬" claims the span before "頭痛" can
    out = greedy_dictionary_match("頭痛薬と頭痛", ["頭痛", "頭痛薬"])
    assert out == [(0, 3, "頭痛薬"), (4, 6, "頭痛")]


@settings(max_examples=200, deadline=None)
@given(
    text=st.text(alphabet="abcd", max_size=40),
    terms=st.lists(st.text(alphabet="abcd", min_size=1, max_size=5), max_size=6),
)
def test_automaton_equivalent_to_greedy(text, terms):
    auto = build_automaton(list(set(terms)))
    assert sorted(automaton_match(text, auto)) == sorted(
        greedy_dictionary_match(text, terms)
    )


# --- normalizers ------------------------------------------------------------


def test_dict_normalizer_threshold_and_sentinel():
    n = DictNormalizer({"頭痛", "発熱", "腹痛"}, threshold=70)
    term, score = n.normalize("頭痛")
    assert term == "頭痛" and score == 100.0
    term, score = n.normalize("あいうえお")
    assert term == "" and score <= 70


def test_dict_normalizer_convert_hook():
    icd = {"頭痛": "R51", "発熱": None}

    def convert(t):
        return icd.get(t) or "NO_ICD_" + t

    n = DictNormalizer({"頭痛", "発熱"}, threshold=50, convert=convert)
    assert n.normalize("頭痛")[0] == "R51"
    assert n.normalize("発熱")[0] == "NO_ICD_発熱"


def test_dict_normalizer_han_to_zen_both_sides():
    n = DictNormalizer({"ｱｽﾋﾟﾘﾝ"}, threshold=70)
    assert n.normalize("アスピリン") == ("アスピリン", 100.0)


def test_exact_then_fuzzy_sentinels():
    n = ExactThenFuzzyNormalizer(
        {"頭痛": "R51", "発熱": "[AMB]", "腹痛": "-1", "嘔吐": None, "めまい": "R42"},
        threshold=60,
    )
    assert n.normalize("頭痛") == "R51"
    assert n.normalize("発熱") == "発熱"  # ambiguous → keep term
    assert n.normalize("腹痛") == ""  # rejected
    assert n.normalize("嘔吐") == ""  # NaN
    # fuzzy → recursive exact
    assert n.normalize("めまぃ") == "R42"
    assert n.normalize("xyzqw") == ""


# --- ADE pairing ------------------------------------------------------------


def test_ade_pairs_basic_counting():
    out = ade_pairs_from_lists(
        [["薬A", "薬B"], ["薬A"]],
        [["頭痛"], ["頭痛", "発熱"]],
    )
    assert out == {
        ("薬A", "頭痛"): 2,
        ("薬B", "頭痛"): 1,
        ("薬A", "発熱"): 1,
    }


def test_ade_no_symptoms_and_short_filters():
    out = ade_pairs_from_lists(
        [["薬A", "x"], ["薬B"]],
        [[], ["あ", "頭痛"]],
    )
    assert out == {("薬A", "No Symptoms"): 1, ("薬B", "頭痛"): 1}


def test_ade_dedup_within_document():
    out = ade_pairs_from_lists(
        [["薬A", "薬A"]], [["頭痛", "頭痛"]], remove_duplicates=True
    )
    assert out == {("薬A", "頭痛"): 1}


def test_ade_normalization_hook():
    out = ade_pairs_from_lists(
        [["薬A"]], [["ずつう"]], normalize=lambda t: "頭痛"
    )
    assert out == {("薬A", "頭痛"): 1}


# --- metrics ----------------------------------------------------------------


def test_span_prf_strict():
    gold = [["B-C", "I-C", "O", "B-M"]]
    pred = [["B-C", "I-C", "O", "O"]]
    m = span_prf(gold, pred, strict=True)
    assert m["precision"] == 1.0
    assert m["recall"] == 0.5
    assert m["f1"] == 2 * 1 * 0.5 / 1.5


def test_relaxed_metric_overlap_counts_tp():
    gold = [["O", "B-C", "I-C", "I-C", "O"]]
    pred = [["O", "O", "B-C", "I-C", "I-C"]]  # shifted but overlapping
    m = calculate_relaxed_metric(gold, pred)
    assert m["C"]["tp"] == 1 and m["C"]["fp"] == 0 and m["C"]["fn"] == 0
    assert m["overall"]["f1"] == 1.0


def test_relaxed_metric_strict_entity_extraction():
    # I after O does NOT open an entity in the relaxed extractor
    gold = [["B-C", "O", "O"]]
    pred = [["O", "I-C", "O"]]
    m = calculate_relaxed_metric(gold, pred)
    assert m["C"]["tp"] == 0 and m["C"]["fn"] == 1 and m["C"]["fp"] == 0


def test_sentence_regex_is_reference_literal():
    from bert_namedentityrecognition_spark.oracle import SENTENCE_SPLIT_REGEX

    # exact literal from util/text_utils.py:38-39 — parity-critical
    assert re.compile(SENTENCE_SPLIT_REGEX)
    assert "(?<=[。．.?？!！])(?![\\.」])" in SENTENCE_SPLIT_REGEX
