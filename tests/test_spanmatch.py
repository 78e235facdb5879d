"""Golden tests: the 13 span-match scenarios of ``util/xlarge.py:125-222``.

Expected scores hand-derived by executing the reference algorithm on paper
(documented per case below); these pin exact parity of the taxonomy scorer.
"""

import pytest

from bert_namedentityrecognition_spark.oracle import score_from_iob

O, B, I = "O", "B", "I"
m, d = "-m", "-d"

GOLD = [O, O, B, I, I, I, O, O, O, O, B, I, I, I, I, O, O]

SCENARIOS = [
    # (test_tags, expected_score, comment)
    (GOLD, 1.0, "exact x2"),
    ([O, B, I, I, I, I, O, O, O, B, I, I, I, I, I, O, O], 0.5, "exceeding x2"),
    ([O, B, I, O, B, I, O, O, O, O, B, I, I, I, I, O, O], 0.75, "partial + exact"),
    ([O, B, I, O, O, O, O, O, B, I, O, O, O, O, O, O, O], 0.25, "partial + missing"),
    ([O, B, I, O, B, I, O, B, I, O, B, I, O, B, I, O, O], 0.5, "fragmented"),
    ([O, B, I, I, I, I, I, I, I, I, I, I, I, I, I, O, O], 0.0, "one giant overlap"),
    ([O, B, I, I, I, I, I, I, O, O, B, I, I, I, I, I, I], 0.5, "exceeding both"),
    ([O, O, O, B, I, I, O, O, O, O, O, B, I, I, O, O, O], 0.5, "contained x2"),
    ([O, B, I, I, I, I, I, I, I, I, I, I, O, B, I, I, I], 0.0, "overlap-next x2"),
    ([O] * 17, 0.0, "all missing"),
]


@pytest.mark.parametrize("test_tags,expected,comment", SCENARIOS)
def test_xlarge_scenarios(test_tags, expected, comment):
    assert score_from_iob(GOLD, test_tags) == pytest.approx(expected), comment


def test_empty_gold_returns_raw_score():
    gold = [O] * 17
    test = [O, O, B, I, I, I, O, O, O, O, B, I, I, I, I, O, O]
    assert score_from_iob(gold, test) == pytest.approx(0.0)


def test_scenario_12_shifted_fragments():
    gold = [O, O, B, I, I, I, O, O, O, O, B, I, I, I, O, O, O]
    test = [O, B, I, O, O, B, I, O, O, B, I, O, O, B, I, O, O]
    assert score_from_iob(gold, test) == pytest.approx(0.5)


def test_scenario_13_type_mismatch():
    gold = [O, O, B + m, I + m, I + m, I + m, O, O, O, O, B + d, I + d, I + d, I + d, I + d, O, O]
    test = [O, O, B + m, I + m, I + m, I + m, O, O, O, O, B + m, I + m, I + m, I + m, I + m, O, O]
    assert score_from_iob(gold, test) == pytest.approx(0.5)


def test_result_breakdown_dict():
    out = {}
    test = [O, B, I, O, B, I, O, O, O, O, B, I, I, I, I, O, O]
    score_from_iob(GOLD, test, out)
    assert out["exact_match"] == 1
    assert out["partial_match"] == 1
    assert out["incorrect_match"] == 1
    assert out["missing_match"] == 0
