"""Span-match taxonomy scoring (exact / exceeding / partial / missing).

Reproduces the observable behavior of ``util/xlarge.py:6-118`` including its
quirks (the overlap check indexes ``gold`` with the *prediction* counter
``i``, and ``incorrect_match`` counts unmatched distinct predicted spans).
The 13 ``__main__`` scenarios of ``util/xlarge.py:125-222`` are pinned as
golden tests in ``tests/test_spanmatch.py``.

Scores: exact=1.0; exceeding/partial=0.5; *_overlap / missing / incorrect=0.
Normalized by ``len(gold)`` when gold is non-empty.
"""

from __future__ import annotations

from .iob import iob_taglist_to_spans

RESULT_KEYS = [
    "exact_match",
    "exceeding_match",
    "exceeding_match_overlap",
    "partial_match",
    "partial_match_overlap",
    "missing_match",
    "incorrect_match",
]


def span_match_score(
    gold: list[dict],
    predicted: list[dict],
    output_dict: dict | None = None,
) -> float:
    """gold/predicted: sorted-by-start lists of {'span':(s,e),'type':t}."""
    total = 0.0
    matched: set[tuple[int, int]] = set()
    results = dict.fromkeys(RESULT_KEYS, 0)

    for entity in gold:
        found = False
        g_start, g_end = entity["span"]
        g_tag = entity["type"]
        for i in range(len(predicted)):
            if found:
                break
            p_start, p_end = predicted[i]["span"]
            if g_tag != predicted[i]["type"]:
                continue
            if g_start >= p_end:
                continue
            elif g_end <= p_start:
                break
            elif p_start == g_start and p_end == g_end:
                total += 1
                results["exact_match"] += 1
                matched.add((p_start, p_end))
                found = True
            elif p_start <= g_start and p_end >= g_end:
                # quirk preserved: overlap test peeks gold[i+1] using the
                # *prediction* index i
                if i + 1 < len(gold) and not p_end < gold[i + 1]["span"][0]:
                    results["exceeding_match_overlap"] += 1
                    matched.add((p_start, p_end))
                    found = True
                    continue
                total += 0.5
                results["exceeding_match"] += 1
                matched.add((p_start, p_end))
                found = True
            elif p_start >= g_start and p_end <= g_end:
                total += 0.5
                results["partial_match"] += 1
                matched.add((p_start, p_end))
                found = True
            else:
                # one-sided overlap
                if i + 1 < len(gold) and not p_end < gold[i + 1]["span"][0]:
                    results["partial_match_overlap"] += 1
                    matched.add((p_start, p_end))
                    found = True
                    continue
                total += 0.5
                results["partial_match"] += 1
                matched.add((p_start, p_end))
                found = True
        if not found:
            results["missing_match"] += 1

    results["incorrect_match"] = len(predicted) - len(matched)
    if isinstance(output_dict, dict):
        output_dict.update(results)
    if len(gold):
        return total / len(gold)
    return float(total)


def score_from_iob(
    gold_tags: list[str],
    pred_tags: list[str],
    output_dict: dict | None = None,
) -> float:
    gold = [
        {"span": (d["start"], d["end"]), "type": d["type"]}
        for d in sorted(iob_taglist_to_spans(gold_tags), key=lambda d: d["start"])
    ]
    pred = [
        {"span": (d["start"], d["end"]), "type": d["type"]}
        for d in sorted(iob_taglist_to_spans(pred_tags), key=lambda d: d["start"])
    ]
    return span_match_score(gold, pred, output_dict)
