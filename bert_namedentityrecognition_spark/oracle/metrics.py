"""Strict / lenient span-level P-R-F1 (seqeval-equivalent).

The reference scores predictions with seqeval (``util/iob_util.py:354-364``,
``BERT/evaluate.py:46-58``): micro precision/recall/F1 over entity spans
extracted from IOB sequences. ``mode='strict', scheme=IOB2`` extracts chunks
opening only at ``B-``; the default (lenient) mode treats ``I-`` after ``O``
as a chunk start. Both are span-set comparisons keyed by
``(sequence_index, start, end, type)``.
"""

from __future__ import annotations

from .iob import lenient_entities, strict_entities


def _span_sets(seqs: list[list[str]], strict: bool):
    extract = strict_entities if strict else lenient_entities
    spans = set()
    for i, seq in enumerate(seqs):
        for s, e, t in extract(seq):
            spans.add((i, s, e, t))
    return spans


def span_prf(
    y_true: list[list[str]], y_pred: list[list[str]], strict: bool = True
) -> dict:
    gold = _span_sets(y_true, strict)
    pred = _span_sets(y_pred, strict)
    tp = len(gold & pred)
    fp = len(pred - gold)
    fn = len(gold - pred)
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def accuracy(y_true: list[list[str]], y_pred: list[list[str]]) -> float:
    """Token-level accuracy (seqeval ``accuracy_score``).

    Raises on sequence/token length mismatch like seqeval does — a nested
    ``zip`` would silently truncate and return a plausible wrong score."""
    if len(y_true) != len(y_pred):
        raise ValueError(
            f"sequence count mismatch: {len(y_true)} vs {len(y_pred)}"
        )
    total = correct = 0
    for i, (ts, ps) in enumerate(zip(y_true, y_pred)):
        if len(ts) != len(ps):
            raise ValueError(
                f"token count mismatch in sequence {i}: {len(ts)} vs {len(ps)}"
            )
        for t, p in zip(ts, ps):
            total += 1
            correct += t == p
    return correct / total if total else 0.0
