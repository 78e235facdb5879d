"""Relaxed (overlap-based) NER metrics.

Reproduces ``util/relaxed_metrics.py:111-189``: per entity type, a Jaccard
overlap matrix between gold and predicted token-position sets, greedy
best-score matching without replacement, tp/fp/fn (+P/R/F1) per type and
overall. Entity extraction (:36-87) differs from the BIO FSM: ``I-X`` after
``O`` or a different type does NOT open an entity here.
"""

from __future__ import annotations

import numpy as np


def _remove_prefix(labels: list[str]) -> list[str]:
    return [l if l == "O" else l[2:] for l in labels]


def get_named_tuples(labels: list[str]) -> list[dict]:
    """Entities as {'type', 'pos': [token indices]} per relaxed-metric rules."""
    entities: list[tuple[str, list[int]]] = []
    current: list[int] = []
    label_with_b = ""
    for pos, label in enumerate(labels):
        if label == "O":
            if current:
                entities.append((label_with_b, current))
            current = []
            label_with_b = ""
            continue
        ltype = label[2:]
        if label[0] == "B":
            if current:
                entities.append((label_with_b, current))
            current = [pos]
            label_with_b = ltype
        if label[0] == "I":
            if label_with_b == ltype:
                current.append(pos)
            else:
                if current:
                    entities.append((label_with_b, current))
                current = []
                label_with_b = ""
    if current and label_with_b != "":
        entities.append((label_with_b, current))
    return [{"type": t, "pos": p} for t, p in entities]


def _prf(tp: int, fp: int, fn: int) -> dict:
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": tp / (tp + fp) if tp + fp > 0 else 0,
        "recall": tp / (tp + fn) if tp + fn > 0 else 0,
        "f1": tp / (tp + 0.5 * (fp + fn)) if tp + fp + fn > 0 else 0,
    }


def calculate_relaxed_metric(y_true: list[list[str]], y_pred: list[list[str]]) -> dict:
    flat_t = [l for seq in y_true for l in seq]
    flat_p = [l for seq in y_pred for l in seq]
    ent_types = (set(_remove_prefix(flat_t)) | set(_remove_prefix(flat_p))) - {"O"}
    counts = {t: {"tp": 0, "fp": 0, "fn": 0} for t in ent_types}

    for true_seq, pred_seq in zip(y_true, y_pred):
        true_ents = get_named_tuples(true_seq)
        pred_ents = get_named_tuples(pred_seq)
        for ent_type in ent_types:
            tt = [e for e in true_ents if e["type"] == ent_type]
            pp = [e for e in pred_ents if e["type"] == ent_type]
            true_matched: list[int] = []
            pred_matched: list[int] = []
            mat = np.zeros((len(tt), len(pp)))
            for ti, te in enumerate(tt):
                tset = set(te["pos"])
                for pi, pe in enumerate(pp):
                    pset = set(pe["pos"])
                    mat[ti, pi] = len(tset & pset) / len(tset | pset)
            while np.sum(mat > 0):
                best = mat.max()
                t_idx, p_idx = np.where(mat == best)
                for pi, ti in zip(p_idx, t_idx):
                    if ti in true_matched or pi in pred_matched:
                        continue
                    true_matched.append(ti)
                    pred_matched.append(pi)
                    mat[ti, pi] = 0
                mat[t_idx, p_idx] = 0
            counts[ent_type]["tp"] += len(true_matched)
            counts[ent_type]["fn"] += len(set(range(len(tt))) - set(true_matched))
            counts[ent_type]["fp"] += len(set(range(len(pp))) - set(pred_matched))

    results = {t: _prf(**counts[t]) for t in ent_types}
    overall = _prf(
        tp=sum(counts[t]["tp"] for t in ent_types),
        fp=sum(counts[t]["fp"] for t in ent_types),
        fn=sum(counts[t]["fn"] for t in ent_types),
    )
    results["overall"] = overall
    return results
