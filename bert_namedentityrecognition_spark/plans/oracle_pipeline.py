"""Single-process pure-Python twin of the Spark KG pipeline.

Executes the same semantics (preprocess → split → han_to_zen → greedy
dictionary match → BIO decode → normalize → pair → count) with plain loops
over the oracle kernels — the correctness ground truth for the P/R ≥ 0.95
gate (BASELINE.md). Intentionally naive and driver-side; never used at scale.
"""

from __future__ import annotations

from collections import Counter

from ..oracle.ade import ade_pairs_from_lists
from ..oracle.iob import iob_to_spans
from ..oracle.matcher import build_automaton, automaton_match
from ..oracle.normalize import DictNormalizer
from ..oracle.textproc import (
    han_to_zen,
    html_to_text,
    preprocess_text,
    split_sentences,
)


def oracle_mentions(
    rows: list[dict],
    term_types: dict[str, str],
    lang_filter: str | None = "ja",
    max_length: int = 512,
) -> list[dict]:
    """Per-page mention extraction, mirroring sentences+tagger operators."""
    normalized_types = {han_to_zen(k): v for k, v in term_types.items()}
    automaton = build_automaton(list(normalized_types))
    out: list[dict] = []
    for row in rows:
        text = row.get("text")
        if text is None or text == "":
            # html→text fallback — the SAME kernel the Spark paths run via
            # _pages_text_source (CLAUDE.md rule 10: input-contract changes
            # must reach every mention path, this twin included)
            html = row.get("html")
            if html is None:
                continue
            text = html_to_text(html)
            if text == "":
                continue
        # the Spark paths filter lang only when the COLUMN exists; mirror
        # that: a row dict without a 'lang' key passes through
        if (
            lang_filter is not None
            and "lang" in row
            and row["lang"] != lang_filter
        ):
            continue
        for sent_id, sent in enumerate(split_sentences(preprocess_text(text))):
            if len(sent) > max_length:
                continue
            norm = han_to_zen(sent)
            matches = automaton_match(norm, automaton)
            tags = ["O"] * len(norm)
            for s, e, term in matches:
                tags[s] = "B-" + normalized_types[term]
                for i in range(s + 1, e):
                    tags[i] = "I-" + normalized_types[term]
            for span in iob_to_spans(list(norm), tags):
                out.append(
                    {
                        "url": row["url"],
                        "sent_id": sent_id,
                        "start": span["start"],
                        "end": span["end"],
                        "type": span["type"],
                        "word": span["word"],
                    }
                )
    return out


def oracle_triples(
    rows: list[dict],
    dim_rows: list[dict],
    term_types: dict[str, str],
    threshold: float = 70.0,
    remove_duplicates: bool = True,
    alias_map: dict[str, str] | None = None,
) -> dict[tuple[str, str], int]:
    """Document-scope (drug, symptom) counts — ground truth for triples."""
    mentions = oracle_mentions(rows, term_types)
    by_url_drugs: dict[str, list[str]] = {}
    by_url_syms: dict[str, list[str]] = {}
    urls: list[str] = []
    for m in mentions:
        if m["url"] not in urls:
            urls.append(m["url"])
        if m["type"] == "drug":
            by_url_drugs.setdefault(m["url"], []).append(m["word"])
        else:
            by_url_syms.setdefault(m["url"], []).append(m["word"])

    sym_dim = {
        r["surface"]: r["canonical"] for r in dim_rows if r["kind"] == "symptom"
    }
    normalizer = DictNormalizer(
        set(sym_dim),
        threshold=threshold,
        convert=lambda s: (alias_map or {}).get(sym_dim[s], sym_dim[s]),
    )
    cache: dict[str, str] = {}

    def norm(term: str) -> str:
        if term not in cache:
            cache[term] = normalizer.normalize(term)[0]
        return cache[term]

    drugs = [by_url_drugs.get(u, []) for u in urls]
    syms = [by_url_syms.get(u, []) for u in urls]
    return ade_pairs_from_lists(
        drugs, syms, remove_duplicates=remove_duplicates, normalize=norm
    )


def triples_prf(
    expected: dict[tuple[str, str], int], actual: dict[tuple[str, str], int]
) -> dict:
    """Weighted P/R over triple multisets (counts matter)."""
    exp, act = Counter(expected), Counter(actual)
    tp = sum((exp & act).values())
    fp = sum((act - exp).values())
    fn = sum((exp - act).values())
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": precision, "recall": recall, "f1": f1}
