"""Byte-pair-encoding kernels — the pure-Python semantics shared by the
Spark operator (``operators/bpe.py``) and the DuckDB oracle twin.

Classic BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units") trained on a word-frequency table: start from
character sequences, repeatedly count adjacent symbol pairs (weighted by
word frequency, with within-word multiplicity) and merge the most frequent
pair everywhere, greedy leftmost non-overlapping. Ties break on
(count desc, left asc, right asc) — a TOTAL order, so the merge list is
deterministic across engines, partitionings, and cluster sizes.

No end-of-word marker symbol: merges never cross word boundaries because
words are rows, so the marker would only change the learned unit shapes,
not the algorithm; the Spark/SQL twins stay simpler without it (the
operator docstring states the convention).

Reference parity: the reference consumes a pre-trained WordPiece vocab
(`/root/reference/BERT/Model.py:36-60` loads a tokenizer checkpoint);
training the subword vocabulary is the upstream step a from-scratch
pipeline needs, so this is part of the beyond-reference LLM-data family.

These kernels are imported by tests and by generation-time assertions in
``__spark_entry__``; they hold no Spark imports (CLAUDE.md rule 6).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable


def word_symbols(word: str) -> list[str]:
    """Initial symbol sequence of a word: its characters (code points)."""
    return list(word)


def apply_merge(syms: list[str], left: str, right: str) -> list[str]:
    """Greedy leftmost non-overlapping replacement of the adjacent pair
    (left, right) by the single symbol left+right.

    A single left fold is exact: after a merge the new last element is
    ``left+right`` which can never equal ``left`` (right is non-empty), so
    a freshly created symbol can't seed an overlapping match.
    """
    out: list[str] = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


def pair_counts(vocab: Iterable[tuple[list[str], int]]) -> Counter:
    """Adjacent-pair counts over (symbol-sequence, word-frequency) rows,
    counted with within-word multiplicity (``aaaa`` has three (a,a))."""
    cnt: Counter = Counter()
    for syms, c in vocab:
        for a, b in zip(syms, syms[1:]):
            cnt[(a, b)] += c
    return cnt


def train_bpe(
    word_counts: dict[str, int], num_merges: int
) -> tuple[list[tuple[str, str, int]], dict[str, list[str]]]:
    """Train ``num_merges`` BPE merges on a word-frequency table.

    Returns (merges, segmentation): merges as (left, right, pair_count)
    in training order, and the final symbol sequence per word. Stops
    early if no adjacent pair remains (every word fully merged).
    """
    seg = {w: word_symbols(w) for w in word_counts}
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        cnt = pair_counts((seg[w], c) for w, c in word_counts.items())
        if not cnt:
            break
        (left, right), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((left, right, c))
        for w in seg:
            seg[w] = apply_merge(seg[w], left, right)
    return merges, seg


def segment_word(word: str, merges: Iterable[tuple[str, str]]) -> list[str]:
    """Apply a trained merge list to one word, in training order."""
    syms = word_symbols(word)
    for left, right, *_ in merges:
        syms = apply_merge(syms, left, right)
    return syms


def symbol_counts(vocab: Iterable[tuple[list[str], int]]) -> Counter:
    """Per-symbol occurrence counts (within-word multiplicity × word
    frequency) over (symbol-sequence, word-frequency) rows."""
    cnt: Counter = Counter()
    for syms, c in vocab:
        for s in syms:
            cnt[s] += c
    return cnt


def train_wordpiece(
    word_counts: dict[str, int], num_merges: int
) -> tuple[list[tuple[str, str, int, int, int]], dict[str, list[str]]]:
    """WordPiece-style likelihood-scored merge training: per step, merge
    the pair maximizing ``count(l,r) / (count(l)·count(r))`` — the
    Schuster-Nakajima criterion that prefers pairs whose parts rarely
    appear apart — instead of BPE's raw frequency. The score is a DOUBLE
    division of exact BIGINTs (correctly rounded, so Python, Spark, and
    DuckDB order candidates identically); ties break (l, r) ascending.
    Returns merges as (left, right, pair_count, left_count, right_count)
    plus the final segmentation. Greedy application is byte-identical to
    BPE's (:func:`apply_merge`)."""
    seg = {w: word_symbols(w) for w in word_counts}
    merges: list[tuple[str, str, int, int, int]] = []
    for _ in range(num_merges):
        cnt = pair_counts((seg[w], c) for w, c in word_counts.items())
        if not cnt:
            break
        sc = symbol_counts((seg[w], c) for w, c in word_counts.items())
        best_key, best = None, None
        for (l, r), c in cnt.items():
            score = c / (sc[l] * sc[r])
            key = (-score, l, r)
            if best_key is None or key < best_key:
                best_key, best = key, (l, r, c, sc[l], sc[r])
        merges.append(best)
        for w in seg:
            seg[w] = apply_merge(seg[w], best[0], best[1])
    return merges, seg
