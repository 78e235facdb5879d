"""Fuzzy string scoring with rapidfuzz-compatible semantics.

``ratio`` reproduces ``rapidfuzz.fuzz.ratio``: normalized Indel similarity,
``100 * 2*LCS(a,b) / (len(a)+len(b))`` — the scorer behind every reference
normalizer (``knowledge_bases/manbyo.py:54``, ``hyakuyaku.py:52``,
``OICI_database.py:16``). ``token_set_ratio`` backs
``ManbyoDict.searchTerm`` (``manbyo.py:44-49``).

``extract_one`` mirrors ``rapidfuzz.process.extractOne``: argmax of scorer
over candidates. rapidfuzz iterates a set (undefined tie order); we make the
tie-break deterministic: highest score, then lexicographically smallest
candidate. Tests pin that choice.

Pure Python O(n*m) DP — fine for dictionary surfaces (short strings); the
Spark fuzzy join prunes candidates by length band before scoring.
"""

from __future__ import annotations



def _lcs_len(a: str, b: str) -> int:
    if not a or not b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        append = cur.append
        for j, cb in enumerate(b, 1):
            if ca == cb:
                append(prev[j - 1] + 1)
            else:
                pj = prev[j]
                cj = cur[j - 1]
                append(pj if pj >= cj else cj)
        prev = cur
    return prev[-1]


def ratio(a: str, b: str) -> float:
    """Indel similarity * 100 (== rapidfuzz.fuzz.ratio)."""
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    return 200.0 * _lcs_len(a, b) / total


def token_set_ratio(a: str, b: str) -> float:
    """Classic token_set_ratio: max ratio over sorted-set recombinations."""
    ta, tb = set(a.split()), set(b.split())
    inter = " ".join(sorted(ta & tb))
    sa = (inter + " " + " ".join(sorted(ta - tb))).strip()
    sb = (inter + " " + " ".join(sorted(tb - ta))).strip()
    if inter and (inter == sa or inter == sb):
        return 100.0
    return max(ratio(inter, sa), ratio(inter, sb), ratio(sa, sb))


def extract_one(query: str, candidates, scorer=ratio) -> tuple[str, float] | None:
    """Top-1 candidate by scorer; deterministic tie-break (score desc, candidate asc)."""
    best: tuple[str, float] | None = None
    for cand in candidates:
        s = scorer(query, cand)
        if best is None or s > best[1] or (s == best[1] and cand < best[0]):
            best = (cand, s)
    return best
