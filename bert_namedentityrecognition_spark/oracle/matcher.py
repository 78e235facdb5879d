"""Dictionary (gazetteer) matching semantics.

``exact_match`` reproduces the containment-join of
``util/text_utils.py:154-192`` (``DrugNameMatcher.exact_match``): every
occurrence of ``term`` in ``text``, skipping intervals already claimed by
``ignore``; non-overlapping left-to-right within each gap.

``greedy_dictionary_match`` reproduces ``HyakuyakuDrugMatcher.match``
(``knowledge_bases/hyakuyaku.py:71-88``): candidates sorted longest-first,
terms ≤ 2 chars dropped at dict build, earlier (longer) matches mask later
overlapping ones via the growing ``ignore`` list.

``build_automaton``/``automaton_match`` is the scale path: a pure-Python
Aho-Corasick automaton with longest-match-preferred resolution that yields
the same output as the greedy loop for our dictionaries; used inside the
Spark tagger UDF so per-batch cost is O(text) not O(text × |dict|).
"""

from __future__ import annotations

from collections import deque


def exact_match(
    text1: str, text2: str, ignore: list[tuple] | None = None
) -> list[tuple[int, int, str]]:
    """All occurrences of ``text2`` in ``text1`` outside ``ignore`` intervals.

    An empty ``text2`` returns no matches — ``str.find('')`` succeeds at
    every position without advancing, which would spin this loop forever
    appending zero-width matches."""
    if not text2:
        return []
    ignore_iter = iter(sorted(ignore or []))
    start = 0
    maxlen = len(text1)
    length = len(text2)
    out: list[tuple[int, int, str]] = []
    while True:
        item = next(ignore_iter, None)
        end = item[0] if item else maxlen
        while True:
            found = text1.find(text2, start, end)
            if found == -1:
                if end == maxlen:
                    return out
                start = item[1]
                break
            out.append((found, found + length, text2))
            start = found + length


def greedy_dictionary_match(text: str, terms: list[str]) -> list[tuple[int, int, str]]:
    """Longest-first greedy multi-term containment with overlap masking.

    ``terms`` must already be >2-char filtered; they are re-sorted here
    (len desc, then lexicographic for determinism).
    """
    matches: list[tuple[int, int, str]] = []
    for term in sorted(set(terms), key=lambda t: (-len(t), t)):
        matches.extend(exact_match(text, term, ignore=matches))
    return matches


# --- Aho-Corasick scale path -------------------------------------------------


class Automaton:
    """Minimal Aho-Corasick with longest-match greedy resolution."""

    __slots__ = ("goto", "fail", "out")

    def __init__(self, terms: list[str]):
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[str]] = [[]]
        for term in set(terms):
            node = 0
            for ch in term:
                nxt = self.goto[node].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[node][ch] = nxt
                node = nxt
            self.out[node].append(term)
        self.fail = [0] * len(self.goto)
        q = deque()
        for ch, nxt in self.goto[0].items():
            q.append(nxt)
        while q:
            node = q.popleft()
            for ch, nxt in self.goto[node].items():
                q.append(nxt)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[nxt] = self.goto[f].get(ch, 0)
                if self.fail[nxt] == nxt:
                    self.fail[nxt] = 0
                self.out[nxt] = self.out[nxt] + self.out[self.fail[nxt]]

    def iter_matches(self, text: str):
        """Yield (start, end, term) for every dictionary occurrence."""
        node = 0
        for i, ch in enumerate(text):
            while node and ch not in self.goto[node]:
                node = self.fail[node]
            node = self.goto[node].get(ch, 0)
            for term in self.out[node]:
                yield (i - len(term) + 1, i + 1, term)


def build_automaton(terms: list[str]) -> Automaton:
    return Automaton(terms)


def automaton_match(text: str, automaton: Automaton) -> list[tuple[int, int, str]]:
    """Longest-first greedy masking resolution over all automaton hits.

    Equivalent to ``greedy_dictionary_match`` output order-normalized:
    among overlapping hits, longer terms win; between equal-length terms the
    leftmost-then-lexicographic wins. Result sorted by start offset.
    """
    hits = sorted(
        automaton.iter_matches(text),
        key=lambda m: (-(m[1] - m[0]), m[2], m[0]),
    )
    taken: list[tuple[int, int, str]] = []
    for s, e, term in hits:
        if all(e <= ts or s >= te for ts, te, _ in taken):
            taken.append((s, e, term))
    return sorted(taken, key=lambda m: m[0])
