"""Entity-normalization semantics (the fuzzy top-1 'join' oracle).

Reproduces the EntityNormalizer family:

- ``DictNormalizer``      — ``ManbyoNormalizer`` semantics
  (``knowledge_bases/manbyo.py:52-71``): han_to_zen both sides, top-1 by
  ``fuzz.ratio``; accept iff score > threshold else sentinel ``''``.
  ``convert`` hooks model ``ManbyoICDNormalizer`` / ``MedDRA`` variants
  (:74-85): null code → ``'NO_ICD_'+term`` / ``'NO_MEDDRA_MATCH'``.
- ``ExactThenFuzzyNormalizer`` — ``OICINormalizer``
  (``knowledge_bases/OICI_database.py:22-41``): exact-match short-circuit
  with ``-1`` / ``[AMB]`` / NaN sentinel handling, then fuzzy top-1 with
  threshold, then *recursive* re-normalization of the matched surface
  (terminates: matched surface hits the exact branch).
"""

from __future__ import annotations

from collections.abc import Callable

from .fuzzy import extract_one, ratio
from .textproc import han_to_zen


class DictNormalizer:
    def __init__(
        self,
        surfaces: set[str],
        threshold: float = 0,
        convert: Callable[[str], str] | None = None,
        scorer: Callable[[str, str], float] = ratio,
    ):
        self.candidates = sorted({han_to_zen(s) for s in surfaces})
        self.threshold = threshold
        self.convert = convert or (lambda t: t)
        self.scorer = scorer

    def normalize(self, term: str) -> tuple[str, float]:
        term = han_to_zen(term)
        best = extract_one(term, self.candidates, scorer=self.scorer)
        if best is None:
            return "", 0.0
        surface, score = best
        if score > self.threshold:
            return self.convert(surface), score
        return "", score


class ExactThenFuzzyNormalizer:
    """OICI-style: exact lookup with sentinels, else fuzzy + recurse."""

    AMBIGUOUS = "[AMB]"
    REJECT = "-1"

    def __init__(self, mapping: dict[str, str | None], threshold: float = 60):
        # mapping: surface -> human_check value (None models NaN)
        self.mapping = mapping
        self.threshold = threshold
        self.candidates = sorted({han_to_zen(k) for k in mapping})

    def normalize(self, term: str, _seen: frozenset[str] = frozenset()) -> str:
        if term in self.mapping:
            checked = self.mapping[term]
            if checked is not None and str(checked) != self.REJECT:
                if str(checked) == self.AMBIGUOUS:
                    return term
                return str(checked)
            return ""
        best = extract_one(term, self.candidates, scorer=ratio)
        if best is None:
            return ""
        surface, score = best
        if score > self.threshold:
            if surface in _seen or surface == term:
                # the reference recurses forever here (OICI_database.py:
                # 55-58): candidates are han_to_zen-normalized while the
                # exact branch checks RAW keys, so a dictionary with a
                # halfwidth/ASCII key whose zenkaku form is not itself a
                # key cycles. Fail loudly naming the defect instead of
                # dying of RecursionError a thousand frames deep.
                raise ValueError(
                    f"normalization cycle at {surface!r}: dictionary keys "
                    "are not closed under han_to_zen (the zenkaku candidate "
                    "never hits the exact branch) — fix the dictionary or "
                    "pre-normalize its keys"
                )
            return self.normalize(surface, _seen | {term})
        return ""
