"""Unigram-LM surprisal kernels — the pure-Python semantics shared by the
Spark operator (``operators/corpus.lm_surprisal_filter``) and its DuckDB
twin (CLAUDE.md rule 6).

CCNet-style language-model quality filtering (Wenzek et al. 2020 score
documents with a KenLM perplexity; the unigram variant here is the same
signal computable exactly at any scale): a document's mean token surprisal
under the corpus's own unigram distribution separates run-of-the-mill text
(common tokens, low surprisal) from anomalous documents (rare-token-heavy,
high surprisal).

Engine-exactness (rule 20): surprisal is fixed-point —
``floor(ln(N/c) * 1e6 + 0.5)`` micro-nats as BIGINT. The only
transcendental, ``ln``, is evaluated by Python ``math.log`` on the Spark
side (driver-side, inlined as a literal dim) and by DuckDB ``ln`` in the
twin; both bind the same libm on this host — verified bit-identical over
2288 probe rationals before this design was committed. Everything after
the ``ln`` is IEEE-exact (multiply by 1e6, add 0.5, floor) and everything
aggregated is BIGINT, so sums are order-independent and the keep
predicate is integer cross-multiplication — no float ever crosses an
engine boundary.

Out-of-vocabulary tokens (rank beyond the vocab cap, or unseen at apply
time) take the add-half surprisal ``floor(ln(2N) * 1e6 + 0.5)`` — i.e.
c = 0.5 — computed by the same formula on both sides.
"""

from __future__ import annotations

import math

FIXED_SCALE = 1_000_000


def lp_micro(n_total: int, count: int) -> int:
    """Fixed-point surprisal of a vocab token: floor(ln(N/c)·1e6 + 0.5)."""
    return int(math.floor(math.log(n_total / count) * FIXED_SCALE + 0.5))


def oov_lp_micro(n_total: int) -> int:
    """Fixed-point surprisal of an unseen token (c = 0.5 add-half)."""
    return int(math.floor(math.log(2 * n_total) * FIXED_SCALE + 0.5))


def vocab_table(
    word_counts: dict[str, int], cap: int, n_total: int | None = None
) -> dict[str, int]:
    """tok → lp_micro for the top-``cap`` tokens by (count desc, tok asc)
    — the same TOTAL order as every other vocab build in this repo, so
    the table is deterministic across engines at count ties.

    ``n_total`` is the CORPUS total token count; it must be passed
    explicitly when ``word_counts`` is already capped (the sum of a
    truncated table under-counts N and would inflate every surprisal)."""
    if n_total is None:
        n_total = sum(word_counts.values())
    ranked = sorted(word_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
    return {tok: lp_micro(n_total, c) for tok, c in ranked}


def doc_surprisal(
    tokens: list[str], table: dict[str, int], oov_lp: int
) -> tuple[int, int]:
    """(n_tokens, surprisal_micro) of one document under the table."""
    return len(tokens), sum(table.get(t, oov_lp) for t in tokens)


def backoff_penalty_micro() -> int:
    """Fixed-point stupid-backoff penalty: floor(ln(2)·1e6 + 0.5) — the
    factor-0.5 discount a bigram miss pays before its unigram score."""
    return int(math.floor(math.log(2.0) * FIXED_SCALE + 0.5))


def bigram_lp_micro(c1: int, c12: int) -> int:
    """Fixed-point conditional surprisal of a tabled bigram:
    floor(ln(c(w1)/c(w1,w2))·1e6 + 0.5) — the SAME double division +
    libm ln + IEEE tail as :func:`lp_micro`, so DuckDB replays it
    bit-for-bit."""
    return int(math.floor(math.log(c1 / c12) * FIXED_SCALE + 0.5))


def bigram_table(
    bigram_counts: dict[str, int],
    unigram_counts: dict[str, int],
    cap: int,
) -> dict[str, int]:
    """"w1 w2" → conditional lp_micro for the top-``cap`` bigrams by
    (count desc, bigram asc). ``unigram_counts`` must be the FULL count
    table (w1 of any tabled bigram is by construction at least as
    frequent as the bigram itself)."""
    ranked = sorted(bigram_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
    return {
        bg: bigram_lp_micro(unigram_counts[bg.split(" ")[0]], c)
        for bg, c in ranked
    }
