"""Sequence-packing kernel (pure Python, no Spark imports — rule 6).

Greedy in-order first-fit: walk a group's documents in doc_id order,
appending each to the current bin while the token budget holds, else
opening a new bin. The FIRST document of a group always seeds bin 0 at
offset 0 (even if oversize); an oversize document later in the stream
opens its own bin with fill > budget — the rule is uniformly
``fill + n_tokens <= budget``, never a special case, so the DuckDB
recursive-CTE twin replays it with one CASE expression.

This is deliberately the *sequential* greedy (arrival order == doc_id
order), not best-fit: the result is a pure function of the ordered token
sequence, independent of partitioning or cluster size, and exactly
SQL-replayable. Best-fit/offline packing would need a mutable heap —
better packing ratio, but nondeterministic under re-partitioning and not
oracle-able.
"""

from __future__ import annotations

from typing import Iterable, Iterator


def pack_group(
    items: Iterable[tuple[int, int]], budget: int
) -> Iterator[tuple[int, int, int]]:
    """items: (doc_id, n_tokens) in the order to pack (caller sorts).
    Yields (doc_id, bin_id, tok_offset)."""
    bin_id = 0
    fill = 0
    first = True
    for doc_id, nt in items:
        if first:
            first = False
            yield (doc_id, 0, 0)
            fill = nt
        elif fill + nt <= budget:
            yield (doc_id, bin_id, fill)
            fill += nt
        else:
            bin_id += 1
            yield (doc_id, bin_id, 0)
            fill = nt
