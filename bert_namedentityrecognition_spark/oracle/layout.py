"""Z-order (Morton) data-layout kernels — pure Python semantics plus the
portable SQL expression both engines replay (rule 6: semantics live here;
Spark and DuckDB import the SAME generator so the twins cannot drift).

Z-ordering interleaves the bits of two clustering keys so that a sort by
the interleaved value co-locates rows that are close in BOTH dimensions —
the layout primitive behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.  Files
written in z-value order carry min/max stats on each key that a scan's
range predicates can prune on in BOTH dimensions, where a single-key sort
prunes on one.

Everything is integer arithmetic (bit extraction via integer division and
modulo — no shift operators, whose syntax differs across engines), so the
z-value, the file binning, and the pruning decisions are bit-identical in
Python, Spark SQL, and DuckDB at any corpus size (rule 11).

Reference parity: beyond-reference (the reference has no storage layout
stage); this is the write-side companion of the bucketed-join story
(``plans/pipeline.py:write_outputs_bucketed``) for range predicates.
"""

from __future__ import annotations


def zorder_interleave(x: int, y: int, bits: int) -> int:
    """Morton-interleave the low ``bits`` of x (even positions) and y (odd
    positions).  Callers must pre-reduce keys into [0, 2**bits)."""
    z = 0
    for i in range(bits):
        z += ((x >> i) & 1) << (2 * i)
        z += ((y >> i) & 1) << (2 * i + 1)
    return z


def zorder_sql_expr(xcol: str, ycol: str, bits: int, intdiv: str) -> str:
    """Portable SQL for :func:`zorder_interleave` over integral columns.

    ``intdiv`` is the engine's integer-division operator — ``'DIV'`` for
    Spark SQL, ``'//'`` for DuckDB; everything else (``%``, ``*``, ``+``)
    is shared syntax.  The generated expression is a flat sum of
    ``2 * bits`` terms, each ``((col / 2^i) % 2) * 2^pos`` — stays inside
    whole-stage codegen on the Spark side.
    """
    terms = []
    for i in range(bits):
        terms.append(f"(({xcol} {intdiv} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({ycol} {intdiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def file_overlaps(
    min_x: int, max_x: int, min_y: int, max_y: int,
    xa: int, xb: int, ya: int, yb: int,
) -> bool:
    """Min/max-stats pruning decision: would a scan with predicate
    ``x BETWEEN xa AND xb AND y BETWEEN ya AND yb`` have to read a file
    with these column stats?  (The manifest-pruning test Iceberg/Delta
    run per file.)"""
    return min_x <= xb and max_x >= xa and min_y <= yb and max_y >= ya
