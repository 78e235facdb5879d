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


def hilbert_xy2d(bits: int, x: int, y: int) -> int:
    """Hilbert-curve index of (x, y) on a 2**bits x 2**bits grid — the
    space-filling layout with strictly better worst-case locality than
    Morton order (no long diagonal jumps).  Standard top-down quadrant
    walk: consume one bit of each coordinate per level, accumulate the
    quadrant offset, and rotate/reflect the remaining low bits into the
    canonical sub-square frame.  Coordinates are masked to the sub-square
    (``% s``) before the rotation so every intermediate stays
    non-negative — the property that lets the SQL replay use plain
    integer division and modulo (rule 11)."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * ((3 * rx) ^ ry)
        xm, ym = x % s, y % s
        if ry == 0:
            if rx == 1:
                xm, ym = s - 1 - xm, s - 1 - ym
            xm, ym = ym, xm
        x, y = xm, ym
        s //= 2
    return d


def hilbert_level_exprs(bits: int, intdiv: str) -> list[tuple[str, str, str]]:
    """Per-level SQL for :func:`hilbert_xy2d` over working columns
    ``x``/``y``/``d`` — one ``(x_expr, y_expr, d_expr)`` triple per level,
    meant to be applied as a chain of SELECTs (each level reads the
    previous level's columns).  Shared by the Spark operator and the
    DuckDB twin (rule 6): ``intdiv`` is ``'DIV'`` or ``'//'``; everything
    else is common syntax, so the replay is bit-identical by
    construction."""
    levels = []
    for k in range(bits):
        s = 1 << (bits - 1 - k)
        rx = f"((x {intdiv} {s}) % 2)"
        ry = f"((y {intdiv} {s}) % 2)"
        x_expr = (
            f"CASE WHEN {ry} = 0 AND {rx} = 1 THEN {s - 1} - (y % {s})"
            f" WHEN {ry} = 0 THEN y % {s} ELSE x % {s} END"
        )
        y_expr = (
            f"CASE WHEN {ry} = 0 AND {rx} = 1 THEN {s - 1} - (x % {s})"
            f" WHEN {ry} = 0 THEN x % {s} ELSE y % {s} END"
        )
        d_expr = (
            f"d + {s * s} * (CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0"
            f" WHEN {rx} = 0 THEN 1 WHEN {ry} = 1 THEN 2 ELSE 3 END)"
        )
        levels.append((x_expr, y_expr, d_expr))
    return levels


def hilbert_sql_query(bits: int, intdiv: str, source_sql: str) -> str:
    """Nested-subquery SQL computing ``hval`` = Hilbert index for a source
    relation exposing integral ``x``/``y`` — the DuckDB-side assembly of
    :func:`hilbert_level_exprs` (the Spark side chains the same exprs as
    selects)."""
    q = (
        f"SELECT x AS x0, y AS y0, x, y, CAST(0 AS BIGINT) AS d"
        f" FROM ({source_sql})"
    )
    for x_expr, y_expr, d_expr in hilbert_level_exprs(bits, intdiv):
        q = (
            f"SELECT x0, y0, {x_expr} AS x, {y_expr} AS y, {d_expr} AS d"
            f" FROM ({q})"
        )
    return f"SELECT x0 AS x, y0 AS y, CAST(d AS BIGINT) AS hval FROM ({q})"
