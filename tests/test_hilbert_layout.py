"""Hilbert-curve layout kernel + replay tests.

The gate (tools/check_oracles.py, hilbert_layout at sf0.001/0.01/0.1)
proves Spark == DuckDB on the corpus; these pin the KERNEL itself — the
two properties that uniquely characterize a Hilbert-style space-filling
curve (bijectivity onto [0, 4^bits) and unit-step adjacency), plus the
rule-6 contract that the Python kernel, the DuckDB nested replay, and the
Spark select-chain agree pointwise, and that Hilbert's box locality is
not worse than Morton's on the audited query box.
"""

import duckdb
import pytest

from bert_namedentityrecognition_spark.operators.layout import (
    layout_file_stats,
    with_hilbert,
)
from bert_namedentityrecognition_spark.oracle.layout import (
    hilbert_sql_query,
    hilbert_xy2d,
    zorder_interleave,
)

BITS = 5
N = 1 << BITS


def _full_curve():
    return {
        hilbert_xy2d(BITS, x, y): (x, y) for x in range(N) for y in range(N)
    }


def test_hilbert_kernel_is_bijective_with_unit_steps():
    pts = _full_curve()
    assert len(pts) == N * N, "index collisions: not a bijection"
    assert min(pts) == 0 and max(pts) == N * N - 1
    for d in range(1, N * N):
        (xa, ya), (xb, yb) = pts[d - 1], pts[d]
        assert abs(xa - xb) + abs(ya - yb) == 1, (
            f"non-unit step at d={d}: {pts[d - 1]} -> {pts[d]}"
        )


def test_hilbert_sql_replay_matches_kernel():
    q = hilbert_sql_query(
        BITS,
        "//",
        f"SELECT a.x, b.y FROM (SELECT unnest(range(0,{N})) AS x) a,"
        f" (SELECT unnest(range(0,{N})) AS y) b",
    )
    rows = duckdb.sql(q).fetchall()
    assert len(rows) == N * N
    assert all(hilbert_xy2d(BITS, x, y) == h for x, y, h in rows)


def test_hilbert_spark_chain_matches_kernel(spark):
    df = (
        spark.range(N)
        .selectExpr("id AS x")
        .crossJoin(spark.range(N).selectExpr("id AS y"))
    )
    out = with_hilbert(df, "x", "y", BITS).collect()
    assert len(out) == N * N
    assert all(hilbert_xy2d(BITS, r["x"], r["y"]) == r["hval"] for r in out)


def test_hilbert_prunes_no_worse_than_zorder_on_query_box(spark):
    """On a dense bits=5 grid with 16 files per layout, the audited box
    should survive min/max pruning in no MORE Hilbert files than Morton
    files — Hilbert's unit-step locality is the whole point of paying
    the per-level rewrite instead of the flat interleave."""
    import pyspark.sql.functions as F

    df = (
        spark.range(N)
        .selectExpr("id AS x")
        .crossJoin(spark.range(N).selectExpr("id AS y"))
    )
    box = (4, 11, 4, 11)
    per_file = (N * N) // 16
    hs = layout_file_stats(
        with_hilbert(df, "x", "y", BITS),
        F.expr(f"hval DIV {per_file}"),
        "x",
        "y",
        box,
        "hilbert",
    )
    zdf = df.withColumn(
        "zval",
        F.udf(lambda x, y: zorder_interleave(x, y, BITS), "long")("x", "y"),
    )
    zs = layout_file_stats(
        zdf, F.expr(f"zval DIV {per_file}"), "x", "y", box, "zorder"
    )
    h_hits = sum(r["hit"] for r in hs.collect())
    z_hits = sum(r["hit"] for r in zs.collect())
    assert h_hits <= z_hits, (h_hits, z_hits)
    assert h_hits >= 1
