"""Session-10 operators: maximal matching (line-graph MIS), gap
histogram bucket math, and the integer-exact ARI readability formula."""

import duckdb
import pytest
from pyspark.sql import functions as F

from bert_namedentityrecognition_spark.operators.graph import maximal_matching


def _edges_df(spark, rows):
    return spark.createDataFrame(rows, "edge_id long, src long, dst long")


def test_matching_is_a_maximal_matching(spark):
    # path a-b-c-d-e plus a triangle f-g-h and an ISOLATED edge x-y
    rows = [
        (1, 0, 1), (2, 1, 2), (3, 2, 3), (4, 3, 4),
        (10, 20, 21), (11, 21, 22), (12, 20, 22),
        (99, 50, 51),
    ]
    out = {r["edge_id"]: r for r in maximal_matching(_edges_df(spark, rows)).collect()}
    assert set(out) == {1, 2, 3, 4, 10, 11, 12, 99}
    matched = {e for e, r in out.items() if r["matched"] == 1}
    ends = {1: (0, 1), 2: (1, 2), 3: (2, 3), 4: (3, 4),
            10: (20, 21), 11: (21, 22), 12: (20, 22), 99: (50, 51)}
    # matching: no two matched edges share an endpoint
    used = [v for e in matched for v in ends[e]]
    assert len(used) == len(set(used))
    # maximality: every unmatched edge touches a matched one
    for e in set(out) - matched:
        assert any(set(ends[e]) & set(ends[m]) for m in matched), e
    # the isolated edge is trivially matched, at round 0
    assert out[99]["matched"] == 1 and out[99]["mis_round"] == 0
    # non-isolated matched edges carry their picking round (>= 1)
    assert all(out[e]["mis_round"] >= 1 for e in matched - {99})


def test_matching_round_overrun_raises(spark):
    # max_rounds=0 cannot decide any line-graph node -> loud failure
    rows = [(1, 0, 1), (2, 1, 2)]
    with pytest.raises(RuntimeError):
        maximal_matching(_edges_df(spark, rows), max_rounds=0).collect()


def test_matching_sql_twin_on_fixture():
    """matching_sql over a tiny inline edge fixture == the Spark kernel's
    pure-Python equivalent (mis_luby on the line graph), incl. the
    isolated-edge rule."""
    from bert_namedentityrecognition_spark.oracle.graph import (
        matching_sql,
        mis_luby,
    )

    edges = {1: (0, 1), 2: (1, 2), 3: (2, 3), 99: (50, 51)}
    vals = ", ".join(f"({e}, {u}, {v})" for e, (u, v) in edges.items())
    sql = matching_sql(
        f"edges_base AS MATERIALIZED (SELECT * FROM (VALUES {vals}) t(eid, u, v))",
        rounds=4,
    )
    got = {
        r[0]: (r[3], r[4])
        for r in duckdb.sql(sql).fetchall()
    }
    lg = []
    for a, (ua, va) in edges.items():
        for b, (ub, vb) in edges.items():
            if a < b and ({ua, va} & {ub, vb}):
                lg.append((a, b))
    mis = mis_luby(lg, max_rounds=4)
    iso = {e for e in edges if not any(e in p for p in lg)}
    want = {
        e: ((1, mis[e]) if e in mis else (1, 0) if e in iso else (0, 0))
        for e in edges
    }
    assert got == want


def test_gap_bucket_is_floor_log2(spark):
    gaps = [0, 1, 2, 3, 4, 7, 8, 1023, 1024, 123456]
    df = spark.createDataFrame([(g,) for g in gaps], "g long")
    out = df.select(
        "g", (F.length(F.bin(F.col("g") + 1)) - 1).alias("b")
    ).collect()
    for r in out:
        assert r["b"] == (r["g"] + 1).bit_length() - 1
    # DuckDB side of the same formula
    for g in gaps:
        (b,) = duckdb.sql(
            f"SELECT length(format('{{:b}}', {g} + 1)) - 1"
        ).fetchone()
        assert b == (g + 1).bit_length() - 1


def test_ari_bucket_matches_reference_formula():
    """The shifted integer DIV == floor(ARI) + 22 for hand-checked
    (chars, words, sentences) triples, including negative-ARI docs."""
    import math

    for c, w, s in [(100, 20, 3), (5, 5, 1), (2000, 300, 20), (7, 7, 7)]:
        ari = 4.71 * c / w + 0.5 * w / s - 21.43
        bucket = (1000000 * (471 * c * s + 50 * w * w - 2143 * w * s)
                  + 2200000000 * w * s) // (100000000 * w * s)
        assert bucket == math.floor(ari) + 22, (c, w, s)
