"""Session-7 operator invariants: edge-level triangle support (k-truss
primitive), degree-assortativity sufficient statistics, and RFM
segmentation — each re-derived independently in plain Python at gate
parameters (sf0.001 fixture sizes are plain-Python tractable)."""

import duckdb

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _fixture_edges(n):
    e = [(i, i + 1) for i in range(n - 1)]
    e += [(i, i + 2) for i in range(n - 2) if i % 3 != 0]
    return e


def _n_events():
    con = duckdb.connect()
    return con.execute(
        f"SELECT count(*) FROM '{SF}/events.parquet'"
    ).fetchone()[0]


def test_edge_support_matches_plain_python(spark):
    n = _n_events()
    edges = _fixture_edges(n)
    eset = set(edges)
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {
        (u, v): len(adj[u] & adj[v])  # common neighbors == triangles
        for u, v in edges
    }
    got = {
        (r["u"], r["v"]): r["support"]
        for r in E.queries()["kg_edge_support"](spark, SF).collect()
    }
    assert set(got) == eset
    assert got == want
    supports = set(got.values())
    assert 1 in supports and 2 in supports  # both peel branches live


def test_assortativity_stats_match_plain_python(spark):
    n = _n_events()
    edges = _fixture_edges(n)
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs = [(deg[u], deg[v]) for u, v in edges]
    xs += [(y, x) for x, y in xs]  # both orientations
    m = len(xs)
    sum_x = sum(x for x, _ in xs)
    sum_xy = sum(x * y for x, y in xs)
    sum_x2 = sum(x * x for x, _ in xs)
    row = E.queries()["kg_degree_assortativity"](spark, SF).collect()[0]
    assert (row["m"], row["sum_x"], row["sum_xy"], row["sum_x2"]) == (
        m, sum_x, sum_xy, sum_x2,
    )
    assert row["pearson_num"] == m * sum_xy - sum_x * sum_x
    assert row["pearson_den"] == m * sum_x2 - sum_x * sum_x
    assert row["pearson_den"] > 0  # variance positive on this fixture


def test_rfm_segments_structure_and_liveness(spark):
    rows = E.queries()["events_rfm_segments"](spark, SF).collect()
    assert rows, "rfm must be live"
    for r in rows:
        assert r["segment"] == (
            100 * r["r_score"] + 10 * r["f_score"] + r["m_score"]
        )
        assert r["recency_days"] >= 0
        assert r["frequency"] >= 1 and r["monetary_cents"] > 0
    # threshold buckets must not collapse to one arm at gate params
    assert len({r["r_score"] for r in rows}) >= 2
    assert len({r["f_score"] for r in rows}) >= 2
    assert len({r["m_score"] for r in rows}) >= 2


def test_rfm_matches_duckdb_recompute_for_one_user(spark):
    rows = {r["user_id"]: r for r in
            E.queries()["events_rfm_segments"](spark, SF).collect()}
    con = duckdb.connect()
    uid, f, cents, last_day, anchor = con.execute(
        f"""
        WITH a AS (SELECT max(epoch_us(ts) // 86400000000) ad
                   FROM '{SF}/events.parquet')
        SELECT user_id, count(*),
               CAST(sum(CAST(CAST(CAST(value AS DECIMAL(18,4))
                    AS DECIMAL(30,4)) * 100 AS BIGINT)) AS BIGINT),
               max(epoch_us(ts) // 86400000000), (SELECT ad FROM a)
        FROM '{SF}/events.parquet'
        WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1 LIMIT 1
        """
    ).fetchone()
    r = rows[uid]
    assert r["frequency"] == f
    assert r["monetary_cents"] == cents
    assert r["recency_days"] == anchor - last_day
