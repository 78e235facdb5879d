"""Session-9 operator invariants: bounded closeness profiles and
exact-integer Katz centrality — each re-derived independently in plain
Python at gate parameters (sf0.001 fixture sizes are plain-Python
tractable), plus degenerate probes (isolated seeds, edgeless graphs)."""

import duckdb

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _n_events():
    con = duckdb.connect()
    return con.execute(
        f"SELECT count(*) FROM '{SF}/events.parquet'"
    ).fetchone()[0]


def _alias_sym(n):
    edges = set()
    for i in range(1, n):
        if i % 40 != 0:
            edges.add((i, i - 1))
        elif (i // 40) % 3 != 0:
            edges.add((i, i - 40))
    return edges | {(b, a) for a, b in edges}


def _citation(n):
    return [(i, i - 1) for i in range(1, n)] + [
        (i, i - 2) for i in range(2, n) if i % 3 != 0
    ]


def test_closeness_profile_matches_plain_python(spark):
    n = _n_events()
    sym = _alias_sym(n)
    nbrs = {}
    for a, b in sym:
        nbrs.setdefault(a, []).append(b)
    got = {
        r["seed"]: (r["n_reached"], r["sum_dist"], r["closeness_ppm"])
        for r in E.queries()["kg_closeness_profile"](spark, SF).collect()
    }
    seeds = [s for s in range(0, n, 251)]
    assert sorted(got) == seeds
    for s in seeds:
        dist = {s: 0}
        frontier = {s}
        for k in range(1, 9):
            nxt = {
                b for a in frontier for b in nbrs.get(a, ())
            } - dist.keys()
            for b in nxt:
                dist[b] = k
            frontier = nxt
        n_reached = sum(1 for d in dist.values() if d > 0)
        sum_dist = sum(d for d in dist.values() if d > 0)
        ppm = (10**6 * n_reached) // sum_dist if sum_dist else 0
        assert got[s] == (n_reached, sum_dist, ppm)


def test_closeness_isolated_seed_scores_zero(spark):
    # a seed with no edges at all must appear with (0, 0, 0), not vanish
    from bert_namedentityrecognition_spark.operators.graph import (
        closeness_profile_df,
    )

    edges = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    seeds = spark.createDataFrame([(1,), (99,)], ["node"])
    rows = {
        r["seed"]: (r["n_reached"], r["sum_dist"], r["closeness_ppm"])
        for r in closeness_profile_df(edges, seeds, max_hops=3).collect()
    }
    assert rows[99] == (0, 0, 0)
    assert rows[1] == (1, 1, 10**6)


def test_katz_matches_plain_python_and_bound(spark):
    n = _n_events()
    edges = _citation(n)
    # independent re-derivation: walk-count folds with the 2**(8-k) scale
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
    w = {v: 1 for v in range(n)}
    score = {v: 0 for v in range(n)}
    for k in range(1, 9):
        nw = {}
        for u, wt in w.items():
            for b in nbrs.get(u, ()):
                nw[b] = nw.get(b, 0) + wt
        w = nw
        for v, wt in w.items():
            score[v] += wt * 2 ** (8 - k)
    got = {
        r["node"]: r["katz_scaled"]
        for r in E.queries()["kg_katz_centrality"](spark, SF).collect()
    }
    assert got == score
    # the docstring's overflow bound: in-degree <= 2 => katz <= 8 * 2**8
    assert max(got.values()) <= 8 * 2**8
    # direction is live: the chain head (node 0) collects from everyone
    # downstream while the tail (node n-1) has no in-edges at all
    assert got[n - 1] == 0
    assert got[0] > got[n - 1]


def test_katz_edgeless_graph_all_zero(spark):
    from bert_namedentityrecognition_spark.operators.graph import (
        katz_centrality_df,
    )

    edges = spark.createDataFrame([(0, 1)], ["src", "dst"]).limit(0)
    nodes = spark.range(5).withColumnRenamed("id", "node")
    rows = {
        r["node"]: r["katz_scaled"]
        for r in katz_centrality_df(edges, nodes, rounds=3).collect()
    }
    assert rows == {v: 0 for v in range(5)}
