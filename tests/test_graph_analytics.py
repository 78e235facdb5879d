"""Graph-analytics operators (PageRank, triangle counts) vs the pure-Python
kernels in ``oracle/graph.py`` — exactness, determinism, and invariants."""

import random

from pyspark.sql import functions as F

from bert_namedentityrecognition_spark.operators.graph import (
    pagerank_integer,
    triangle_counts_df,
)
from bert_namedentityrecognition_spark.oracle.graph import (
    INIT,
    pagerank_int,
    triangle_counts,
)


def _sym(pairs):
    return [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]


def _random_graph(n, m, seed):
    rng = random.Random(seed)
    seen = set()
    while len(seen) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            seen.add((min(a, b), max(a, b)))
    return sorted(seen)


def test_pagerank_spark_matches_kernel(spark):
    und = _random_graph(60, 140, seed=7)
    directed = _sym(und)
    want = pagerank_int(directed, iterations=5)
    df = spark.createDataFrame(directed, ["src", "dst"])
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_integer(df, iterations=5).collect()
    }
    assert got == want


def test_pagerank_dangling_and_sources(spark):
    # 0→1→2 chain (directed): 0 has no in-edges (base rank), 2 dangles.
    directed = [(0, 1), (1, 2)]
    want = pagerank_int(directed, iterations=4)
    df = spark.createDataFrame(directed, ["src", "dst"])
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_integer(df, iterations=4).collect()
    }
    assert got == want
    base = (15 * INIT) // 100
    assert got[0] == base  # no in-edges → pure base after iteration 1


def test_pagerank_mass_and_order(spark):
    und = _random_graph(40, 80, seed=11)
    directed = _sym(und)
    ranks = pagerank_int(directed, iterations=6)
    # Total mass bounded by n * init (damping only removes mass).
    assert sum(ranks.values()) <= len(ranks) * INIT
    # A strictly-higher-degree hub outranks a degree-1 leaf: star fixture.
    star = _sym([(0, i) for i in range(1, 9)])
    r = pagerank_int(star, iterations=6)
    assert r[0] > r[1]


def test_triangle_counts_spark_matches_kernel(spark):
    und = _random_graph(50, 180, seed=3)
    want = triangle_counts(und)
    df = spark.createDataFrame(und, ["src", "dst"])
    got = {r["node"]: r["triangles"] for r in triangle_counts_df(df).collect()}
    assert got == want
    assert want, "fixture must actually contain triangles"


def test_triangle_counts_known_graph(spark):
    # K4: every node is in C(3,2)=3 triangles; 4 triangles total.
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    want = triangle_counts(k4)
    assert want == {0: 3, 1: 3, 2: 3, 3: 3}
    df = spark.createDataFrame(k4, ["src", "dst"])
    got = {r["node"]: r["triangles"] for r in triangle_counts_df(df).collect()}
    assert got == want
    # Orientation invariance: reversed/duplicated inputs change nothing.
    noisy = k4 + [(b, a) for a, b in k4] + k4[:2] + [(1, 1)]
    df2 = spark.createDataFrame(noisy, ["src", "dst"])
    got2 = {r["node"]: r["triangles"] for r in triangle_counts_df(df2).collect()}
    assert got2 == want


def test_pagerank_sql_twin_matches_kernel():
    """The unrolled DuckDB twin reproduces the kernel bit-for-bit on the
    gate's derived graph shape (chain-of-40 + block heads, symmetrized)."""
    import duckdb

    n = 200
    chain = [(i, i - 1) for i in range(1, n) if i % 40 != 0]
    heads = [
        (i, i - 40) for i in range(1, n) if i % 40 == 0 and (i // 40) % 3 != 0
    ]
    directed = _sym(chain + heads)
    want = pagerank_int(directed, iterations=6)

    from bert_namedentityrecognition_spark.oracle.graph import pagerank_sql

    graph_ctes = f"""
ids AS MATERIALIZED (SELECT i FROM range({n}) t(i)),
edges AS (
  SELECT i AS a, i - 1 AS b FROM ids WHERE i > 0 AND i % 40 <> 0
  UNION ALL
  SELECT i AS a, i - 40 AS b FROM ids
  WHERE i > 0 AND i % 40 = 0 AND (i // 40) % 3 <> 0
),
sym AS MATERIALIZED (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges)
"""
    sql = pagerank_sql(graph_ctes, iterations=6)
    got = {int(a): int(b) for a, b in duckdb.sql(sql).fetchall()}
    assert got == want


def _clique_path_edges(n):
    e = [(i, i + 1) for i in range(n - 1)]
    for b in range(0, n, 10):
        if b + 3 <= n - 1:
            e += [(b, b + 2), (b, b + 3), (b + 1, b + 3)]
        if b + 6 <= n - 1:
            e += [(b + 4, b + 6)]
    return e


def test_kcore_fixture_rounds():
    """The gate fixture's peel fixpoint is 2 rounds at ANY n — the SQL
    twin's 4-round unroll budget must always cover it."""
    from bert_namedentityrecognition_spark.oracle.graph import (
        kcore_peel_rounds,
    )

    for n in (17, 37, 100, 1000, 10007):
        assert kcore_peel_rounds(_clique_path_edges(n), 3) == 2, n


def test_kcore_spark_matches_kernel(spark):
    from bert_namedentityrecognition_spark.operators.graph import kcore
    from bert_namedentityrecognition_spark.oracle.graph import kcore_nodes

    edges = _clique_path_edges(97)
    want = kcore_nodes(edges, 3)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["core_degree"] for r in kcore(df, k=3).collect()}
    assert got == want
    # the 3-core is exactly the K4 clique nodes, all at core degree 3
    assert set(got) == {v for v in range(97) if v % 10 < 4}
    assert set(got.values()) == {3}
    # random graph too (may peel to empty — kernel decides)
    rnd = _random_graph(40, 70, seed=5)
    want2 = kcore_nodes(rnd, 3)
    df2 = spark.createDataFrame(rnd, ["src", "dst"])
    got2 = {r["node"]: r["core_degree"] for r in kcore(df2, k=3).collect()}
    assert got2 == want2


def test_kcore_raises_past_round_budget(spark):
    """A long path 2-cores away one node per end per round — a 1-round
    budget must fail LOUDLY, not return a wrong partial peel."""
    import pytest

    from bert_namedentityrecognition_spark.operators.graph import kcore

    path = [(i, i + 1) for i in range(7)]
    df = spark.createDataFrame(path, ["src", "dst"])
    with pytest.raises(RuntimeError, match="fixpoint"):
        kcore(df, k=2, max_rounds=1)


def test_kcore_sql_twin_matches_kernel():
    import duckdb

    from bert_namedentityrecognition_spark.oracle.graph import (
        kcore_nodes,
        kcore_sql,
    )

    n = 200
    want = kcore_nodes(_clique_path_edges(n), 3)
    graph_ctes = f"""
ids AS MATERIALIZED (SELECT i FROM range({n}) t(i)),
und AS (
  SELECT a.i AS u, b.i AS v FROM ids a JOIN ids b ON b.i = a.i + 1
  UNION ALL
  SELECT a.i AS u, a.i + 2 AS v FROM ids a JOIN ids c ON c.i = a.i + 3 WHERE a.i % 10 = 0
  UNION ALL
  SELECT a.i AS u, a.i + 3 AS v FROM ids a JOIN ids c ON c.i = a.i + 3 WHERE a.i % 10 = 0
  UNION ALL
  SELECT a.i + 1 AS u, a.i + 3 AS v FROM ids a JOIN ids c ON c.i = a.i + 3 WHERE a.i % 10 = 0
  UNION ALL
  SELECT a.i + 4 AS u, a.i + 6 AS v FROM ids a JOIN ids c ON c.i = a.i + 6 WHERE a.i % 10 = 0
),
sym AS MATERIALIZED (SELECT u AS a, v AS b FROM und UNION SELECT v AS a, u AS b FROM und)
"""
    got = {
        int(a): int(b)
        for a, b in duckdb.sql(kcore_sql(graph_ctes, k=3, rounds=4)).fetchall()
    }
    assert got == want


def test_pmi_edges_counts_and_boundary(spark):
    """Document-frequency counts + the positive-PMI integer test, including
    the exact-independence boundary (strict >, so independence is weak)."""
    from bert_namedentityrecognition_spark.operators.triples import pmi_edges

    rows = []
    # docs 0,1: drug A with symptom X (perfectly associated)
    for d in (0, 1):
        rows += [(f"u{d}", "aspirin", "drug"), (f"u{d}", "rash", "symptom")]
    # docs 2,3: drug B alone; docs 4,5: symptom Y alone → B⋈Y never co-occur
    rows += [("u2", "ibuprofen", "drug"), ("u3", "ibuprofen", "drug")]
    rows += [("u4", "nausea", "symptom"), ("u5", "nausea", "symptom")]
    # independence boundary: drug C in docs 6,7; symptom Z in docs 6,8:
    # n_pair=1, n_c=2, n_z=2, N=9 (u0..u8) → 1*9 > 2*2 → strong
    rows += [
        ("u6", "statin", "drug"),
        ("u7", "statin", "drug"),
        ("u6", "fever", "symptom"),
        ("u8", "fever", "symptom"),
        ("u8", "x", "drug"),  # len<2 → filtered out entirely
    ]
    df = spark.createDataFrame(rows, ["url", "word", "type"])
    got = {
        (r["subj"], r["obj"]): (
            r["n_pair"], r["n_subj"], r["n_obj"], r["n_docs"], r["strong"]
        )
        for r in pmi_edges(df, n_docs=9).collect()
    }
    assert got[("aspirin", "rash")] == (2, 2, 2, 9, True)  # 2*9 > 2*2
    assert got[("statin", "fever")] == (1, 2, 2, 9, True)  # 9 > 4
    assert ("ibuprofen", "nausea") not in got  # never co-occur → no row
    assert ("x", "fever") not in got  # short-term filter
    # exact independence is NOT strong: n_pair=1, n_subj=2, n_obj=2, N=4
    rows2 = [
        ("d0", "aa", "drug"), ("d0", "ss", "symptom"),
        ("d1", "aa", "drug"), ("d2", "ss", "symptom"),
    ]
    df2 = spark.createDataFrame(rows2, ["url", "word", "type"])
    got2 = {
        (r["subj"], r["obj"]): r["strong"]
        for r in pmi_edges(df2, n_docs=4).collect()
    }
    assert got2[("aa", "ss")] is False  # 1*4 > 2*2 fails (strict)


def test_bfs_spark_matches_kernel_random_graph(spark):
    from bert_namedentityrecognition_spark.operators.graph import bfs_levels_df
    from bert_namedentityrecognition_spark.oracle.graph import bfs_levels

    und = _random_graph(50, 90, seed=11)
    directed = _sym(und)
    seeds = [0, 7, 23]
    want = bfs_levels(directed, seeds, max_hops=4)
    e = spark.createDataFrame(directed, ["src", "dst"])
    s = spark.createDataFrame([(x,) for x in seeds], ["node"])
    got = {
        r["node"]: r["dist"] for r in bfs_levels_df(e, s, max_hops=4).collect()
    }
    assert got == want


def test_bfs_sql_twin_matches_kernel():
    import duckdb

    from bert_namedentityrecognition_spark.oracle.graph import bfs_levels, bfs_sql

    und = _random_graph(40, 70, seed=3)
    directed = _sym(und)
    vals = ", ".join(f"({a},{b})" for a, b in directed)
    ctes = (
        f"sym AS MATERIALIZED (SELECT * FROM (VALUES {vals}) t(a, b)),\n"
        "seeds AS (SELECT * FROM (VALUES (1), (5)) s(node))"
    )
    got = dict(duckdb.sql(bfs_sql(ctes, max_hops=3)).fetchall())
    assert got == bfs_levels(directed, [1, 5], max_hops=3)


def test_bfs_unreached_absent_isolated_seed_present(spark):
    from bert_namedentityrecognition_spark.operators.graph import bfs_levels_df

    # chain 0-1-2-3-4-5, plus far island 100-101; seed 0 and isolated 50
    directed = _sym([(i, i + 1) for i in range(5)] + [(100, 101)])
    e = spark.createDataFrame(directed, ["src", "dst"])
    s = spark.createDataFrame([(0,), (50,)], ["node"])
    got = {r["node"]: r["dist"] for r in bfs_levels_df(e, s, max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 50: 0}  # 4,5 beyond hops; island dark


def test_bfs_frontier_dies_early_and_empty_seeds(spark):
    from bert_namedentityrecognition_spark.operators.graph import bfs_levels_df

    directed = _sym([(0, 1)])
    e = spark.createDataFrame(directed, ["src", "dst"])
    s = spark.createDataFrame([(0,)], ["node"])
    got = {r["node"]: r["dist"] for r in bfs_levels_df(e, s, max_hops=8).collect()}
    assert got == {0: 0, 1: 1}  # frontier empty after level 1, no-op levels safe
    empty = spark.createDataFrame([], "node long")
    assert bfs_levels_df(e, empty, max_hops=3).collect() == []


def test_random_walks_spark_matches_kernel(spark):
    from bert_namedentityrecognition_spark.operators.graph import random_walks
    from bert_namedentityrecognition_spark.oracle.graph import random_walks_kernel

    und = _random_graph(30, 50, seed=9)
    directed = _sym(und)
    want = sorted(random_walks_kernel(directed, length=3, n_walks=2))
    e = spark.createDataFrame(directed, ["src", "dst"])
    got = sorted(
        (r["start"], r["walk"], r["step"], r["node"])
        for r in random_walks(e, length=3, n_walks=2).collect()
    )
    assert got == want


def test_random_walks_deterministic_and_partitioning_invariant(spark):
    from bert_namedentityrecognition_spark.operators.graph import random_walks

    directed = _sym([(i, i + 1) for i in range(20)])
    e1 = spark.createDataFrame(directed, ["src", "dst"])
    e2 = spark.createDataFrame(directed, ["src", "dst"]).repartition(7)
    a = sorted(map(tuple, random_walks(e1, length=4, n_walks=1).collect()))
    b = sorted(map(tuple, random_walks(e2, length=4, n_walks=1).collect()))
    assert a == b and len(a) == 21 * 5  # every node, full length (no dead ends)


def test_random_walks_dead_end_truncates(spark):
    from bert_namedentityrecognition_spark.operators.graph import random_walks
    from bert_namedentityrecognition_spark.oracle.graph import random_walks_kernel

    directed = [(0, 1), (1, 2)]  # 2 has no out-edge: walks stop there
    e = spark.createDataFrame(directed, ["src", "dst"])
    got = sorted(
        (r["start"], r["walk"], r["step"], r["node"])
        for r in random_walks(e, length=5, n_walks=1).collect()
    )
    assert got == sorted(random_walks_kernel(directed, length=5, n_walks=1))
    # walk from 0 is 0→1→2 then truncation: steps 0..2 only
    from_zero = [r for r in got if r[0] == 0]
    assert [r[3] for r in sorted(from_zero, key=lambda r: r[2])] == [0, 1, 2]


def test_label_prop_spark_matches_kernel(spark):
    from bert_namedentityrecognition_spark.operators.graph import (
        label_propagation,
    )
    from bert_namedentityrecognition_spark.oracle.graph import label_prop

    und = _random_graph(60, 140, seed=23)
    directed = _sym(und)
    want = label_prop(directed, rounds=5)
    df = spark.createDataFrame(directed, ["src", "dst"])
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, rounds=5).collect()
    }
    assert got == want


def test_label_prop_tie_breaks_to_smallest_label(spark):
    """Node 2 hears labels {0, 1} once each plus its own self-vote for 2 —
    three-way tie → smallest label 0 wins; and the self-vote keeps an
    isolated pair from swapping forever (round-2 state is stable)."""
    from bert_namedentityrecognition_spark.operators.graph import (
        label_propagation,
    )
    from bert_namedentityrecognition_spark.oracle.graph import label_prop

    directed = [(0, 2), (1, 2), (2, 0), (2, 1), (5, 6), (6, 5)]
    want1 = label_prop(directed, rounds=1)
    assert want1[2] == 0  # (-1, 0) < (-1, 1) < (-1, 2)
    assert want1[6] == 5 and want1[5] == 5  # pair collapses, no swap
    assert label_prop(directed, rounds=2)[5] == 5  # stable thereafter
    df = spark.createDataFrame(directed, ["src", "dst"])
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, rounds=1).collect()
    }
    assert got == want1


def test_label_prop_sql_twin_matches_kernel():
    """The unrolled DuckDB twin reproduces the kernel bit-for-bit on the
    gate's derived graph shape (chain-of-40 + block heads, symmetrized)."""
    import duckdb

    from bert_namedentityrecognition_spark.oracle.graph import (
        label_prop,
        label_prop_sql,
    )

    n = 200
    chain = [(i, i - 1) for i in range(1, n) if i % 40 != 0]
    heads = [
        (i, i - 40) for i in range(1, n) if i % 40 == 0 and (i // 40) % 3 != 0
    ]
    directed = _sym(chain + heads)
    want = label_prop(directed, rounds=6)

    graph_ctes = f"""
ids AS MATERIALIZED (SELECT i FROM range({n}) t(i)),
edges AS (
  SELECT i AS a, i - 1 AS b FROM ids WHERE i > 0 AND i % 40 <> 0
  UNION ALL
  SELECT i AS a, i - 40 AS b FROM ids
  WHERE i > 0 AND i % 40 = 0 AND (i // 40) % 3 <> 0
),
sym AS MATERIALIZED (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges)
"""
    sql = label_prop_sql(graph_ctes, rounds=6)
    got = {int(a): int(b) for a, b in duckdb.sql(sql).fetchall()}
    assert got == want


def test_hits_spark_matches_kernel(spark):
    from bert_namedentityrecognition_spark.operators.graph import hits_integer
    from bert_namedentityrecognition_spark.oracle.graph import hits_int

    random.seed(11)
    directed = list(
        {(random.randrange(25), random.randrange(25)) for _ in range(70)}
    )
    df = spark.createDataFrame(directed, ["src", "dst"])
    got = {
        r["node"]: (r["hub_scaled"], r["auth_scaled"])
        for r in hits_integer(df, iterations=3).collect()
    }
    assert got == hits_int(directed, iterations=3)


def test_hits_known_graph(spark):
    """Star u->{1,2,3}: u is the sole hub, leaves are pure authorities."""
    from bert_namedentityrecognition_spark.operators.graph import hits_integer
    from bert_namedentityrecognition_spark.oracle.graph import hits_int

    edges = [(0, 1), (0, 2), (0, 3)]
    want = hits_int(edges, iterations=2)
    # hand check: auth1(v)=1 each, hub1(0)=3; auth2(v)=3, hub2(0)=9
    assert want[0] == (9, 0)
    assert want[1] == want[2] == want[3] == (0, 3)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: (r["hub_scaled"], r["auth_scaled"])
        for r in hits_integer(df, iterations=2).collect()
    }
    assert got == want


def test_hits_sql_twin_matches_kernel():
    import duckdb

    from bert_namedentityrecognition_spark.oracle.graph import (
        hits_int,
        hits_sql,
    )

    random.seed(13)
    directed = list(
        {(random.randrange(20), random.randrange(20)) for _ in range(50)}
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE e(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", directed)
    sql = hits_sql("dedges AS MATERIALIZED (SELECT DISTINCT a, b FROM e)", 3)
    got = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    assert got == hits_int(directed, iterations=3)


def test_ppr_spark_matches_kernel(spark):
    from bert_namedentityrecognition_spark.operators.graph import (
        personalized_pagerank_integer,
    )
    from bert_namedentityrecognition_spark.oracle.graph import ppr_int

    random.seed(17)
    directed = list(
        {(random.randrange(30), random.randrange(30)) for _ in range(90)}
    )
    # symmetrize so no node dangles (the gate fixture's convention)
    sym = list({*directed, *[(b, a) for a, b in directed]})
    df = spark.createDataFrame(sym, ["src", "dst"])
    got = {
        r["node"]: r["rank_scaled"]
        for r in personalized_pagerank_integer(
            df, "{node} % 5 = 0", iterations=4
        ).collect()
    }
    seeds = [v for v in range(30) if v % 5 == 0]
    assert got == ppr_int(sym, seeds, iterations=4)


def test_ppr_seedless_component_is_exactly_zero(spark):
    """Locality: a component with no seed holds rank 0 — the property
    that distinguishes PPR from global PageRank."""
    from bert_namedentityrecognition_spark.operators.graph import (
        personalized_pagerank_integer,
    )

    # component A: 0-1-2 (0 is a seed); component B: 10-11 (no seed)
    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (10, 11), (11, 10)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["rank_scaled"]
        for r in personalized_pagerank_integer(
            df, "{node} = 0", iterations=3
        ).collect()
    }
    assert got[10] == 0 and got[11] == 0
    assert got[0] > 0 and got[1] > 0 and got[2] > 0


def test_ppr_sql_twin_matches_kernel():
    import duckdb

    from bert_namedentityrecognition_spark.oracle.graph import (
        ppr_int,
        ppr_sql,
    )

    random.seed(19)
    directed = list(
        {(random.randrange(25), random.randrange(25)) for _ in range(70)}
    )
    sym = list({*directed, *[(b, a) for a, b in directed]})
    con = duckdb.connect()
    con.execute("CREATE TABLE e(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", sym)
    sql = ppr_sql(
        "sym AS MATERIALIZED (SELECT DISTINCT a, b FROM e)",
        "{node} % 4 = 1",
        iterations=4,
    )
    got = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    seeds = [v for v in range(25) if v % 4 == 1]
    assert got == ppr_int(sym, seeds, iterations=4)


def test_bfs_path_counts_spark_matches_kernel(spark):
    from bert_namedentityrecognition_spark.operators.graph import (
        bfs_path_counts_df,
    )
    from bert_namedentityrecognition_spark.oracle.graph import bfs_path_counts

    rng = random.Random(11)
    edges = sorted(
        {(rng.randrange(50), rng.randrange(50)) for _ in range(160)}
    )
    edges = [(a, b) for a, b in edges if a != b]
    seeds = [0, 7, 23]
    want = bfs_path_counts(edges, seeds, max_hops=4)
    df = spark.createDataFrame(edges, ["src", "dst"])
    sdf = spark.createDataFrame([(s,) for s in seeds], ["node"])
    got = {
        r["node"]: (r["dist"], r["sigma"])
        for r in bfs_path_counts_df(df, sdf, max_hops=4).collect()
    }
    assert got == want


def test_bfs_path_counts_diamond():
    from bert_namedentityrecognition_spark.oracle.graph import bfs_path_counts

    # 0->1, 0->2, 1->3, 2->3: two shortest paths to node 3
    got = bfs_path_counts([(0, 1), (0, 2), (1, 3), (2, 3)], [0], 3)
    assert got == {0: (0, 1), 1: (1, 1), 2: (1, 1), 3: (2, 2)}


def test_bfs_sigma_sql_twin_matches_kernel():
    import duckdb

    from bert_namedentityrecognition_spark.oracle.graph import (
        bfs_path_counts,
        bfs_sigma_sql,
    )

    # chain + skip segment: tilings of 1- and 2-steps give sigma > 1
    edges = [(i, i - 1) for i in range(1, 20)] + [
        (i, i - 2) for i in range(2, 20) if i % 3
    ]
    sql = bfs_sigma_sql(
        "sym AS MATERIALIZED (SELECT a, b FROM (VALUES "
        + ", ".join(f"({a}, {b})" for a, b in edges)
        + ") t(a, b)),\nseeds AS (SELECT 19 AS node)",
        max_hops=6,
    )
    got = {r[0]: (r[1], r[2]) for r in duckdb.sql(sql).fetchall()}
    want = bfs_path_counts(edges, [19], 6)
    assert got == want
    assert max(s for _, s in got.values()) > 1  # sigma branch live


def test_mis_spark_matches_kernel_and_is_valid(spark):
    from bert_namedentityrecognition_spark.operators.graph import (
        maximal_independent_set,
    )
    from bert_namedentityrecognition_spark.oracle.graph import mis_luby

    und = _random_graph(60, 150, seed=3)
    want = mis_luby(und, max_rounds=32)
    df = spark.createDataFrame(und, ["src", "dst"])
    got = {
        r["node"]: r["mis_round"]
        for r in maximal_independent_set(df, max_rounds=32).collect()
    }
    assert got == want
    # independence: no edge inside the MIS; maximality: every non-member
    # has a member neighbor
    nbrs = {}
    nodes = set()
    for a, b in und:
        nodes |= {a, b}
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    mis = set(got)
    assert not any(b in mis for a in mis for b in nbrs[a])
    assert all(v in mis or (nbrs[v] & mis) for v in nodes)


def test_mis_sql_twin_matches_kernel():
    import duckdb

    from bert_namedentityrecognition_spark.oracle.graph import mis_luby, mis_sql

    und = _random_graph(40, 80, seed=9)
    sql = mis_sql(
        "e0 AS (SELECT a, b FROM (VALUES "
        + ", ".join(f"({a}, {b})" for a, b in und)
        + ") t(a, b)),\n"
        "sym AS MATERIALIZED (SELECT a, b FROM e0 UNION SELECT b, a FROM e0)",
        rounds=32,
    )
    got = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
    assert got == mis_luby(und, max_rounds=32)


def test_mis_overrun_fails_loudly(spark):
    import pytest

    from bert_namedentityrecognition_spark.operators.graph import (
        maximal_independent_set,
    )
    from bert_namedentityrecognition_spark.oracle.graph import mis_luby

    und = _random_graph(60, 150, seed=5)
    df = spark.createDataFrame(und, ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not decide"):
        maximal_independent_set(df, max_rounds=1)
    with pytest.raises(RuntimeError, match="did not decide"):
        mis_luby(und, max_rounds=1)


def test_mis_empty_and_single_edge(spark):
    from bert_namedentityrecognition_spark.operators.graph import (
        maximal_independent_set,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("src", LongType()), StructField("dst", LongType())]
    )
    assert maximal_independent_set(spark.createDataFrame([], schema)).count() == 0
    got = {
        r["node"]: r["mis_round"]
        for r in maximal_independent_set(
            spark.createDataFrame([(5, 9)], schema)
        ).collect()
    }
    assert len(got) == 1 and set(got) <= {5, 9}


def test_nearest_seed_spark_matches_kernel(spark):
    from bert_namedentityrecognition_spark.operators.graph import nearest_seed_df
    from bert_namedentityrecognition_spark.oracle.graph import bfs_nearest_seed

    rng = random.Random(17)
    edges = sorted({(rng.randrange(50), rng.randrange(50)) for _ in range(150)})
    edges = [(a, b) for a, b in edges if a != b]
    seeds = [3, 20, 41]
    want = bfs_nearest_seed(edges, seeds, max_hops=4)
    got = {
        r["node"]: (r["dist"], r["seed"])
        for r in nearest_seed_df(
            spark.createDataFrame(edges, ["src", "dst"]),
            spark.createDataFrame([(s,) for s in seeds], ["node"]),
            max_hops=4,
        ).collect()
    }
    assert got == want


def test_nearest_seed_tie_takes_min_seed():
    from bert_namedentityrecognition_spark.oracle.graph import bfs_nearest_seed

    # path 0-1-2-3-4, seeds 0 and 4: node 2 is equidistant -> seed 0 wins
    e = [(i, i + 1) for i in range(4)] + [(i + 1, i) for i in range(4)]
    got = bfs_nearest_seed(e, [0, 4], 4)
    assert got[2] == (2, 0)
    assert got[1] == (1, 0) and got[3] == (1, 4)


def test_nearest_seed_sql_twin_matches_kernel():
    import duckdb

    from bert_namedentityrecognition_spark.oracle.graph import (
        bfs_nearest_seed,
        nearest_seed_sql,
    )

    e = [(i, i + 1) for i in range(30)] + [(i + 1, i) for i in range(30)]
    sql = nearest_seed_sql(
        "sym AS MATERIALIZED (SELECT a, b FROM (VALUES "
        + ", ".join(f"({a}, {b})" for a, b in e)
        + ") t(a, b)),\nseeds AS (SELECT unnest([0, 12, 24]) AS node)",
        max_hops=6,
    )
    got = {r[0]: (r[1], r[2]) for r in duckdb.sql(sql).fetchall()}
    assert got == bfs_nearest_seed(e, [0, 12, 24], 6)
    assert got[6] == (6, 0)  # equidistant from 0 and 12 -> min seed


def test_temporal_reachability_spark_matches_kernel(spark):
    from bert_namedentityrecognition_spark.operators.graph import (
        temporal_reachability_df,
    )
    from bert_namedentityrecognition_spark.oracle.graph import (
        temporal_reachability,
    )

    rng = random.Random(23)
    tedges = sorted(
        {
            (rng.randrange(40), rng.randrange(40), rng.randrange(50))
            for _ in range(180)
        }
    )
    tedges = [(a, b, t) for a, b, t in tedges if a != b]
    seeds = [0, 13]
    want = temporal_reachability(tedges, seeds, rounds=5)
    got = {
        r["node"]: r["arrival"]
        for r in temporal_reachability_df(
            spark.createDataFrame(tedges, ["src", "dst", "t"]),
            spark.createDataFrame([(s,) for s in seeds], ["node"]),
            rounds=5,
        ).collect()
    }
    assert got == want


def test_temporal_reachability_respects_time_order():
    from bert_namedentityrecognition_spark.oracle.graph import (
        temporal_reachability,
    )

    # 0 -(t=5)-> 1 -(t=3)-> 2: edge to 2 happens BEFORE arrival at 1
    got = temporal_reachability([(0, 1, 5), (1, 2, 3)], [0], 4)
    assert got == {0: 0, 1: 5}
    # reversed times: both reachable
    got2 = temporal_reachability([(0, 1, 3), (1, 2, 5)], [0], 4)
    assert got2 == {0: 0, 1: 3, 2: 5}


def test_temporal_reachability_sql_twin_matches_kernel():
    import duckdb

    from bert_namedentityrecognition_spark.oracle.graph import (
        temporal_reachability,
        temporal_reachability_sql,
    )

    tedges = [(i, i - 1, (i * 13) % 17) for i in range(1, 30)] + [
        (i, i - 2, (i * 29) % 17) for i in range(2, 30) if i % 3
    ]
    sql = temporal_reachability_sql(
        "tedges AS MATERIALIZED (SELECT a, b, t FROM (VALUES "
        + ", ".join(f"({a}, {b}, {t})" for a, b, t in tedges)
        + ") x(a, b, t)),\nseeds AS (SELECT unnest([29, 14]) AS node)",
        rounds=6,
    )
    got = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
    want = temporal_reachability(tedges, [29, 14], 6)
    assert got == want
    assert len(got) > 2  # reachability actually propagates


def test_temporal_cone_is_subset_of_static_cone(spark, sf_dir):
    """The time-respecting reachable set is strictly inside the static
    8-hop BFS cone on the shared citation fixture — the constraint bites."""
    import __spark_entry__ as E

    temporal = {
        r["node"]
        for r in E.queries()["kg_temporal_reachability"](spark, sf_dir).collect()
    }
    static = {
        r["node"]
        for r in E.queries()["kg_shortest_path_counts"](spark, sf_dir).collect()
    }
    assert temporal < static  # strict subset: time order prunes real paths


def test_induced_subgraph_closure_property(spark, sf_dir):
    """Every endpoint is within 2 hops; every edge of the full graph with
    both endpoints reached appears (induction completeness); closing edges
    (non-tree, dist_src == dist_dst possible) are captured."""
    import __spark_entry__ as E
    from pyspark.sql import functions as F
    from bert_namedentityrecognition_spark.operators.graph import bfs_levels_df

    rows = E.queries()["kg_induced_subgraph"](spark, sf_dir).collect()
    assert rows
    assert all(r["dist_src"] <= 2 and r["dist_dst"] <= 2 for r in rows)
    # recompute induction by hand
    sym = E._alias_graph(spark, sf_dir)
    import duckdb

    n = duckdb.sql(f"SELECT count(*) FROM '{sf_dir}/events.parquet'").fetchone()[0]
    seeds = spark.range(n).filter(F.col("id") % 251 == 0).select(F.col("id").alias("node"))
    reached = {r["node"] for r in bfs_levels_df(sym, seeds, max_hops=2).collect()}
    und = {(r["src"], r["dst"]) for r in sym.filter(F.col("src") < F.col("dst")).collect()}
    want = {(u, v) for u, v in und if u in reached and v in reached}
    assert {(r["src"], r["dst"]) for r in rows} == want


def test_weighted_pagerank_matches_kernel(spark):
    from bert_namedentityrecognition_spark.operators.graph import (
        weighted_pagerank_integer,
    )
    from bert_namedentityrecognition_spark.oracle.graph import wpagerank_int

    rng = random.Random(31)
    wedges = sorted(
        {(rng.randrange(40), rng.randrange(40)) for _ in range(140)}
    )
    wedges = [(a, b, 1 + (a * 3 + b) % 7) for a, b in wedges if a != b]
    want = wpagerank_int(wedges, iterations=5)
    got = {
        r["node"]: r["rank_scaled"]
        for r in weighted_pagerank_integer(
            spark.createDataFrame(wedges, ["src", "dst", "w"]), iterations=5
        ).collect()
    }
    assert got == want


def test_weighted_pagerank_uniform_weights_equal_unweighted():
    from bert_namedentityrecognition_spark.oracle.graph import (
        pagerank_int,
        wpagerank_int,
    )

    edges = [(i, (i + 1) % 20) for i in range(20)] + [(i, (i + 7) % 20) for i in range(20)]
    # all weights equal -> identical to the unweighted kernel
    assert wpagerank_int([(a, b, 3) for a, b in edges], 4) == pagerank_int(edges, 4)


def test_weighted_pagerank_weight_shifts_mass():
    from bert_namedentityrecognition_spark.oracle.graph import wpagerank_int

    # 0 -> 1 (heavy), 0 -> 2 (light): node 1 must outrank node 2
    r = wpagerank_int([(0, 1, 9), (0, 2, 1), (1, 0, 1), (2, 0, 1)], 6)
    assert r[1] > r[2]


def test_wpagerank_sql_twin_matches_kernel():
    import duckdb

    from bert_namedentityrecognition_spark.oracle.graph import (
        wpagerank_int,
        wpagerank_sql,
    )

    wedges = [(i, (i + 1) % 15, 1 + (i % 4)) for i in range(15)] + [
        ((i + 1) % 15, i, 2) for i in range(15)
    ]
    sql = wpagerank_sql(
        "wsym AS MATERIALIZED (SELECT a, b, w FROM (VALUES "
        + ", ".join(f"({a}, {b}, {w})" for a, b, w in wedges)
        + ") t(a, b, w))",
        iterations=5,
    )
    got = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
    assert got == wpagerank_int(wedges, iterations=5)


def test_harmonic_centrality_matches_kernel(spark):
    from bert_namedentityrecognition_spark.operators.graph import (
        harmonic_centrality_df,
    )
    from bert_namedentityrecognition_spark.oracle.graph import (
        harmonic_centrality,
    )

    rng = random.Random(41)
    edges = sorted({(rng.randrange(40), rng.randrange(40)) for _ in range(130)})
    edges = [(a, b) for a, b in edges if a != b]
    seeds = [0, 9, 33]
    want = harmonic_centrality(edges, seeds, max_hops=4)
    got = {
        r["seed"]: r["h_scaled"]
        for r in harmonic_centrality_df(
            spark.createDataFrame(edges, ["src", "dst"]),
            spark.createDataFrame([(s,) for s in seeds], ["node"]),
            max_hops=4,
        ).collect()
    }
    assert got == want


def test_harmonic_hand_values_and_bound():
    import pytest

    from bert_namedentityrecognition_spark.oracle.graph import (
        harmonic_centrality,
    )

    # path 0-1-2-3 from seed 0: 840/1 + 840/2 + 840/3 = 840+420+280
    e = [(i, i + 1) for i in range(3)] + [(i + 1, i) for i in range(3)]
    assert harmonic_centrality(e, [0], 8)[0] == 840 + 420 + 280
    assert harmonic_centrality(e, [99], 8)[99] == 0  # isolated seed
    with pytest.raises(ValueError, match="max_hops"):
        harmonic_centrality(e, [0], 9)


def test_harmonic_sql_twin_matches_kernel():
    import duckdb

    from bert_namedentityrecognition_spark.oracle.graph import (
        harmonic_centrality,
        harmonic_sql,
    )

    e = [(i, i + 1) for i in range(25)] + [(i + 1, i) for i in range(25)]
    sql = harmonic_sql(
        "sym AS MATERIALIZED (SELECT a, b FROM (VALUES "
        + ", ".join(f"({a}, {b})" for a, b in e)
        + ") t(a, b)),\nseeds AS (SELECT unnest([0, 12, 25]) AS node)",
        max_hops=6,
    )
    got = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
    assert got == harmonic_centrality(e, [0, 12, 25], 6)


def test_stress_kernel_diamond_and_grid():
    from bert_namedentityrecognition_spark.oracle.graph import (
        stress_centrality,
    )

    # diamond 0-{1,2}-3-4 (symmetric): node 3 mediates both 0→4 routes
    und = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    got = stress_centrality(_sym(und), [0, 4], 5)
    assert got == {1: (1, 1), 2: (1, 1), 3: (2, 1)}
    # 3x3 grid, opposite corners: sigma through centre = C(2,1)*C(2,1)=4
    und = [
        (r * 3 + c, r * 3 + c + 1) for r in range(3) for c in range(2)
    ] + [(r * 3 + c, (r + 1) * 3 + c) for r in range(2) for c in range(3)]
    got = stress_centrality(_sym(und), [0, 8], 8)
    assert got[4] == (4, 1)  # centre: 2 routes in x 2 routes out
    assert got[1] == (3, 1) and got[3] == (3, 1)  # edge-adjacent: C(3,1)


def test_stress_spark_matches_kernel(spark):
    from bert_namedentityrecognition_spark.operators.graph import (
        stress_centrality_df,
    )
    from bert_namedentityrecognition_spark.oracle.graph import (
        stress_centrality,
    )

    und = _random_graph(40, 90, seed=23)
    directed = _sym(und)
    seeds = [0, 5, 11, 17, 29]
    want = stress_centrality(directed, seeds, max_hops=5)
    df = spark.createDataFrame(directed, ["src", "dst"])
    sdf = spark.createDataFrame([(s,) for s in seeds], ["node"])
    got = {
        r["node"]: (r["stress"], r["n_pairs"])
        for r in stress_centrality_df(df, sdf, max_hops=5).collect()
    }
    assert got == want
    assert got  # fixture produces mediated pairs


def test_stress_sql_twin_matches_kernel():
    import duckdb

    from bert_namedentityrecognition_spark.oracle.graph import (
        stress_centrality,
        stress_sql,
    )

    # 4x4 grid (sigma > 1 between non-collinear seeds)
    und = [
        (r * 4 + c, r * 4 + c + 1) for r in range(4) for c in range(3)
    ] + [(r * 4 + c, (r + 1) * 4 + c) for r in range(3) for c in range(4)]
    directed = _sym(und)
    seeds = [0, 3, 12, 15]
    sql = stress_sql(
        "sym AS MATERIALIZED (SELECT a, b FROM (VALUES "
        + ", ".join(f"({a}, {b})" for a, b in directed)
        + ") t(a, b)),\nseeds AS (SELECT node FROM (VALUES "
        + ", ".join(f"({s})" for s in seeds)
        + ") s(node))",
        max_hops=6,
    )
    got = {r[0]: (r[1], r[2]) for r in duckdb.sql(sql).fetchall()}
    want = stress_centrality(directed, seeds, max_hops=6)
    assert got == want
    assert max(s for s, _ in got.values()) > 1  # sigma-product branch live


def test_scc_bounded_kernel_and_twin():
    import duckdb

    from bert_namedentityrecognition_spark.oracle.graph import (
        scc_bounded,
        scc_sql,
    )

    # 4-cycle → chain → 4-cycle; plus a too-long 3-hop-wide pair check
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (3, 4), (4, 5), (5, 6),
             (6, 7), (7, 8), (8, 5)]
    want = scc_bounded(edges, max_hops=8)
    assert want == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 5, 8: 5}
    sql = scc_sql(
        "dedges AS (SELECT a, b FROM (VALUES "
        + ", ".join(f"({a}, {b})" for a, b in edges)
        + ") t(a, b))",
        doublings=3,
    )
    got = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
    assert got == want


def test_scc_spark_matches_kernel(spark):
    from bert_namedentityrecognition_spark.operators.graph import (
        scc_bounded_df,
    )
    from bert_namedentityrecognition_spark.oracle.graph import scc_bounded

    rng = random.Random(31)
    edges = sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(55)})
    want = scc_bounded(edges, max_hops=8)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["comp"] for r in scc_bounded_df(df, doublings=3).collect()
    }
    assert got == want
    assert len(set(got.values())) < len(got)  # random digraph has real SCCs


def test_eccentricity_kernel_twin_and_spark(spark):
    import duckdb

    from bert_namedentityrecognition_spark.operators.graph import (
        eccentricity_bounded_df,
    )
    from bert_namedentityrecognition_spark.oracle.graph import (
        eccentricity_bounded,
        eccentricity_sql,
    )

    und = _random_graph(35, 70, seed=41)
    directed = _sym(und)
    seeds = [0, 9, 21]
    want = eccentricity_bounded(directed, seeds, max_hops=4)
    sql = eccentricity_sql(
        "sym AS MATERIALIZED (SELECT a, b FROM (VALUES "
        + ", ".join(f"({a}, {b})" for a, b in directed)
        + ") t(a, b)),\nseeds AS (SELECT node FROM (VALUES "
        + ", ".join(f"({s})" for s in seeds)
        + ") s(node))",
        max_hops=4,
    )
    got_sql = {r[0]: (r[1], r[2], r[3]) for r in duckdb.sql(sql).fetchall()}
    assert got_sql == want
    df = spark.createDataFrame(directed, ["src", "dst"])
    sdf = spark.createDataFrame([(s,) for s in seeds], ["node"])
    got = {
        r["seed"]: (r["ecc"], r["n_reached"], r["sum_sigma"])
        for r in eccentricity_bounded_df(df, sdf, max_hops=4).collect()
    }
    assert got == want
