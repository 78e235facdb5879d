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


def test_jp_coloring_proper_and_equals_kernel(spark):
    """Spark JP coloring == the pure-Python kernel on a random graph,
    and the result is a proper coloring."""
    import random

    from bert_namedentityrecognition_spark.operators.graph import (
        jones_plassmann_coloring,
    )
    from bert_namedentityrecognition_spark.oracle.graph import jp_coloring

    rng = random.Random(7)
    edges = set()
    while len(edges) < 60:
        a, b = rng.randrange(40), rng.randrange(40)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["color"], r["jp_round"])
        for r in jones_plassmann_coloring(df, max_rounds=16).collect()
    }
    want = jp_coloring(edges, max_rounds=16)
    assert got == want
    for a, b in edges:
        assert got[a][0] != got[b][0]


def test_jp_coloring_round_overrun_raises(spark):
    import pytest as _pytest

    from bert_namedentityrecognition_spark.operators.graph import (
        jones_plassmann_coloring,
    )

    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    with _pytest.raises(RuntimeError):
        jones_plassmann_coloring(df, max_rounds=0).collect()


def test_auc_ranksum_known_values():
    """The 2R-integer rank-sum formula reproduces hand-computed AUCs:
    perfect separation -> 1.0, reversed -> 0.0, all-tied -> 0.5."""
    def auc_ppm(pairs):  # (score, is_pos)
        from collections import Counter

        ns = Counter(s for s, _ in pairs)
        npos_s = Counter(s for s, p in pairs if p)
        n_pos = sum(npos_s.values())
        n_neg = len(pairs) - n_pos
        cum = 0
        r2 = 0
        for s in sorted(ns):
            r2 += npos_s.get(s, 0) * (2 * cum + ns[s] + 1)
            cum += ns[s]
        return (1000000 * (r2 - n_pos * (n_pos + 1))) // (2 * n_pos * n_neg)

    assert auc_ppm([(1, False), (2, False), (3, True), (4, True)]) == 1000000
    assert auc_ppm([(1, True), (2, True), (3, False), (4, False)]) == 0
    assert auc_ppm([(5, True), (5, False), (5, True), (5, False)]) == 500000
    # one tie straddling the classes: wins (1 + 2) + half-credit tie (0.5)
    # over 4 pairs -> AUC = 0.875 exactly
    assert auc_ppm([(1, False), (2, True), (2, False), (3, True)]) == 875000


def test_gini_ppm_formula():
    # 3 types with counts 2,1,1: gini = 1 - (4+1+1)/16 = 10/16 = 0.625
    n, ss = 4, 6
    assert (1000000 * (n * n - ss)) // (n * n) == 625000
    # single type -> 0
    assert (1000000 * (9 - 9)) // 9 == 0


def test_ledger_audit_twin_replay_nonzero():
    """The ledger-audit oracle generator's per-page replay finds mentions
    and the VALUES cover the full MAX corpus (prefix-stability contract)."""
    import re

    import __spark_entry__ as entry
    from bert_namedentityrecognition_spark.oracle.bert_sql import N_PAGES_MAX

    sql = entry._pipeline_ledger_audit_sql()
    pairs = re.findall(r"\((\d+), (\d+)\)", sql.split("pm(i, n_m)")[1])
    assert len(pairs) == N_PAGES_MAX
    assert sum(int(b) for _, b in pairs) > 0
    # some pages legitimately yield zero mentions (en/zh, null, >512)
    assert any(int(b) == 0 for _, b in pairs)


def test_kendall_shift_formula():
    # perfect increasing trend over 4 buckets: C=6, D=0, P=6 -> 1.0
    assert (1000000 * (6 - 0 + 6)) // (2 * 6) == 1000000
    # perfect decreasing: C=0, D=6 -> 0.0
    assert (1000000 * (0 - 6 + 6)) // (2 * 6) == 0
    # no trend (C == D) -> 0.5
    assert (1000000 * (2 - 2 + 6)) // (2 * 6) == 500000


def test_qerror_symmetric_and_floor_one():
    # q-error is max/min, so over- and under-estimates score identically
    est, act = 200, 100
    assert (1000000 * max(est, act)) // max(min(est, act), 1) == 2000000
    est, act = 100, 200
    assert (1000000 * max(est, act)) // max(min(est, act), 1) == 2000000
    # an empty conjunction doesn't divide by zero
    assert (1000000 * max(50, 0)) // max(min(50, 0), 1) == 50000000


def test_l2sq_fold_bit_identical(spark):
    """The Spark aggregate/zip_with fold and the DuckDB list_reduce fold
    produce BIT-IDENTICAL squared distances on adversarial float32
    components (values whose double sums depend on addition order)."""
    import struct

    import __spark_entry__ as entry

    a = [1e8, 1.0, -1e8, 3.14159, 1e-7, 2.71828] + [0.1] * 58
    b = [0.0, 2.0, 1e8, -1.0, 1e7, 0.5] + [0.30000001] * 58
    # round-trip through float32 like the parquet column does
    f32 = lambda xs: [struct.unpack("f", struct.pack("f", x))[0] for x in xs]
    a32, b32 = f32(a), f32(b)
    df = spark.createDataFrame(
        [(a32, b32)], "va array<float>, vb array<float>"
    )
    (got_spark,) = df.select(
        F.expr(entry._L2SQ_SPARK.format(a="va", b="vb")).alias("d")
    ).collect()[0]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT CAST(? AS FLOAT[]) AS va, CAST(? AS FLOAT[]) AS vb",
        [a32, b32],
    )
    (got_duck,) = con.execute(
        "SELECT " + entry._L2SQ_DUCK.format(a="va", b="vb") + " FROM t"
    ).fetchone()
    assert struct.pack("d", got_spark) == struct.pack("d", got_duck)


def test_changepoint_statistic_peaks_at_shift():
    """n*P_i - i*T peaks exactly at a constructed level shift."""
    series = [10] * 5 + [50] * 5  # shift after day 5
    n, t = len(series), sum(series)
    best_i, best = None, -1
    p = 0
    for i, x in enumerate(series[:-1], start=1):
        p += x
        s = abs(n * p - i * t)
        if s > best:
            best, best_i = s, i
    assert best_i == 5


def test_benford_constants_sum_to_one():
    import __spark_entry__ as entry

    total = sum(entry._BENFORD_PPM)
    assert abs(total - 1000000) <= 5  # rounding of 9 constants
    # and they are the canonical log10(1+1/d) values
    import math

    for d, ppm in enumerate(entry._BENFORD_PPM, start=1):
        assert ppm == round(1000000 * math.log10(1 + 1 / d))


def test_equidepth_buckets_are_contiguous_and_balanced(spark):
    """Histogram invariants at sf0.001: buckets tile the value range in
    order and masses differ by at most 1 row."""
    import __spark_entry__ as entry

    rows = sorted(
        entry._optimizer_histogram_stats(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in rows] == list(range(1, 11))
    masses = [r["n_rows"] for r in rows]
    assert max(masses) - min(masses) <= 1
    for prev, cur in zip(rows, rows[1:]):
        assert prev["hi_cents"] <= cur["lo_cents"]


def test_frame_sample_positions_in_bounds(spark):
    import __spark_entry__ as entry

    rows = entry._multimodal_frame_sample(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 <= r["frame_idx"] * 64 < r["n_frames"] * 64 + 64
        assert 32 <= r["frame_byte"] <= 126  # printable ASCII enforced


def test_bgp_optional_branch_totals(spark):
    """bound + unbound == n_degraded per subject, both branches live."""
    import __spark_entry__ as entry

    rows = entry._kg_bgp_optional(spark, "/root/testdata/sf0.001").collect()
    assert rows
    assert all(
        r["n_contradicted"] + r["n_unbound"] == r["n_degraded"] for r in rows
    )
    assert any(r["n_contradicted"] > 0 for r in rows)
    assert any(r["n_unbound"] > 0 for r in rows)


def test_skipgram_pairs_symmetric_and_windowed(spark):
    """Every (center, context, d) has its mirrored (context, center, d)
    with the same count (the self-join emits both directions)."""
    import __spark_entry__ as entry

    rows = entry._kg_skipgram_pairs(spark, "/root/testdata/sf0.001").collect()
    cnt = {(r["center"], r["context"], r["dist"]): r["n_pairs"] for r in rows}
    assert cnt
    for (c, x, d), n in cnt.items():
        assert cnt[(x, c, d)] == n
        assert d in (1, 2)


def test_modularity_bounds_and_identity(spark):
    """q_num/q_den is a valid modularity: |Q| <= 1, and the shifted ppm
    is consistent with the raw pair."""
    import __spark_entry__ as entry

    (r,) = entry._kg_modularity_score(spark, "/root/testdata/sf0.001").collect()
    assert abs(r["q_num"]) <= r["q_den"]
    assert r["q_den"] == 4 * r["m"] * r["m"]
    assert r["q_shift_ppm"] == (1000000 * (r["q_num"] + r["q_den"])) // (2 * r["q_den"])
    # communities partition all nodes and a chain+heads LPA finds > 1
    assert r["n_communities"] > 1


def test_rle_runs_bounds(spark):
    import __spark_entry__ as entry

    rows = entry._storage_rle_audit(spark, "/root/testdata/sf0.001").collect()
    assert {r["col_name"] for r in rows} == {"returnflag", "linestatus", "quantity"}
    for r in rows:
        assert r["n_distinct"] <= r["n_runs"] <= r["n"]


def test_edgecut_range_beats_hash(spark):
    """On the chain+skip graph, range partitioning cuts only boundary
    edges while hash cuts nearly (1 - 1/k) of all edges — the measured
    gap that justifies locality-aware layouts."""
    import __spark_entry__ as entry

    rows = {
        r["scheme"]: r
        for r in entry._kg_partition_edgecut(spark, "/root/testdata/sf0.001").collect()
    }
    assert rows["range"]["n_cut"] < rows["hash"]["n_cut"] // 10
    # range cut ~ 3 boundary edges per seam (chain crosses once, skips twice)
    assert rows["range"]["n_cut"] <= 3 * 16
    assert rows["hash"]["cut_ppm"] > 800000  # ~ 1 - 1/16 = 937500


def test_ks_statistic_on_constructed_shift():
    """Integer KS replay: two samples with a clean location shift give
    D == max gap at the boundary."""
    s1 = [1, 2, 3, 4, 5]
    s2 = [6, 7, 8, 9, 10]
    vals = sorted(set(s1) | set(s2))
    n1, n2 = len(s1), len(s2)
    best = 0
    for v in vals:
        c1 = sum(1 for x in s1 if x <= v)
        c2 = sum(1 for x in s2 if x <= v)
        best = max(best, abs(n2 * c1 - n1 * c2))
    assert best == n1 * n2  # fully separated -> D = 1


def test_gini_rank_sum_identity():
    # equal spends -> G = 0; one customer has everything -> G -> (n-1)/n
    def g(xs):
        xs = sorted(xs)
        n, sx = len(xs), sum(xs)
        six = sum((i + 1) * x for i, x in enumerate(xs))
        return (2 * six - (n + 1) * sx, n * sx)

    num, den = g([5, 5, 5, 5])
    assert num == 0
    num, den = g([0, 0, 0, 100])
    assert num * 4 == den * 3  # G = 3/4 = (n-1)/n


def test_gap_bits_compression_on_chain(spark):
    """Chain+skip adjacency compresses hard: gaps are 1 or 2, so ~1-2
    bits/edge vs 64 raw."""
    import __spark_entry__ as entry

    (r,) = entry._kg_adjacency_gap_bits(spark, "/root/testdata/sf0.001").collect()
    assert r["gap_bits"] < r["n_edges"] * 3
    assert r["compressed_ppm"] < 50000  # > 20x compression


def test_autocorr_r2_bounds(spark):
    import __spark_entry__ as entry

    rows = entry._events_periodicity_autocorr(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r["r2_ppm"] <= 1000000
        assert r["r_sign"] in (-1, 0, 1)


def test_view_selection_prefix_property(spark):
    """Selected views form a contiguous rank prefix within budget, and
    the first unselected view would overflow it."""
    import __spark_entry__ as entry

    rows = sorted(
        entry._kg_view_selection_greedy(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["pick_rank"],
    )
    sel = [r["selected"] for r in rows]
    # prefix: once deselected, never selected again
    assert sel == sorted(sel, reverse=True)
    assert sel[0] == 1
    k = sum(sel)
    assert rows[k - 1]["cum_cost"] <= rows[0]["budget"]
    if k < len(rows):
        assert rows[k]["cum_cost"] > rows[0]["budget"]


def test_ranker_agreement_bounds(spark):
    import __spark_entry__ as entry

    rows = {r["k"]: r for r in entry._ir_ranker_agreement(
        spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) <= {5, 10, 20}
    for k, r in rows.items():
        assert 0 <= r["n_overlap"] <= k
        assert r["overlap_ppm"] == (1000000 * r["n_overlap"]) // k


def test_interval_overlap_sweep(spark):
    """Every 3rd interval (length 12 > stride 8) overlaps its successor;
    the sweep counts the successor as overlapping and concurrency peaks
    at exactly 2."""
    import __spark_entry__ as entry

    rows = entry._interval_overlap_audit(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 7
    for r in rows:
        # one in three intervals is long -> its successor overlaps
        assert 0 < r["n_overlapping"] <= r["n_intervals"] // 2
        assert r["max_concurrency"] == 2


def test_streaming_interval_join_cross_batch_state(spark):
    """The pairs whose purchase arrives a micro-batch AFTER its view
    (i % 7 == 0, i % 3 != 0) are present — provable only via carried
    stream-join state — and every out-of-window (70-min) pair is absent."""
    import __spark_entry__ as entry

    rows = entry._streaming_interval_join(spark, "/root/testdata/sf0.001").collect()
    got = {(r["purchase_id"], r["view_id"]) for r in rows}
    # self-pairs: i matched with its own view iff lag 10 (i % 3 != 0)
    self_pairs = {(i, i) for i, _ in ((r["purchase_id"], 0) for r in rows)}
    for i in range(0, 60):
        if i % 3 != 0:
            assert (i, i) in got, i
        else:
            assert (i, i) not in got, i
    cross_batch = [i for i in range(200) if i % 7 == 0 and i % 3 != 0]
    assert any((i, i) in got for i in cross_batch)
    for r in rows:
        assert 0 <= r["lag_min"] <= 60


# --- property-based differential tests for the new kernels ---------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _rand_edges(draw_pairs):
    return sorted({(min(a, b), max(a, b)) for a, b in draw_pairs if a != b})


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)), max_size=60))
def test_jp_coloring_equals_sequential_greedy(pairs):
    """Round-based JP == an INDEPENDENT sequential greedy in increasing
    priority order, and always a proper coloring (the equivalence the SQL
    unroll relies on, fuzzed)."""
    from bert_namedentityrecognition_spark.oracle.graph import (
        jp_coloring,
        mis_priority,
    )

    edges = _rand_edges(pairs)
    if not edges:
        return
    got = jp_coloring(edges, max_rounds=64)
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    seq = {}
    for v in sorted(nbrs, key=mis_priority):
        used = {seq[u] for u in nbrs[v] if u in seq}
        c = 0
        while c in used:
            c += 1
        seq[v] = c
    assert {v: c for v, (c, _r) in got.items()} == seq
    for a, b in edges:
        assert got[a][0] != got[b][0]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)), max_size=60))
def test_line_graph_mis_is_maximal_matching(pairs):
    """MIS of the line graph is always a valid MAXIMAL matching of the
    base graph (the reduction kg_maximal_matching rests on, fuzzed)."""
    from bert_namedentityrecognition_spark.oracle.graph import mis_luby

    edges = _rand_edges(pairs)
    if not edges:
        return
    eid = {e: k for k, e in enumerate(edges)}
    lg = []
    for e in edges:
        for f in edges:
            if e < f and (set(e) & set(f)):
                lg.append((eid[e], eid[f]))
    iso = {eid[e] for e in edges if not any(eid[e] in p for p in lg)}
    mis = set(mis_luby(lg, max_rounds=64)) | iso
    matched = [e for e in edges if eid[e] in mis]
    used = [v for e in matched for v in e]
    assert len(used) == len(set(used))  # matching
    for e in edges:  # maximal
        if eid[e] not in mis:
            assert any(set(e) & set(m) for m in matched), e


def test_streaming_enrichment_totals_and_advancer_excluded(spark):
    """Enriched totals equal the fixture row count (nothing late-dropped)
    and the far-future advancer row never reaches the output."""
    import __spark_entry__ as entry
    from bert_namedentityrecognition_spark.oracle.bert_sql import (  # noqa: F401
        pages_for_events,
    )

    rows = entry._streaming_static_enrichment(
        spark, "/root/testdata/sf0.001"
    ).collect()
    n = entry._warc_pages_for_events(1000)
    assert sum(r["n_events"] for r in rows) == n
    assert all(r["tier"] in (0, 1, 2) for r in rows)


def test_orbit_identities(spark):
    """Orbit identities hold row-by-row: orbit2 == C(deg,2) - t, sum of
    wedge-centers == total wedges - 3*triangles... and every orbit is
    non-negative (the closed-form derivation is only valid if these
    hold on the fixture)."""
    import __spark_entry__ as entry

    rows = entry._kg_orbit_counts(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        d = r["orbit0_deg"]
        assert r["orbit2_wedge_center"] == d * (d - 1) // 2 - r["orbit3_triangle"]
        assert r["orbit1_wedge_end"] >= 0
        assert r["orbit2_wedge_center"] >= 0


def test_join_cardinality_fk_exact_self_underestimated(spark):
    """FK joins: formula exact (q-error == 1.0); self-join on a skewed
    key: Jensen gap makes the estimate low (act >= est)."""
    import __spark_entry__ as entry

    rows = {r["join_name"]: r for r in entry._optimizer_join_cardinality_audit(
        spark, "/root/testdata/sf0.001").collect()}
    for fk in ("lineitem_orders", "lineitem_part", "orders_customer"):
        assert rows[fk]["q_error_ppm"] == 1000000, fk
    s = rows["lineitem_self_partkey"]
    assert s["act"] >= s["est"]


def test_minhash_calibration_bounds(spark):
    import __spark_entry__ as entry

    rows = entry._minhash_estimator_calibration(
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 <= r["est_matches"] <= 16
        assert 0 <= r["true_ppm"] <= 1000000
        assert r["abs_err_ppm"] == abs(r["est_ppm"] - r["true_ppm"])


def test_hnsw_levels_geometric(spark):
    """Level masses follow the 2^-(k+1) ladder and the trailing-zero
    formula is correct."""
    import __spark_entry__ as entry

    rows = sorted(
        entry._ann_hnsw_levels(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["level"],
    )
    n = sum(r["n_nodes"] for r in rows)
    assert rows[0]["level"] == 0
    # level 0 holds roughly half the nodes
    assert abs(rows[0]["n_nodes"] - n // 2) < n // 5
    for h in [1, 2, 3, 4, 8, 12, 1024]:
        tz = (h ^ (h - 1)).bit_length() - 1
        assert h % (1 << tz) == 0 and (h >> tz) % 2 == 1


def test_timezone_rollup_dst_rules(spark):
    """The skipped spring-forward hour is absent and the repeated
    fall-back hour carries roughly double mass."""
    import datetime as dt

    import __spark_entry__ as entry

    rows = entry._timezone_rollup_audit(spark, "/root/testdata/sf0.001").collect()
    mar = {r["local_hour"]: r["n"] for r in rows
           if r["local_date"] == dt.date(2024, 3, 10)}
    nov = {r["local_hour"]: r["n"] for r in rows
           if r["local_date"] == dt.date(2024, 11, 3)}
    assert 2 not in mar          # 02:xx never exists on Mar 10
    assert 1 in mar and 3 in mar
    # fall-back: 01:xx occurs twice (EDT and EST readings)
    assert nov[1] > 1.5 * nov[2]


def test_motif_enrichment_strongly_positive(spark):
    """The chain+skip graph is locally clustered: triangle enrichment vs
    the configuration model is orders of magnitude above 1x."""
    import __spark_entry__ as entry

    (r,) = entry._kg_motif_significance(spark, "/root/testdata/sf0.001").collect()
    assert r["t_actual"] > 0
    assert r["enrichment_ppm"] > 10 * 1000000  # > 10x the null model


def test_savings_report_invariants(spark):
    import __spark_entry__ as entry

    rows = entry._dedup_savings_report(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["cluster_size"] >= 2
        assert r["n_dropped"] == r["cluster_size"] - 1
        assert r["chars_dropped"] >= 0
        assert r["policy_disagrees"] in (0, 1)


def test_triad_balance_partition(spark):
    """Signed census partitions all triangles; balanced == even negatives."""
    import __spark_entry__ as entry

    rows = entry._kg_triad_balance(spark, "/root/testdata/sf0.001").collect()
    assert {r["n_neg"] for r in rows} <= {0, 1, 2, 3}
    for r in rows:
        assert r["balanced"] == (1 if r["n_neg"] % 2 == 0 else 0)
    assert sum(r["n_triangles"] for r in rows) > 0


def test_hazard_table_conservation(spark):
    """At-risk counts telescope: at_risk(t) - deaths(t) == at_risk(next t)."""
    import __spark_entry__ as entry

    rows = sorted(
        entry._events_hazard_table(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["day"],
    )
    for prev, cur in zip(rows, rows[1:]):
        assert prev["at_risk"] - prev["deaths"] >= cur["at_risk"] - cur["deaths"]
    assert rows[0]["at_risk"] == sum(r["deaths"] for r in rows)


def test_widest_path_semiring_invariants(spark):
    """Seeds carry the source cap; every other reached node's capacity is
    a real edge weight (1..98) bounded by the max incident weight."""
    import __spark_entry__ as entry

    rows = entry._kg_widest_path(spark, "/root/testdata/sf0.001").collect()
    caps = {r["node"]: r["cap"] for r in rows}
    assert caps[0] == 1_000_000_000  # seed
    non_seed = [c for n, c in caps.items() if n % 251 != 0]
    assert non_seed and all(1 <= c <= 98 for c in non_seed)


def test_boilerplate_mass_vs_vocab(spark):
    import __spark_entry__ as entry

    rows = entry._corpus_boilerplate_ratio(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_boilerplate"] <= r["n_shingles"]
        assert r["strip_flag"] == (1 if 20 * r["n_boilerplate"] > r["n_shingles"] else 0)
    # calibrated thresholds: detection AND the strip flag both fire
    assert any(r["n_boilerplate"] > 0 for r in rows)
    assert any(r["strip_flag"] == 1 for r in rows)


def test_bootstrap_replicates_spread_around_mean(spark):
    import __spark_entry__ as entry
    import duckdb as _dd

    rows = entry._orders_bootstrap_spread(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 16
    (true_mean,) = _dd.sql(
        "SELECT CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,4))*100 AS BIGINT)) // count(*) AS BIGINT)"
        " FROM '/root/testdata/sf0.001/orders.parquet'"
    ).fetchone()
    means = [r["wmean_cents"] for r in rows]
    assert len(set(means)) > 1  # replicates genuinely differ
    # every replicate mean within 10% of the point estimate
    for m in means:
        assert abs(m - true_mean) < true_mean // 10


def test_sssp_certificate_pending_and_converged(spark):
    """Bounded budget leaves pending relaxations on the sparse-seed
    fixture; a CONVERGED graph (diameter < rounds) certifies clean."""
    from pyspark.sql import functions as SF

    import __spark_entry__ as entry
    from bert_namedentityrecognition_spark.operators.graph import (
        sssp_bellman_ford,
    )

    (r,) = entry._kg_sssp_certificate(spark, "/root/testdata/sf0.001").collect()
    assert r["pending_relaxations"] > 0  # budget < seed spacing, by design
    assert r["tight_edges"] > 0 and r["edges_checked"] > 0

    e = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 3), (0, 2, 10), (2, 3, 1)],
        "src long, dst long, weight long",
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    d = sssp_bellman_ford(e, seeds, rounds=6)
    du = d.select(SF.col("node").alias("src"), SF.col("dist").alias("d_u"))
    dv = d.select(SF.col("node").alias("dst"), SF.col("dist").alias("d_v"))
    j = e.join(du, "src").join(dv, "dst")
    assert (
        j.filter(SF.col("d_v") > SF.col("d_u") + SF.col("weight")).count() == 0
    )


def test_pagerank_topk_stability_bounds(spark):
    import __spark_entry__ as entry

    rows = {r["k"]: r for r in entry._kg_pagerank_topk_stability(
        spark, "/root/testdata/sf0.001").collect()}
    for k, r in rows.items():
        assert 0 <= r["n_overlap"] <= k
    # head stability: the top-5 at 3 iters largely survives to 6 iters
    assert rows[5]["n_overlap"] >= 3


def test_did_cells_complete_and_bounded(spark):
    import __spark_entry__ as entry

    (r,) = entry._events_did_estimator(spark, "/root/testdata/sf0.001").collect()
    for c in ("n_00", "n_01", "n_10", "n_11"):
        assert r[c] > 0  # every treatment x period cell populated
    assert r["did_sign"] in (-1, 0, 1)
    # DiD magnitude bounded by the largest cell mean (sanity)
    max_mean = max(r[f"s_{t}{p}"] // r[f"n_{t}{p}"] for t in (0, 1) for p in (0, 1))
    assert r["abs_did_micro_cents"] <= 2 * 1000000 * max_mean


def test_recency_degree_bounds(spark):
    import __spark_entry__ as entry

    rows = entry._kg_recency_weighted_degree(
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        # each edge contributes between 1 (age 8) and 256 (age 0)
        assert r["degree"] <= r["decayed_x256"] <= 256 * r["degree"]
        assert 0 <= r["freshest_age"] <= 8


def test_markov_stationary_mass_conserved(spark):
    """Total stationary mass stays within floor-truncation loss of the
    scale (<= steps * states units), and every state keeps mass."""
    import __spark_entry__ as entry

    rows = entry._events_markov_stationary(spark, "/root/testdata/sf0.001").collect()
    total = sum(r["stationary_x1e9"] for r in rows)
    assert 1_000_000_000 - 8 * 5 * 5 <= total <= 1_000_000_000
    assert all(r["stationary_x1e9"] > 0 for r in rows)
