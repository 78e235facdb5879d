"""Session-7 TPC-H analogue spine (q8/q10/q11/q15/q16/q19/q20/q21):
invariants that pin each query's SEMANTICS beyond the hash gate — share
bounds, winner uniqueness, exclusion honesty, dominance arithmetic —
recomputed independently (DuckDB or plain Python) at gate parameters.

Reference shapes: TPC-H spec queries 8/10/11/15/16/19/20/21, re-grounded
on the corpus columns (no partsupp, no commit/receipt dates — the
docstrings in __spark_entry__ note each substitution).
"""

import duckdb
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "supplier", "part",
              "nation", "region"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


def test_q8_share_bounded_and_consistent(spark):
    rows = E.queries()["q8_market_share"](spark, SF).collect()
    assert rows, "q8 must be live"
    for r in rows:
        assert 0 <= r["share_ppm"] <= 1_000_000
        assert 0 <= r["nation_rev_cents"] <= r["total_rev_cents"]
    assert {r["o_year"] for r in rows} == {1996, 1997}


def test_q10_revenue_matches_independent_recompute(spark):
    got = {
        r["c_custkey"]: r["revenue_cents"]
        for r in E.queries()["q10_returned_items"](spark, SF).collect()
    }
    assert got, "q10 must be live"
    want = dict(
        _duck().execute(
            """
            SELECT o_custkey,
                   CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l_discount AS DECIMAL(18,4)))
                        AS DECIMAL(30,8)) * 1000000 AS BIGINT)) AS BIGINT)
                     // 10000
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-04-01'
              AND o_orderdate < TIMESTAMP '1996-07-01'
            GROUP BY 1
            """
        ).fetchall()
    )
    assert got == want


def test_q11_every_kept_part_clears_the_threshold(spark):
    rows = E.queries()["q11_important_parts"](spark, SF).collect()
    assert rows, "q11 must be live (ASIA-region supplier scope)"
    total_u, = _duck().execute(
        """
        SELECT CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
             AS DECIMAL(30,4)) * 10000 AS BIGINT)) AS BIGINT)
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                      JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        """
    ).fetchone()
    for r in rows:
        # value_cents = value_u // 100, so the weakest implied bound is
        # 10000 * (100 * value_cents) > total_u - slack of one cent unit
        assert 10000 * (100 * (r["value_cents"] + 1)) > total_u


def test_q15_winners_all_share_the_max(spark):
    rows = E.queries()["q15_top_supplier"](spark, SF).collect()
    assert rows, "q15 must be live"
    cents = {r["total_rev_cents"] for r in rows}
    assert len(cents) == 1  # every returned supplier ties the max


def test_q16_complaint_suppliers_never_counted(spark):
    rows = E.queries()["q16_part_supplier_counts"](spark, SF).collect()
    assert rows, "q16 must be live"
    # recompute the bucket counts with the NOT-IN inline
    want = {
        (b, t, s): c
        for b, t, s, c in _duck().execute(
            """
            WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
            SELECT p_brand, p_type, CAST(p_size AS BIGINT),
                   CAST(count(DISTINCT l_suppkey) AS BIGINT)
            FROM pairs JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
              AND p_size IN (1,5,10,15,20,25,30,35)
              AND l_suppkey % 4 <> 1
            GROUP BY 1, 2, 3
            """
        ).fetchall()
    }
    got = {
        (r["p_brand"], r["p_type"], r["p_size"]): r["supplier_cnt"]
        for r in rows
    }
    assert got == want


def test_q19_disjunct_branches_counted_once(spark):
    row = E.queries()["q19_discounted_revenue"](spark, SF).collect()[0]
    n, = _duck().execute(
        """
        SELECT count(*) FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand='Brand#3' AND p_size BETWEEN 1 AND 5
                 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand='Brand#13' AND p_size BETWEEN 1 AND 10
                 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand='Brand#23' AND p_size BETWEEN 1 AND 15
                 AND l_quantity BETWEEN 20 AND 30)
        """
    ).fetchone()
    assert row["n_items"] == n and n > 0
    assert row["revenue_cents"] > 0


def test_q20_dominance_is_share_relative(spark):
    rows = E.queries()["q20_volume_suppliers"](spark, SF).collect()
    assert rows, "q20 must be live at sf0.001"
    # each dominated part admits at most floor((n_supp-1)/2) dominators;
    # verify the count total against an inline recompute
    n_dom, = _duck().execute(
        """
        WITH ps AS (
          SELECT l_partkey, l_suppkey,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_type = 'PROMO' GROUP BY 1, 2
        ),
        pt AS (SELECT l_partkey, sum(q) tq, count(*) ns FROM ps GROUP BY 1)
        SELECT count(*) FROM ps JOIN pt USING (l_partkey)
        WHERE q * ns > 2 * tq
        """
    ).fetchone()
    assert sum(r["n_parts_dominated"] for r in rows) == n_dom


def test_q21_exactly_one_winner_per_waiting_order(spark):
    rows = E.queries()["q21_waiting_orders"](spark, SF).collect()
    assert rows, "q21 must be live"
    n_orders, = _duck().execute(
        """
        WITH ps AS (
          SELECT l_orderkey, l_suppkey, max(l_shipdate) ms
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F' GROUP BY 1, 2
        ),
        po AS (
          SELECT l_orderkey, max(ms) om, count(*) ns FROM ps GROUP BY 1
        )
        SELECT count(*) FROM po
        WHERE ns >= 2 AND 1 = (SELECT count(*) FROM ps
                               WHERE ps.l_orderkey = po.l_orderkey
                                 AND ps.ms = po.om)
        """
    ).fetchone()
    # each qualifying order contributes exactly one waiting supplier
    assert sum(r["numwait"] for r in rows) == n_orders and n_orders > 0
