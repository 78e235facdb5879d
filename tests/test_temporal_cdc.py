"""CDC snapshot diff, cohort retention, and the compaction planner —
semantics on handcrafted fixtures plus a brute-force cross-check of the
distributed prefix sum against a single-partition cumsum, and the
three-change-type liveness guarantee the kg_snapshot_diff gate fixture
promises at the smallest scale factor."""

import duckdb
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from bert_namedentityrecognition_spark.operators.layout import (
    compaction_binpack,
    distributed_prefix_sum,
)
from bert_namedentityrecognition_spark.operators.temporal import (
    retention_cohorts,
    scd2_history,
    snapshot_diff,
)

UPD = StructType(
    [
        StructField("k", LongType()),
        StructField("ts", LongType()),
        StructField("seq", LongType()),
        StructField("status", StringType()),
    ]
)


def _diff(spark, updates, t1, t2, tomb="dead"):
    df = spark.createDataFrame(updates, UPD)
    scd = scd2_history(df, ["k"], "ts", ["status"], ["seq"])
    out = snapshot_diff(
        scd, ["k"], ["status"], t1, t2, tombstone=F.col("status") == tomb
    )
    return {
        r["k"]: (r["change_type"], r["old_status"], r["new_status"])
        for r in out.collect()
    }


def test_snapshot_diff_classification(spark):
    updates = [
        # k=1: live at t1 with 'a', updated to 'b' before t2 → update
        (1, 10, 0, "a"), (1, 50, 1, "b"),
        # k=2: live at t1, tombstoned before t2 → delete
        (2, 10, 0, "a"), (2, 50, 1, "dead"),
        # k=3: first version after t1 → insert
        (3, 50, 0, "c"),
        # k=4: unchanged across both → absent
        (4, 10, 0, "a"),
        # k=5: tombstoned at t1, revived by t2 → insert (re-activation)
        (5, 5, 0, "dead"), (5, 50, 1, "e"),
        # k=6: tombstoned at BOTH → absent
        (6, 5, 0, "dead"),
        # k=7: no-op update (same value) → absent (SCD2 suppresses it)
        (7, 10, 0, "a"), (7, 50, 1, "a"),
    ]
    got = _diff(spark, updates, t1=20, t2=80)
    assert got == {
        1: ("update", "a", "b"),
        2: ("delete", "a", None),
        3: ("insert", None, "c"),
        5: ("insert", None, "e"),
    }


def test_snapshot_diff_boundary_inclusive_from(spark):
    # valid_from == t is IN the snapshot (<=); valid_to == t is OUT (>)
    updates = [(1, 20, 0, "a"), (1, 80, 1, "b")]
    got = _diff(spark, updates, t1=20, t2=80)
    assert got == {1: ("update", "a", "b")}


def test_retention_cohorts_hand_fixture(spark):
    # days; period 7.  u1 first day 0 (cohort 0), active days 0, 8 (off 1),
    # 15 (off 2).  u2 cohort 0, day 1 only.  u3 cohort 1 (day 7), day 16
    # (off 1).
    rows = [(1, 0), (1, 8), (1, 15), (2, 1), (3, 7), (3, 16)]
    df = spark.createDataFrame(rows, "u LONG, day LONG")
    got = {
        (r["cohort_period"], r["period_offset"]): (
            r["n_active"], r["cohort_size"], r["retention_ppm"]
        )
        for r in retention_cohorts(df, ["u"], "day").collect()
    }
    assert got == {
        (0, 0): (2, 2, 1000000),
        (0, 1): (1, 2, 500000),
        (0, 2): (1, 2, 500000),
        (1, 0): (1, 1, 1000000),
        (1, 1): (1, 1, 1000000),
    }


def test_retention_offset0_is_full_cohort(spark, sf_dir):
    import __spark_entry__ as E

    out = E.queries()["events_retention_cohorts"](spark, sf_dir).collect()
    for r in out:
        if r["period_offset"] == 0:
            assert r["retention_ppm"] == 1000000
            assert r["n_active"] == r["cohort_size"]


def test_distributed_prefix_sum_matches_sequential(spark):
    import random

    random.seed(7)
    rows = [(i, random.randrange(1000)) for i in range(500)]
    df = spark.createDataFrame(rows, "fid LONG, sz LONG").repartition(16)
    got = {
        r["fid"]: r["cum"]
        for r in distributed_prefix_sum(
            df, ["sz", "fid"], "sz", out="cum", ascending=[False, True]
        ).collect()
    }
    run = 0
    for fid, sz in sorted(rows, key=lambda t: (-t[1], t[0])):
        run += sz
        assert got[fid] == run
    assert len(got) == 500


def test_compaction_binpack_hand_fixture(spark):
    # sizes desc: 90, 60, 50, 30, 20; target 100.
    # exclusive prefix: 0, 90, 150, 200, 230 → bins 0, 0, 1, 2, 2
    rows = [(1, 90), (2, 60), (3, 50), (4, 30), (5, 20)]
    df = spark.createDataFrame(rows, "fid LONG, sz LONG")
    got = {
        r["bin_id"]: (r["n_files"], r["total_bytes"], r["min_bytes"],
                      r["max_bytes"])
        for r in compaction_binpack(df, "fid", "sz", 100).collect()
    }
    assert got == {
        0: (2, 150, 60, 90),
        1: (1, 50, 50, 50),
        2: (2, 50, 20, 30),
    }


def test_compaction_every_file_in_exactly_one_bin(spark, sf_dir):
    import __spark_entry__ as E

    spark_df = E.queries()["compaction_binpack"](spark, sf_dir)
    agg = spark_df.agg(
        F.sum("n_files").alias("nf"), F.sum("total_bytes").alias("tb")
    ).collect()[0]
    con = duckdb.connect()
    n, total = con.execute(
        f"SELECT count(*), CAST(sum(n_chars) AS BIGINT) "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()
    assert (agg["nf"], agg["tb"]) == (n, total)


def test_snapshot_diff_three_branches_live_smallest_sf(spark, sf_dir):
    import __spark_entry__ as E

    out = E.queries()["kg_snapshot_diff"](spark, sf_dir).collect()
    kinds = {r["change_type"] for r in out}
    assert kinds == {"insert", "update", "delete"}
