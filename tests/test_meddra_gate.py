"""meddra_two_hop_normalize — §2.1 SQLite scan + §2.8 LLT→PT two-hop join
under the driver gate (sqlite_query_df → two_hop_dim → broadcast equi-join
vs the arithmetic-replay SQL twin)."""

import duckdb


def test_meddra_gate_matches_oracle(spark):
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    df = entrymod.queries()["meddra_two_hop_normalize"](spark, sf)
    spark_rows = {tuple(r) for r in df.collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    duck_rows = set(
        map(
            tuple,
            con.sql(
                entrymod.oracle_sql()["meddra_two_hop_normalize"]
            ).fetchall(),
        )
    )
    assert spark_rows == duck_rows
    assert df.columns == ["surface", "entity_id", "canonical", "code", "n"]
    # 60 LLT rows, 5 surface collisions (i%11==5, i>0) → 55 dim surfaces
    assert len(spark_rows) == 55


def test_two_hop_collision_pick_is_value_deterministic(spark):
    """Two LLTs sharing a surface must resolve to the min
    (canonical, entity_id, code) row regardless of input row order —
    the dropDuplicates row-order pick this round replaced."""
    from bert_namedentityrecognition_spark.sources.dims import two_hop_dim

    llt_rows = [(2, "頭が痛い", 200), (1, "頭が痛い", 100)]
    pt_rows = [(100, "頭痛"), (200, "めまい")]
    for order in (llt_rows, llt_rows[::-1]):
        llt = spark.createDataFrame(
            order, "llt_code long, surface string, pt_code long"
        )
        pt = spark.createDataFrame(pt_rows, "pt_code long, pt_name string")
        (row,) = two_hop_dim(llt, pt).collect()
        # 'めまい' < '頭痛' in UTF-8 binary order → canonical-min row wins
        assert (row.entity_id, row.canonical, row.code) == ("2", "めまい", "200")


def test_meddra_fixture_exercises_fallback_and_collision(spark):
    """The dangling-PT fallback (canonical == surface, i%7==3) and the
    collision dedup must both be live in the gate output."""
    import __spark_entry__ as entrymod

    out = entrymod.queries()["meddra_two_hop_normalize"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_surface = {r.surface: r for r in out}
    r3 = by_surface["症状0003の痛み"]
    assert r3.canonical == "症状0003の痛み" and r3.code == "99990003"
    # collided surface 症状0004の痛み: rows i=4 (pt 90052) and i=5 (pt 90065)
    # → min canonical 標準症状052 wins; both i=4 and i=5 mentions count here
    r4 = by_surface["症状0004の痛み"]
    assert r4.entity_id == "80000004" and r4.code == "90052"
