"""oici_excel_normalize — §2.1 Excel scan under the driver gate
(stdlib zip+XML xlsx parse → dim → broadcast exact-lookup vs the SQL twin)."""

import duckdb


def test_oici_excel_gate_matches_oracle(spark):
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    df = entrymod.queries()["oici_excel_normalize"](spark, sf)
    spark_rows = {tuple(r) for r in df.collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    duck_rows = set(
        map(
            tuple,
            con.sql(entrymod.oracle_sql()["oici_excel_normalize"]).fetchall(),
        )
    )
    assert spark_rows == duck_rows
    assert len(spark_rows) == 60
    assert df.columns == ["surface", "entity_id", "canonical", "n"]
    # missing-cell cadence survives the scan: i%5==2 rows carry NULL canonical
    nulls = {r for r in spark_rows if r[2] is None}
    assert len(nulls) == 12


def test_oici_fixture_exercises_both_cell_encodings():
    """The written sheet must contain BOTH sharedStrings ('t=\"s\"') and
    inline-string cells, or the gate stops covering one encoding."""
    import os
    import zipfile

    import __spark_entry__ as entrymod

    p = os.path.join(entrymod._writable_base(), "var", "oici_fixture_60.xlsx")
    if not os.path.exists(p):
        from bert_namedentityrecognition_spark.sources import fixtures

        fixtures.write_oici_xlsx(p, 60)
    with zipfile.ZipFile(p) as zf:
        sheet = zf.read("xl/worksheets/sheet1.xml").decode()
    assert 't="s"' in sheet and 't="inlineStr"' in sheet
