"""conll_roundtrip — §2.2 IOB sink + §2.1 CoNLL scan under the driver gate
(write_conll → read_conll vs the ground-truth SQL twin)."""

import glob
import os

import duckdb


def test_conll_gate_matches_oracle(spark):
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    df = entrymod.queries()["conll_roundtrip"](spark, sf)
    spark_rows = {tuple(r) for r in df.collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    duck_rows = set(
        map(tuple, con.sql(entrymod.oracle_sql()["conll_roundtrip"]).fetchall())
    )
    assert spark_rows == duck_rows
    assert len(spark_rows) == 60  # every unique sentence survived framing
    assert df.columns == ["tokens_str", "tags_str", "n_tokens", "n_entities"]


def test_conll_sink_really_writes_multiple_parts(spark):
    """The repartition(4) in the gate query must actually produce >1 text
    part (the multi-file framing is the distributed claim) and the scan
    must reassemble exactly n sentences across them."""
    import __spark_entry__ as entrymod
    from bert_namedentityrecognition_spark.sources.readers import read_conll

    entrymod.queries()["conll_roundtrip"](spark, "/root/testdata/sf0.001").count()
    d = os.path.join(entrymod._writable_base(), "var", "conll_fixture_60")
    parts = [
        p
        for p in glob.glob(os.path.join(d, "part-*"))
        if not p.endswith(".crc")
    ]
    assert len(parts) > 1
    assert read_conll(spark, d).count() == 60
