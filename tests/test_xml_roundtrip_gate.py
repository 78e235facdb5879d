"""xml_articles_roundtrip — §2.2 sink + §2.1 scan under the driver gate
(write_articles_xml → read_articles_xml vs the ground-truth SQL twin).
"""

import glob
import os

import duckdb


def test_xml_roundtrip_gate_matches_oracle(spark):
    """The driver-gate comparison at sf0.001 (60 fixture articles): rows,
    columns, values."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    df = entrymod.queries()["xml_articles_roundtrip"](spark, sf)
    spark_rows = {tuple(r) for r in df.collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    duck_rows = set(
        map(
            tuple,
            con.sql(entrymod.oracle_sql()["xml_articles_roundtrip"]).fetchall(),
        )
    )
    assert spark_rows == duck_rows
    assert len(spark_rows) > 100
    assert df.columns == [
        "article_id", "src", "year", "text_md5", "term", "kind", "n",
    ]


def test_xml_roundtrip_exercises_the_edge_semantics(spark):
    """The fixture must actually exercise what the docstring claims:
    multiple XML part files on disk, escaped attr values restored, inline
    markup passed through raw, the truncation-quirk article truncated,
    and every article's md5 compared."""
    import __spark_entry__ as entrymod
    from bert_namedentityrecognition_spark.sources import fixtures
    from bert_namedentityrecognition_spark.sources.readers import read_articles_xml

    sf = "/root/testdata/sf0.001"
    entrymod.queries()["xml_articles_roundtrip"](spark, sf).count()
    d = os.path.join(entrymod._writable_base(), "var", "articles_fixture_60")
    parts = glob.glob(os.path.join(d, "part-*"))
    assert len(parts) > 1  # the sink really wrote multiple XML files

    rows = fixtures.generate_articles_corpus(60)
    arts = {r["article_id"]: r for r in read_articles_xml(spark, d).collect()}
    assert set(arts) == {r["article_id"] for r in rows}
    # attr escaping round-trip: src carries " & < on the i%4==1 cadence
    assert arts["a00001"]["headers"]["src"] == 'journal "1" & <eds>'
    # raw-body markup passthrough + truncation quirk (i == 17)
    quirk = rows[17]
    assert "</article>" in quirk["text_in"]
    assert arts["a00017"]["text"] == quirk["text_out"]
    assert not arts["a00017"]["text"].endswith("切断された残り。")
    markup = [r for r in rows if "<adr>" in r["text_out"]]
    assert markup and all(
        "<adr>" in arts[r["article_id"]]["text"] for r in markup
    )
