"""warc_ingest_mentions — the §2.1 raw-source scan under the driver gate
(read_warc → prepare_pages → extract_mentions vs the ground-truth SQL twin).
"""

import glob
import os

import duckdb


def test_warc_gate_matches_oracle(spark):
    """The driver-gate comparison at sf0.001 (60 fixture pages): rows,
    columns, values."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    df = entrymod.queries()["warc_ingest_mentions"](spark, sf)
    spark_rows = {tuple(r) for r in df.collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    duck_rows = set(
        map(tuple, con.sql(entrymod.oracle_sql()["warc_ingest_mentions"]).fetchall())
    )
    assert spark_rows == duck_rows
    assert len(spark_rows) > 100
    assert df.columns == ["url", "warc_ts", "text_md5", "term", "kind", "n"]


def test_warc_fixture_covers_both_containers_and_decoys(spark):
    """The fixture must actually exercise what the docstring claims: plain
    AND gzip segments on disk, English decoy pages excluded by the lang
    filter, and every cjk page's md5 present in the output."""
    import __spark_entry__ as entrymod
    from bert_namedentityrecognition_spark.sources import fixtures

    sf = "/root/testdata/sf0.001"
    df = entrymod.queries()["warc_ingest_mentions"](spark, sf)
    out = df.collect()
    d = os.path.join(entrymod._writable_base(), "var", "warc_fixture_60")
    segs = sorted(os.path.basename(p) for p in glob.glob(os.path.join(d, "seg*")))
    assert any(s.endswith(".warc") for s in segs)
    assert any(s.endswith(".warc.gz") for s in segs)
    rows = fixtures.generate_warc_corpus(60)
    en_urls = {r["url"] for r in rows if r["lang"] == "en"}
    cjk_urls = {r["url"] for r in rows if r["lang"] == "cjk"}
    got_urls = {r.url for r in out}
    assert en_urls and not (got_urls & en_urls)  # decoys dropped
    assert got_urls == cjk_urls  # every cjk page compared (>=1 term each)
    # ts parse: minute arithmetic from the WARC-Date header round-trips
    by_url = {r.url: r for r in out}
    r7 = rows[7]
    assert by_url[r7["url"]].warc_ts == r7["ts"]
