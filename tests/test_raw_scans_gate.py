"""raw_corpus_scans + cv_fold_stats — the remaining §2.1 file-format scans
and §2.11 CV averaging under the driver gate."""

import duckdb


def _duck_rows(entrymod, sf, q):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    return set(map(tuple, con.sql(entrymod.oracle_sql()[q]).fetchall()))


def test_raw_scans_gate_matches_oracle(spark):
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    df = entrymod.queries()["raw_corpus_scans"](spark, sf)
    rows = [tuple(r) for r in df.collect()]
    assert sorted(rows) == sorted(_duck_rows(entrymod, sf, "raw_corpus_scans"))
    # 60 docs × 4 formats, decoys dropped — a scan that keeps its decoy
    # (empty CSV text, missing JSONL field) would land extra rows here
    assert len(rows) == 240
    by_fmt = {}
    for fmt, _md5, _n in rows:
        by_fmt[fmt] = by_fmt.get(fmt, 0) + 1
    assert by_fmt == {"csv": 60, "jsonl": 60, "tsv": 60, "yakureki": 60}


def test_cv_fold_stats_gate_matches_oracle(spark):
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    df = entrymod.queries()["cv_fold_stats"](spark, sf)
    assert {tuple(r) for r in df.collect()} == _duck_rows(
        entrymod, sf, "cv_fold_stats"
    )
    assert df.columns == [
        "model",
        "precision_mean", "precision_std",
        "recall_mean", "recall_std",
        "f1_mean", "f1_std",
    ]
