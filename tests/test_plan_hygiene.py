"""Plan hygiene the 100 TB design depends on, asserted from the physical
plan text: partition pruning on a date-partitioned pages table, predicate
pushdown to the parquet scan, and column pruning (ReadSchema carries only
what the query touches)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _scan_line(df) -> str:
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "FileScan parquet" in line:
            return line
    raise AssertionError(f"no parquet FileScan in plan:\n{plan}")


def test_date_partitioned_pages_prune_and_push(spark, tmp_path):
    """SURVEY §7's `days(warc_ts)` partitioning: a date filter becomes a
    PartitionFilter (directories never listed), the lang filter is pushed
    into the scan, and only the projected columns are read."""
    from bert_namedentityrecognition_spark.sources import fixtures

    pages = fixtures.pages_to_spark(spark, fixtures.generate_pages(300, seed=42))
    base = str(tmp_path / "pages")
    pages.withColumn("dt", F.to_date("warc_ts")).write.partitionBy("dt").parquet(base)

    q = (
        spark.read.parquet(base)
        .filter(F.col("dt") == "2024-01-02")
        .filter(F.col("lang") == "ja")
        .select("url", "text")
    )
    scan = _scan_line(q)
    assert "PartitionFilters" in scan and "dt" in scan.split("PartitionFilters")[1].split("]")[0]
    pushed = scan.split("PushedFilters: [")[1].split("]")[0]
    assert "EqualTo(lang,ja)" in pushed or "EqualTo(lang, ja)" in pushed, pushed
    read_schema = scan.split("ReadSchema:")[1]
    # html (the big binary column) must NOT be read for this projection
    assert "html" not in read_schema, read_schema


def test_headline_scan_pushdown(spark):
    """q6-style scan: filters reach the parquet reader, ReadSchema is the
    3-column projection, not the full lineitem row."""
    l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = (
        l.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .select("l_extendedprice", "l_discount")
    )
    scan = _scan_line(q)
    pushed = scan.split("PushedFilters: [")[1].split("]")[0]
    assert "l_shipdate" in pushed and "l_quantity" in pushed, pushed
    read_schema = scan.split("ReadSchema:")[1]
    for col in ("l_orderkey", "l_comment", "l_partkey"):
        assert col not in read_schema, read_schema
