"""URL canonicalization: handcrafted expectations + Spark<->DuckDB parity
on a messy fuzz set (the SQL twin is generated from the same pattern
constants — this test is what makes that claim checkable)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from bert_namedentityrecognition_spark.functions.urltools import (
    canonical_url_sql,
    url_host_stats,
    with_canonical_url,
)

SCHEMA = StructType([StructField("url", StringType())])

CASES = {
    # scheme+host lowering, www strip, default port, trailing slash
    "HTTPS://WWW.Example.COM:443/Path/": "https://example.com/Path",
    "http://user:pw@Example.com:80/a": "http://example.com/a",
    # non-default port kept; path case kept
    "https://Example.com:8443/A/B": "https://example.com:8443/A/B",
    # fragment dropped; tracking params dropped; order of real params kept
    "https://e.com/p?utm_source=f&id=3&utm_campaign=x#frag": "https://e.com/p?id=3",
    "https://e.com/p?fbclid=abc": "https://e.com/p",
    "https://e.com/p?id=3&gclid=z&b=2": "https://e.com/p?id=3&b=2",
    # root path -> empty; trailing dot host
    "https://example.com./": "https://example.com",
    # utm-only query with trailing slash before it
    "http://a.b.c.com/x/?utm_medium=m": "http://a.b.c.com/x",
}


def test_canonical_handcrafted(spark):
    df = spark.createDataFrame([(u,) for u in CASES], SCHEMA)
    got = {
        r["url"]: r["canonical_url"]
        for r in with_canonical_url(df).collect()
    }
    assert got == CASES


def test_host_and_domain(spark):
    df = spark.createDataFrame(
        [("HTTPS://WWW.News.Example.CO:443/x",)], SCHEMA
    )
    r = with_canonical_url(df).collect()[0]
    assert r["host"] == "news.example.co"
    assert r["registered_domain"] == "example.co"


def test_parity_with_duckdb_twin(spark):
    urls = list(CASES) + [
        "https://e.com/?utm_a=1&utm_b=2",  # adjacent tracking params
        "https://e.com/p?a=1&ref=home&b=2&utm_x=9",
        "http://E.com",  # no path at all
        "https://x.y/:80",  # port-lookalike in path
        "https://e.com/p?id=%20%2F&utm_source=a b",
        "ftp://Mixed.Case.Org:21/file",
    ]
    df = spark.createDataFrame([(u,) for u in urls], SCHEMA)
    spark_rows = {
        r["url"]: (r["canonical_url"], r["host"], r["registered_domain"])
        for r in with_canonical_url(df).collect()
    }
    exprs = canonical_url_sql("url")
    con = duckdb.connect()
    con.register("u", pd.DataFrame({"url": urls}))
    duck_rows = {
        u: (c, h, d)
        for u, c, h, d in con.execute(
            f"SELECT url, {exprs['canonical_url']}, {exprs['host']}, "
            f"{exprs['registered_domain']} FROM u"
        ).fetchall()
    }
    assert spark_rows == duck_rows


def test_url_host_stats_dup_counting(spark):
    # three spellings of ONE canonical url + one distinct -> 4 docs,
    # 2 canonical, 2 dups on that host
    urls = [
        "https://www.E.com/a/",
        "HTTPS://e.com:443/a",
        "https://e.com/a?utm_source=x",
        "https://e.com/b",
        "https://other.org/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], SCHEMA)
    got = {
        r["host"]: (r["n_docs"], r["n_canonical"], r["n_url_dups"])
        for r in url_host_stats(df).collect()
    }
    assert got == {"e.com": (4, 2, 2), "other.org": (1, 1, 0)}
