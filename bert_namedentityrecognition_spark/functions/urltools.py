"""URL canonicalization for web-crawl corpora — pure JVM expressions.

CCNet / RefinedWeb-style pipelines dedup and weight documents by
canonical URL and registered domain before any content pass; the
canonicalizer therefore has to run on every crawled record, which means
it must stay inside whole-stage codegen (no Python). This module builds
the whole transform from ``regexp_extract`` / ``regexp_replace`` /
``lower`` chains.

Canonical form: ``lower(scheme)://host[path][?query]`` where
- host is lowercased, userinfo and a leading ``www.`` are stripped, the
  scheme's default port (``:80`` http / ``:443`` https) is dropped, and a
  trailing dot removed;
- the fragment is dropped;
- tracking parameters (``utm_*``, ``fbclid``, ``gclid``, ``ref``) are
  removed from the query (other params keep their original order — no
  re-sorting, so two URLs only collapse when a crawler could actually
  fetch them identically);
- trailing slashes on the path are dropped (root path becomes empty).

Inputs without an ASCII scheme (or NULL) degrade deterministically
(scheme-less output, never an error) — a crawl canonicalizer must not
fail the whole stage on one malformed record.

Every regex is **lookaround- and backreference-free** so the identical
pattern string runs in Java regex (Spark) and RE2 (DuckDB) — the same
portability rule as ``textstats.redact_pii`` (CLAUDE.md rule: pii_scrub
precedent). The DuckDB twin is *generated from the same constants* by
``canonical_url_sql`` so the two engines cannot drift.

100 TB notes: zero UDFs, zero shuffles — composes with any scan; the
host/domain keys it produces are the partition keys of the per-domain
stages downstream (mixture weighting, host-level dedup).

Reference parity: beyond-reference (the reference's corpora carry no
URLs); part of the web-crawl curation family the build brief requests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one alternation, used by every tracking-param rule
TRACKING_PARAMS = "(utm_[a-z0-9_]+|fbclid|gclid|ref)"

SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
AFTER_SCHEME_RE = "^[A-Za-z][A-Za-z0-9+.-]*://"
AUTHORITY_RE = "^([^/?#]*)"
USERINFO_RE = "^[^@]*@"
WWW_RE = "^www\\."
TRAILING_DOT_RE = "\\.$"
PATH_RE = "^[^/?#]*([^?#]*)"
QUERY_RE = "^[^#]*\\?([^#]*)"
TRACKING_IN_QUERY_RE = "&" + TRACKING_PARAMS + "=[^&]*"
LEADING_AMP_RE = "^&+"
TRAILING_AMP_RE = "&+$"
TRAILING_SLASH_RE = "/+$"
REGISTERED_DOMAIN_RE = "([a-z0-9-]+\\.[a-z0-9-]+)$"


def _scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, SCHEME_RE, 1))


def canonical_parts(url: Column) -> dict[str, Column]:
    """Columns for (canonical_url, host, registered_domain) of ``url``."""
    sch = _scheme(url)
    after = F.regexp_replace(url, AFTER_SCHEME_RE, "")
    auth = F.lower(F.regexp_extract(after, AUTHORITY_RE, 1))
    h = F.regexp_replace(auth, USERINFO_RE, "")
    h = F.regexp_replace(h, WWW_RE, "")
    # default-port strip is scheme-conditional
    h = (
        F.when((sch == F.lit("http")), F.regexp_replace(h, ":80$", ""))
        .when((sch == F.lit("https")), F.regexp_replace(h, ":443$", ""))
        .otherwise(h)
    )
    h = F.regexp_replace(h, TRAILING_DOT_RE, "")

    path = F.regexp_extract(after, PATH_RE, 1)
    path = F.regexp_replace(path, TRAILING_SLASH_RE, "")

    query = F.regexp_extract(after, QUERY_RE, 1)
    q = F.regexp_replace(F.concat(F.lit("&"), query), TRACKING_IN_QUERY_RE, "")
    q = F.regexp_replace(q, LEADING_AMP_RE, "")
    q = F.regexp_replace(q, TRAILING_AMP_RE, "")

    canonical = F.concat(
        sch,
        F.lit("://"),
        h,
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    domain = F.regexp_extract(h, REGISTERED_DOMAIN_RE, 1)
    return {"canonical_url": canonical, "host": h, "registered_domain": domain}


def with_canonical_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    parts = canonical_parts(F.col(url_col))
    for name, col in parts.items():
        df = df.withColumn(name, col)
    return df


def url_host_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host crawl stats over canonicalized URLs: document count,
    distinct canonical URLs, and the URL-dup count (docs minus distinct)
    — the host-level signal a crawl frontier / dedup pass keys on.
    One shuffle on host (map-side partial aggregation)."""
    c = with_canonical_url(df, url_col)
    return c.groupBy("host", "registered_domain").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("canonical_url").alias("n_canonical"),
        (F.count("*") - F.countDistinct("canonical_url")).alias("n_url_dups"),
    )


def canonical_url_sql(url_expr: str) -> dict[str, str]:
    """DuckDB SQL expressions for the SAME canonicalization, generated
    from the same pattern constants (engines cannot drift)."""
    sch = f"lower(regexp_extract({url_expr}, '{SCHEME_RE}', 1))"
    after = f"regexp_replace({url_expr}, '{AFTER_SCHEME_RE}', '')"
    auth = f"lower(regexp_extract({after}, '{AUTHORITY_RE}', 1))"
    h = f"regexp_replace({auth}, '{USERINFO_RE}', '')"
    h = f"regexp_replace({h}, '{WWW_RE}', '')"
    h = (
        f"CASE WHEN {sch} = 'http' THEN regexp_replace({h}, ':80$', '') "
        f"WHEN {sch} = 'https' THEN regexp_replace({h}, ':443$', '') "
        f"ELSE {h} END"
    )
    h = f"regexp_replace({h}, '{TRAILING_DOT_RE}', '')"

    path = f"regexp_extract({after}, '{PATH_RE}', 1)"
    path = f"regexp_replace({path}, '{TRAILING_SLASH_RE}', '')"

    query = f"regexp_extract({after}, '{QUERY_RE}', 1)"
    q = f"regexp_replace('&' || {query}, '{TRACKING_IN_QUERY_RE}', '', 'g')"
    q = f"regexp_replace({q}, '{LEADING_AMP_RE}', '')"
    q = f"regexp_replace({q}, '{TRAILING_AMP_RE}', '')"

    canonical = (
        f"({sch} || '://' || {h} || {path} || "
        f"CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END)"
    )
    domain = f"regexp_extract({h}, '{REGISTERED_DOMAIN_RE}', 1)"
    return {"canonical_url": canonical, "host": h, "registered_domain": domain}
