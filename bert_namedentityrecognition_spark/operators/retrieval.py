"""BM25 ranked retrieval over the documents corpus.

Log-free variant: the usual ``ln((N - df + 0.5)/(df + 0.5) + 1)`` idf is
replaced by the raw Robertson–Sparck-Jones odds ratio
``(N - df + 0.5)/(df + 0.5)`` — same per-term monotonicity, but every
arithmetic step is IEEE +,-,*,/ on doubles, so the DuckDB twin replays the
score BIT-identically with matched operand order (the repo's log-free
precedent: kg_pmi_edges' integer positive-PMI test). Tokenization is the
engine-wide whitespace convention (``split(trim(text), '\\s+')`` ↔
``string_split_regex``), shared with the token-count/vocab/sketch family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def bm25_rank(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``top_n`` documents for the multi-term query ``terms`` by
    (log-free) BM25. Returns (doc_id, rank, bm25_score) with rank 1..top_n
    by score DESC, doc_id ASC ties; bm25_score is round(·, 6) for the gate.

    Scale shape: one map computes per-doc tf/dl (tf via a JVM
    ``filter``-lambda count per literal term — |terms| is query-sized, not
    data-sized); corpus stats (N, Σdl, per-term df) are ONE map-side-combined
    aggregate broadcast back as a 1-row cross join; scoring is a pure map;
    the top-N is ``orderBy().limit()`` — Spark's TakeOrderedAndProject, a
    per-partition partial top-k + driver merge, NOT a global sort — and only
    the surviving ``top_n`` rows pass through the rank window. The double
    fold order (per-term score, then a left-assoc sum in ``terms`` order) is
    pinned so the SQL twin matches bit-for-bit.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("t")).withColumn(
        "dl", F.size("t")
    )
    def _eq(term: str):
        # single-parameter closure: a `lambda x, term=term:` default-arg
        # binding makes the lambda 2-ary and pyspark then binds term to
        # F.filter's (element, index) INDEX variable — the comparison
        # silently coerces tokens to BIGINT and the job fails (measured)
        return lambda x: x == term

    for i, term in enumerate(terms):
        base = base.withColumn(f"tf{i}", F.size(F.filter(F.col("t"), _eq(term))))
    base = base.drop("t")
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")

    def term_score(i: int):
        tf = F.col(f"tf{i}").cast("double")
        df = F.col(f"df{i}").cast("double")
        idf = (F.col("n_docs").cast("double") - df + F.lit(0.5)) / (df + F.lit(0.5))
        denom = tf + F.lit(float(k1)) * (
            F.lit(1.0) - F.lit(float(b))
            + F.lit(float(b)) * (F.col("dl").cast("double") / avgdl)
        )
        return idf * (tf * F.lit(float(k1) + 1.0)) / denom

    score = term_score(0)
    for i in range(1, len(terms)):
        score = score + term_score(i)
    top = (
        scored.withColumn("score", score)
        .select("doc_id", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(top_n)
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            "doc_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("score", 6).alias("bm25_score"),
        )
    )


def inverted_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Materialize the inverted index postings table: one row per
    (token, doc) with the term frequency and the token's first position
    (1-based rank among the doc's tokens) — the build step behind
    ``bm25_rank`` (which recomputes tf per query; a serving deployment
    pays this once and range-partitions by token instead).

    Tokenization is the engine-wide whitespace convention
    (``split(trim(text), '\\s+')`` ↔ ``regexp_split_to_array``), empties
    filtered, so the twin matches bit-for-bit; positions are ranks among
    KEPT tokens, invariant to either engine's empty-element placement.

    Scale shape: posexplode (JVM-side, no Python) → ONE map-side-combined
    groupBy on (token, doc_id).  At 100 TB the output is written
    partitioned/bucketed BY TOKEN so per-term lookups are single-bucket
    scans; df/idf roll up from this table with one more partial agg."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    exploded = (
        docs.select(F.col(id_col).alias("doc_id"), F.posexplode(toks))
        .filter(F.col("col") != "")
        .select(
            "doc_id",
            F.col("col").alias("token"),
            (F.col("pos") + 1).cast("long").alias("tok_pos"),
        )
    )
    return exploded.groupBy("token", "doc_id").agg(
        F.count("*").cast("long").alias("tf"),
        F.min("tok_pos").cast("long").alias("first_pos"),
    )
