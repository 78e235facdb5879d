"""Entity normalization — the exact→fuzzy two-phase broadcast join.

Re-expresses the EntityNormalizer family (``knowledge_bases/manbyo.py:52-85``,
``hyakuyaku.py:50-69``, ``OICI_database.py:22-41``) as DataFrame stages:

1. **distinct surfaces** — normalize each distinct (word, type) once, not per
   mention (the reference normalizes per mention occurrence; same result,
   this is the scale-correct evaluation order).
2. **exact stage** — broadcast hash equi-join on han_to_zen-normalized
   surface (the OICI short-circuit, ``OICI_database.py:25-32``); JVM-side.
3. **fuzzy stage** — only the misses: broadcast theta-join against the
   dimension with a *length-band prune* derived from the indel-ratio bound
   (``ratio ≤ 200·min(la,lb)/(la+lb)``; pairs whose bound can't reach the
   threshold are never scored), then a vectorized Arrow UDF computes the
   exact reference scorer (indel ratio == rapidfuzz.fuzz.ratio), then
   ``row_number()`` over ``Window.partitionBy(word).orderBy(score desc,
   surface asc)`` picks the deterministic top-1 (``process.extractOne``).
4. **threshold + sentinel** — accept iff score > threshold else '' sentinel
   (``manbyo.py:63-71``); convert hook = taking the dimension's canonical /
   code columns in the join itself.
5. **join back** — mention stream joins the tiny surface→canonical map
   (broadcast); no shuffle of the big side.

Skew note: surfaces are distinct before any expensive work, so a hot surface
("ロキソニン" in 30% of pages) costs ONE normalization; the join back is a
broadcast, so no skewed shuffle partition exists on this path at all.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window
from pyspark.sql.functions import pandas_udf

from ..oracle.fuzzy import ratio
from ..oracle.textproc import han_to_zen

SENTINEL = ""


@pandas_udf(T.StringType())
def han_to_zen_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: han_to_zen(x) if x is not None else None)


@pandas_udf(T.DoubleType())
def indel_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([ratio(x, y) for x, y in zip(a, b)], dtype="float64")


def normalized_dim(dim: DataFrame) -> DataFrame:
    """Dimension with han_to_zen-normalized surface (dict side of the join).

    Normalization must match the mention side exactly (manbyo.py:58) —
    both run the same ``han_to_zen`` oracle kernel.
    """
    return dim.withColumn("surface_norm", han_to_zen_udf(F.col("surface")))


def normalize_surfaces(
    surfaces: DataFrame,
    dim: DataFrame,
    threshold: float = 70.0,
    type_to_kind: dict[str, str] | None = None,
) -> DataFrame:
    """surfaces(word, type) → (word, type, canonical, entity_id, score, method).

    ``type_to_kind`` maps mention types to dimension ``kind`` values
    (default: identity). Rejections carry the '' sentinel and score of the
    best (rejected) candidate, mirroring ``manbyo.py:68-71``.
    """
    spark = surfaces.sparkSession
    dimn = normalized_dim(dim).select(
        "surface_norm", "canonical", "entity_id", "code", "kind"
    )

    if type_to_kind:
        mapping = F.create_map(
            *[F.lit(x) for kv in type_to_kind.items() for x in kv]
        )
        surfaces = surfaces.withColumn("kind_key", mapping[F.col("type")])
    else:
        surfaces = surfaces.withColumn("kind_key", F.col("type"))

    surf = surfaces.withColumn("word_norm", han_to_zen_udf(F.col("word")))

    # --- exact stage: broadcast hash equi-join --------------------------------
    exact = surf.join(
        F.broadcast(dimn),
        (surf.word_norm == dimn.surface_norm) & (surf.kind_key == dimn.kind),
        "left",
    )
    hits = exact.filter(F.col("surface_norm").isNotNull()).select(
        "word",
        "type",
        F.col("canonical"),
        F.col("entity_id"),
        F.col("code"),
        F.lit(100.0).alias("score"),
        F.lit("exact").alias("method"),
    )
    misses = exact.filter(F.col("surface_norm").isNull()).select(
        "word", "type", "kind_key", "word_norm"
    )

    # --- fuzzy stage: banded broadcast theta-join + exact scorer --------------
    lw = F.length("word_norm").cast("double")
    ls = F.length("surface_norm").cast("double")
    band_ok = (200.0 * F.least(lw, ls) / (lw + ls)) > F.lit(threshold)
    cand = misses.join(
        F.broadcast(dimn),
        (misses.kind_key == dimn.kind) & band_ok,
        "left",
    ).withColumn(
        "score",
        F.when(
            F.col("surface_norm").isNotNull(),
            indel_ratio_udf(F.col("word_norm"), F.col("surface_norm")),
        ).otherwise(F.lit(0.0)),
    )
    w = Window.partitionBy("word", "type").orderBy(
        F.col("score").desc(), F.col("surface_norm").asc_nulls_last()
    )
    fuzzy = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "word",
            "type",
            F.when(F.col("score") > threshold, F.col("canonical"))
            .otherwise(F.lit(SENTINEL))
            .alias("canonical"),
            F.when(F.col("score") > threshold, F.col("entity_id"))
            .otherwise(F.lit(None).cast("string"))
            .alias("entity_id"),
            F.when(F.col("score") > threshold, F.col("code"))
            .otherwise(F.lit(None).cast("string"))
            .alias("code"),
            "score",
            F.lit("fuzzy").alias("method"),
        )
    )
    return hits.unionByName(fuzzy)


def normalize_surfaces_lev(
    surfaces: DataFrame,
    dim: DataFrame,
    threshold: float = 50.0,
    surface_col: str = "surface",
) -> DataFrame:
    """All-JVM fuzzy top-1 variant: score = 100·(1 − levenshtein/max(len)).

    Same staging as ``normalize_surfaces`` but the scorer is Spark's builtin
    ``levenshtein`` — zero Python on the path, fully codegen-able, and
    bit-identical to any ANSI engine's ``levenshtein`` (used by the driver's
    DuckDB oracle). Prefer this when indel-ratio parity with rapidfuzz is
    not required.

    surfaces(word) × dim(surface, canonical) → (word, canonical, score).
    Deterministic top-1: score desc, surface asc. Below-threshold → ''.
    """
    d = dim.select(
        F.col(surface_col).alias("_surface"), F.col("canonical").alias("_canon")
    )
    scored = surfaces.join(F.broadcast(d)).withColumn(
        "score",
        F.round(
            100.0
            * (
                1.0
                - F.levenshtein(F.col("word"), F.col("_surface"))
                / F.greatest(F.length("word"), F.length("_surface")).cast("double")
            ),
            6,
        ),
    )
    w = Window.partitionBy("word").orderBy(F.col("score").desc(), F.col("_surface").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "word",
            F.when(F.col("score") > threshold, F.col("_canon"))
            .otherwise(F.lit(SENTINEL))
            .alias("canonical"),
            "score",
        )
    )


def normalize_mentions(
    mentions: DataFrame,
    dim: DataFrame,
    threshold: float = 70.0,
    type_to_kind: dict[str, str] | None = None,
) -> DataFrame:
    """mentions + canonical columns. Distinct-surface dedup then broadcast
    join back — the mention stream itself is never shuffled."""
    surfaces = mentions.select("word", "type").distinct()
    resolved = normalize_surfaces(surfaces, dim, threshold, type_to_kind)
    return mentions.join(F.broadcast(resolved), ["word", "type"], "left")
