"""Dimension-table builders — the knowledge-base scans of SURVEY §2.1.

The reference loads Manbyo CSV / Hyakuyaku CSV / MedDRA SQLite / OICI Excel
into in-memory pandas frames per process (``knowledge_bases/*``). Here each
becomes a one-time export into the canonical ``entity_dim`` shape
(FIXTURES.md §4) — a small broadcast-side DataFrame:

    entity_dim(entity_id, surface, canonical, code, kind, human_check)

- ``dim_from_csv``      — Manbyo/Hyakuyaku-style CSV with column mapping
- ``dim_from_sqlite``   — MedDRA-style SQLite (stdlib sqlite3 → Arrow)
- ``two_hop_dim``       — the LLT→PT canonical hop
  (``knowledge_bases/meddra.py:149-164``: ``llt INNER JOIN pt_j ON
  llt.pt_code = pt_j.pt_code``) pre-joined into one flat dimension so the
  runtime pays a single broadcast join instead of two
- ``dim_from_excel``    — OICI-style Excel, gated on an engine being present
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DIM_SCHEMA = (
    "entity_id string, surface string, canonical string, code string, "
    "kind string, human_check string"
)


def dim_from_csv(
    spark: SparkSession,
    path: str,
    surface_col: str,
    canonical_col: str,
    code_col: str | None = None,
    kind: str = "symptom",
    id_prefix: str = "ENT",
) -> DataFrame:
    """CSV → entity_dim (Manbyo: 出現形→標準病名/ICD; Hyakuyaku: 出現形→一般名)."""
    df = spark.read.option("header", "true").csv(path)
    out = df.select(
        F.concat(F.lit(id_prefix), F.monotonically_increasing_id().cast("string")).alias(
            "entity_id"
        ),
        F.col(surface_col).alias("surface"),
        F.col(canonical_col).alias("canonical"),
        (F.col(code_col) if code_col else F.lit(None).cast("string")).alias("code"),
        F.lit(kind).alias("kind"),
        F.lit(None).cast("string").alias("human_check"),
    )
    return out.filter(F.col("surface").isNotNull()).dropDuplicates(["surface"])


def dim_from_sqlite(
    spark: SparkSession, path: str, query: str, kind: str = "symptom"
) -> DataFrame:
    """SQLite → DataFrame via stdlib sqlite3 (one-time dim export; the
    production path is spark.read.jdbc or a prebuilt Iceberg table).

    ``query`` must project (entity_id, surface, canonical, code)."""
    with sqlite3.connect(path) as con:
        cur = con.execute(query)
        cols = [d[0] for d in cur.description]
        rows = [dict(zip(cols, r)) for r in cur.fetchall()]
    for r in rows:
        r.setdefault("code", None)
        r["kind"] = kind
        r["human_check"] = None
    return spark.createDataFrame(rows, DIM_SCHEMA) if rows else spark.createDataFrame([], DIM_SCHEMA)


def two_hop_dim(llt: DataFrame, pt: DataFrame) -> DataFrame:
    """Pre-join the two-step canonical hop (surface→LLT→PT) into one
    dimension: the runtime then needs a single broadcast equi-join.

    llt(llt_code, surface, pt_code), pt(pt_code, pt_name) →
    entity_dim rows with canonical = pt_name, code = pt_code.
    """
    return (
        llt.join(F.broadcast(pt), "pt_code", "left")
        .select(
            F.col("llt_code").cast("string").alias("entity_id"),
            F.col("surface"),
            F.coalesce(F.col("pt_name"), F.col("surface")).alias("canonical"),
            F.col("pt_code").cast("string").alias("code"),
            F.lit("symptom").alias("kind"),
            F.lit(None).cast("string").alias("human_check"),
        )
        .dropDuplicates(["surface"])
    )


def dim_from_excel(
    spark: SparkSession,
    path: str,
    surface_col: str = "word",
    human_check_col: str = "human_check",
    kind: str = "symptom",
) -> DataFrame:
    """OICI-style Excel scan; requires a pandas Excel engine (openpyxl),
    absent in this container → clear ImportError at call time."""
    import pandas as pd

    try:
        pdf = pd.read_excel(path)
    except ImportError as e:
        raise ImportError(
            "no Excel engine installed; export the sheet to CSV and use "
            "dim_from_csv, or install openpyxl in production"
        ) from e
    rows = [
        {
            "entity_id": f"OICI{i}",
            "surface": str(r[surface_col]),
            "canonical": None if pd.isna(r[human_check_col]) else str(r[human_check_col]),
            "code": None,
            "kind": kind,
            "human_check": None if pd.isna(r[human_check_col]) else str(r[human_check_col]),
        }
        for i, r in pdf.iterrows()
    ]
    return spark.createDataFrame(rows, DIM_SCHEMA)
