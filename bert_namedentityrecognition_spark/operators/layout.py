"""Z-order data-layout operator: compute per-file clustering stats and the
min/max pruning decision for a layout, distributed.

``layout_file_stats`` is the job a table-maintenance pass (Delta/Iceberg
``OPTIMIZE ZORDER BY``) runs to DECIDE and AUDIT a layout: given a
deterministic file-assignment expression (z-value range bins here — the
manifest math, not a sampled range partitioner, so results are
reproducible on any cluster size), it aggregates each file's row count and
per-key min/max stats, then applies the standard stats-overlap pruning
test for a query box.  Comparing the z-order assignment against a
single-key clustering on the same data shows exactly how many files a
two-dimensional predicate prunes under each layout — the evidence a 100 TB
table owner needs before paying for a rewrite.

100 TB notes: ONE map-side-combined groupBy per layout (file_id is derived
arithmetic, no global sort/row_number — a windowless plan that scales to
any file count); the z-value expression is a flat integer sum inside
whole-stage codegen (`oracle/layout.py:zorder_sql_expr`, shared verbatim
with the DuckDB twin).  At write time the same z-value is the
``repartitionByRange``/sort key; here we audit stats, we don't move data.

Reference parity: beyond-reference (no storage layout stage in the
reference); SURVEY §2.12 extension alongside the bucketed-join write path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..oracle.layout import zorder_sql_expr


def with_zvalue(
    df: DataFrame, xcol: str, ycol: str, bits: int, out: str = "zval"
) -> DataFrame:
    """Attach the Morton z-value of two integral key columns (caller
    pre-reduces both into ``[0, 2**bits)``)."""
    return df.withColumn(out, F.expr(zorder_sql_expr(xcol, ycol, bits, "DIV")))


def layout_file_stats(
    df: DataFrame,
    file_id_col,
    xcol: str,
    ycol: str,
    query_box: Sequence[int],
    layout_name: str,
) -> DataFrame:
    """Per-file stats + pruning decision for one deterministic layout.

    ``file_id_col`` is a Column assigning every row to a file (value-range
    bin of the layout's sort key); ``query_box`` is ``(xa, xb, ya, yb)``
    inclusive.  Output: one row per non-empty file with BIGINT stats and
    ``hit`` = 1 iff the file survives min/max pruning for the box.
    """
    xa, xb, ya, yb = (int(v) for v in query_box)
    stats = (
        df.withColumn("file_id", file_id_col.cast("long"))
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(xcol).alias("min_x"),
            F.max(xcol).alias("max_x"),
            F.min(ycol).alias("min_y"),
            F.max(ycol).alias("max_y"),
        )
    )
    hit = (
        (F.col("min_x") <= xb)
        & (F.col("max_x") >= xa)
        & (F.col("min_y") <= yb)
        & (F.col("max_y") >= ya)
    )
    return stats.select(
        F.lit(layout_name).alias("layout"),
        "file_id",
        F.col("n_rows").cast("long"),
        F.col("min_x").cast("long"),
        F.col("max_x").cast("long"),
        F.col("min_y").cast("long"),
        F.col("max_y").cast("long"),
        hit.cast("long").alias("hit"),
    )
