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


def distributed_prefix_sum(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    out: str = "cumsum",
    ascending: Sequence[bool] | None = None,
) -> DataFrame:
    """Global running total of ``value_col`` in ``order_cols`` order
    WITHOUT a single-partition window — the two-pass parallel prefix sum:

    1. ``repartitionByRange(order_cols)`` so partitions tile the global
       order, materialized ONCE (``localCheckpoint``) with the partition
       id attached — both downstream jobs must see the SAME placement.
    2. per-partition running totals via a ``partitionBy(pid)`` window
       (parallel across partitions), plus a driver-side exclusive scan of
       the per-partition sums (one bounded collect — one row PER
       PARTITION, not per data row) broadcast-joined back as offsets.

    The naive ``Window.orderBy(...)`` with no partitionBy funnels the
    whole table through ONE task; this shape keeps every stage parallel,
    which is the difference between packing 10M file entries in seconds
    and an hour.  Output values are invariant to the range partitioner's
    sampled boundaries because ``order_cols`` must be a TOTAL order
    (caller includes a unique tiebreak column).

    Exactness: sums in whatever integral type ``value_col`` carries —
    callers wanting bit-exact twins pass BIGINTs (rule 11).
    """
    order_cols = list(order_cols)
    if ascending is None:
        ascending = [True] * len(order_cols)
    sort_cols = [
        F.col(c).asc() if a else F.col(c).desc()
        for c, a in zip(order_cols, ascending)
    ]
    ranged = (
        df.repartitionByRange(*sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("__pid").orderBy(*sort_cols)
    local = ranged.withColumn("__local", F.sum(F.col(value_col)).over(w))
    totals = {
        r["__pid"]: r["s"]
        for r in ranged.groupBy("__pid")
        .agg(F.sum(F.col(value_col)).alias("s"))
        .collect()
    }
    running = 0
    offsets = []
    for pid in sorted(totals):
        offsets.append((pid, running))
        running += int(totals[pid] or 0)
    spark = df.sparkSession
    off = spark.createDataFrame(offsets, "__pid INT, __offset LONG")
    return (
        local.join(F.broadcast(off), "__pid")
        .withColumn(out, (F.col("__local") + F.col("__offset")).cast("long"))
        .drop("__pid", "__local", "__offset")
    )


def compaction_binpack(
    files: DataFrame,
    id_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-files compaction planner: assign every file to a rewrite bin
    of ~``target_bytes`` and emit per-bin stats ``(bin_id, n_files,
    total_bytes, min_bytes, max_bytes)`` — the decision table an
    ``OPTIMIZE``/rewrite-data-files maintenance pass consumes before
    touching a single data byte.

    Packing rule (deterministic, engine-replayable): files ordered by
    ``(size desc, id asc)``, ``bin = (running_total - size) DIV target``
    — next-fit over the sorted stream, where a bin holds every file whose
    EXCLUSIVE prefix total lands in ``[k·target, (k+1)·target)``.  Bins
    may overshoot by at most one file (the standard compaction contract:
    target is a floor, not a cap); descending order puts the big files
    first so the overshoot file is never pathological.  Greedy best-fit
    would pack marginally tighter but is inherently sequential —
    next-fit-decreasing is the parallelizable rule, and the twin SQL is
    one window expression.

    100 TB notes: the running total comes from ``distributed_prefix_sum``
    (no single-partition sort — see its docstring); the final agg is
    map-side combinable on ``bin_id``.  The input here is the FILE
    MANIFEST (one row per file — metadata scale), so even a 100 TB table
    is a few million rows, but a million-row single-task sort is still
    the difference between subsecond and minutes.

    Reference parity: beyond-reference (no storage maintenance stage);
    the write-side complement of ``layout_file_stats``'s read-side audit.
    """
    sized = files.select(
        F.col(id_col).alias("__fid"),
        F.col(size_col).cast("long").alias("__sz"),
    )
    cum = distributed_prefix_sum(
        sized,
        ["__sz", "__fid"],
        "__sz",
        out="__cum",
        ascending=[False, True],
    )
    t = int(target_bytes)
    binned = cum.withColumn(
        "bin_id", F.expr(f"(__cum - __sz) div {t}").cast("long")
    )
    return binned.groupBy("bin_id").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("__sz").cast("long").alias("total_bytes"),
        F.min("__sz").cast("long").alias("min_bytes"),
        F.max("__sz").cast("long").alias("max_bytes"),
    )


def with_hilbert(
    df: DataFrame, xcol: str, ycol: str, bits: int, out: str = "hval"
) -> DataFrame:
    """Attach the Hilbert-curve index of two integral key columns (caller
    pre-reduces both into ``[0, 2**bits)``).  Unlike the flat z-value
    sum, the Hilbert transform is a per-level state rewrite, so it chains
    one narrow ``select`` per bit level — all still JVM-side expressions
    inside whole-stage codegen, generated from the SAME
    ``oracle/layout.py:hilbert_level_exprs`` the DuckDB twin replays
    (rule 6)."""
    from ..oracle.layout import hilbert_level_exprs

    others = [c for c in df.columns if c not in (xcol, ycol)]
    cur = df.selectExpr(
        *others,
        f"{xcol} AS x0",
        f"{ycol} AS y0",
        f"{xcol} AS x",
        f"{ycol} AS y",
        "CAST(0 AS BIGINT) AS d",
    )
    for x_expr, y_expr, d_expr in hilbert_level_exprs(bits, "DIV"):
        cur = cur.selectExpr(
            *others,
            "x0",
            "y0",
            f"{x_expr} AS x",
            f"{y_expr} AS y",
            f"{d_expr} AS d",
        )
    return cur.selectExpr(
        *others, f"x0 AS {xcol}", f"y0 AS {ycol}", f"CAST(d AS BIGINT) AS {out}"
    )
