"""Temporal join operators: distributed as-of join and bucketized range join.

Spark has no built-in as-of or inequality-range join; the naive encodings
are a per-row correlated subquery (driver-killing) or a key-only equi-join
followed by a window over ALL dim versions per fact row (memory blow-up on
hot keys).  These are the two scalable re-expressions:

- **asof_join**: the classic *union + ordered window* merge.  Tag dim rows
  and fact rows, union them, and run ONE window per key ordered by
  timestamp where ``last(payload, ignoreNulls=True)`` carries the most
  recent dim version forward onto every fact row.  Cost: a single shuffle
  on the key (the window sort), zero joins, state per key = one payload
  struct — the same plan shape a hand-written merge join would produce.
  Semantics match DuckDB's ``ASOF [LEFT] JOIN ... ON f.k = d.k AND
  f.ts >= d.ts`` (a dim row effective AT the fact timestamp wins;
  ``strict=True`` gives the ``>`` variant).

- **range_join_buckets**: equi-join re-expression of
  ``point BETWEEN lo AND hi``.  Intervals explode to the fixed-width
  buckets they cover (``sequence()`` — JVM-side, no Python), points map to
  exactly one bucket, and the join is a plain equi-join on
  ``(key, bucket)`` refined by the exact BETWEEN predicate.  With
  ``bucket_width >= (hi - lo)`` every interval covers at most 2 buckets,
  so the blow-up factor is bounded by 2 regardless of corpus size — the
  property that keeps this join safe at 100 TB where a theta-join would
  cross-product per key.

100 TB notes: asof_join is one exchange; skewed keys are bounded by the
window's external sort (no per-key materialization of all versions).
range_join_buckets shuffles both sides once on (key, bucket); bucket
granularity is the skew dial.  No Python runners on either path.

Reference parity: beyond-reference (the reference has no temporal joins);
requested by the build brief's custom-operator list (as-of join, range
join).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_IS_DIM = "__asof_is_dim"
_PAYLOAD = "__asof_payload"


def asof_join(
    fact: DataFrame,
    dim: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """As-of join ``fact`` to the most recent ``dim`` row per key.

    For every fact row, attaches ``payload_cols`` from the dim row with the
    greatest ``ts_col`` satisfying ``dim.ts <= fact.ts`` (``<`` when
    ``strict``) within the same ``key_cols`` group; facts with no prior dim
    version keep NULL payloads (left-join semantics).

    ``dim`` must be unique per ``(key_cols, ts_col)`` — with duplicates the
    carried version among the ties is unspecified; pre-aggregate (e.g.
    ``groupBy(key, ts).agg(max(...))``) to pin it.  Payloads are carried
    inside one struct, so a dim version whose payload *fields* are NULL
    still shadows older versions (ignoreNulls skips missing rows, not
    missing values).
    """
    key_cols = list(key_cols)
    payload_cols = list(payload_cols)
    fact_cols = fact.columns

    dim_tagged = dim.select(
        *key_cols,
        F.col(ts_col).alias(ts_col),
        F.lit(1).alias(_IS_DIM),
        F.struct(*payload_cols).alias(_PAYLOAD),
        *[F.lit(None).cast(fact.schema[c].dataType).alias(c)
          for c in fact_cols if c not in key_cols and c != ts_col],
    )
    fact_tagged = fact.select(
        *key_cols,
        F.col(ts_col).alias(ts_col),
        F.lit(0).alias(_IS_DIM),
        F.lit(None).cast(dim_tagged.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *[c for c in fact_cols if c not in key_cols and c != ts_col],
    )
    # column order must match for unionByName-free union; use unionByName
    merged = dim_tagged.unionByName(fact_tagged)

    # At equal ts a dim row sorts BEFORE the fact row for `<=` semantics
    # (is_dim desc) and AFTER it for strict `<` (is_dim asc).
    dim_rank = F.col(_IS_DIM).desc() if not strict else F.col(_IS_DIM).asc()
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), dim_rank)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))

    out = carried.filter(F.col(_IS_DIM) == 0).select(
        *fact_cols,
        *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in payload_cols],
    )
    return out


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: Sequence[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Join each point row to every interval row containing it.

    ``point_col``/``lo_col``/``hi_col`` are integral (cast your timestamps
    to epoch units first).  Intervals are inclusive on both ends
    (``lo <= point <= hi``).  Returns the full cross of matching
    (point, interval) column sets; name-collisions must be resolved by the
    caller beforehand.

    Pick ``bucket_width`` of the order of the typical interval length: the
    exploded interval side grows by ``ceil(len/width) + 1`` buckets per
    row (2 when ``width >= len``), and each point lands in exactly one
    bucket, so no pair is ever produced twice and no refinement dedup is
    needed.
    """
    key_cols = list(key_cols)
    if bucket_width <= 0:
        raise ValueError("bucket_width must be a positive integer")

    bucket = "__range_bucket"
    iv = intervals.withColumn(
        bucket,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor(F.col(hi_col) / bucket_width).cast("long"),
            )
        ),
    )
    pt = points.withColumn(
        bucket, F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    joined = pt.join(iv, on=key_cols + [bucket], how="inner").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )
    return joined.drop(bucket)


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Collapse a per-key update stream into SCD type-2 validity intervals.

    Orders each key's rows by ``(ts_col, *tiebreak_cols)``, suppresses rows
    whose ``value_cols`` equal the previous row's (no-op updates), and emits
    one row per surviving change with ``valid_from`` (= its ``ts_col``),
    ``valid_to`` (= the NEXT change's ``ts_col``; NULL on the open current
    version) and a 1-based ``version`` counter.  This is the temporal-
    dimension build step (Kimball SCD2) a KG maintenance pass runs to turn
    the incremental entity-update ledger into queryable as-of history —
    the table ``asof_join`` then serves lookups from.

    Exactness: pure window arithmetic over integral/equality-comparable
    columns — no floats, so any SQL engine replaying the same lag/lead
    recipe matches bit-for-bit.  NULL values compare as distinct-from-
    everything EXCEPT another NULL (change detection uses null-safe
    equality), matching the SQL twin's ``IS NOT DISTINCT FROM``.

    100 TB notes: ONE shuffle (the per-key window sort); state per key is
    one row — identical plan shape to ``asof_join``.  Ties inside
    ``(ts, tiebreak)`` must be made unique by the caller (e.g. a ledger
    sequence number) or the kept row among exact ties is unspecified.

    Reference parity: beyond-reference (the reference rebuilds its
    normalization dictionaries from scratch, ``OICI_database.py``); this is
    the incremental-history variant the north rule's resumable KG
    materialization needs.
    """
    key_cols = list(key_cols)
    value_cols = list(value_cols)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    changed = F.lit(False)
    for c in value_cols:
        prev = F.lag(F.col(c)).over(w)
        # null-safe inequality: a change iff NOT (v <=> lag(v)); the very
        # first row per key has lag NULL on EVERY value col — force-keep it
        changed = changed | ~F.col(c).eqNullSafe(prev)
    first_row = F.row_number().over(w) == 1
    kept = df.withColumn("__keep", first_row | changed).filter(F.col("__keep"))

    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return kept.select(
        *key_cols,
        *value_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
    )


def funnel_steps(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    step_predicates: Sequence[Column],
) -> DataFrame:
    """Strictly-ordered funnel: per key, the earliest timestamp at which
    each step completes, where step *i+1* only counts from events strictly
    AFTER step *i*'s completion timestamp.

    Returns one row per key with ``t1..tN`` (NULL once the funnel stalls)
    and ``max_stage`` (number of completed steps, 0..N).  This is the
    conversion/behavioral query an events warehouse answers constantly;
    at KG scale it doubles as provenance staging (ingested → linked →
    materialized per document).

    Exactness: integral timestamps + deterministic predicates ⇒ every
    min() is order-independent; ties ON the same timestamp between a step-i
    completion and a step-i+1 candidate do NOT chain (strict ``>``) — a
    deterministic rule both twins share.

    100 TB notes: ONE shuffle — all N step minima are windows over the
    same ``partitionBy(key)`` exchange (Spark reuses the sort), then one
    map-side-combinable groupBy on the already-partitioned key.  No
    self-joins: the naive encoding joins events N times; this is the
    window re-expression.
    """
    key_cols = list(key_cols)
    w = Window.partitionBy(*key_cols)
    out = df
    prev_t: Optional[str] = None
    t_names = []
    for i, pred in enumerate(step_predicates, start=1):
        name = f"t{i}"
        cond = pred
        if prev_t is not None:
            cond = cond & F.col(prev_t).isNotNull() & (
                F.col(ts_col) > F.col(prev_t)
            )
        out = out.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev_t = name
        t_names.append(name)

    stage = sum((F.col(t).isNotNull().cast("int") for t in t_names), F.lit(0))
    return (
        out.withColumn("max_stage", stage.cast("long"))
        .groupBy(*key_cols)
        .agg(
            *[F.first(t).alias(t) for t in t_names],
            F.first("max_stage").alias("max_stage"),
        )
    )


def retention_cohorts(
    df: DataFrame,
    key_cols: Sequence[str],
    day_col: str,
    period_days: int = 7,
) -> DataFrame:
    """Cohort/retention matrix over an activity stream: each key's cohort
    is the period (integer ``day_col DIV period_days`` — pure integer
    arithmetic, no calendar functions, so any SQL engine replays it
    bit-for-bit) of its FIRST active day; the output counts, per
    ``(cohort_period, period_offset)``, how many distinct keys were active
    again ``offset`` periods later, plus the parts-per-million retention
    ratio against the cohort size (offset 0 ⇒ ppm = 10^6 by construction —
    a built-in self-check).

    This is the product-analytics staple next to ``funnel_steps``, and at
    KG scale the freshness audit of an incremental materialization: which
    ingest cohort of entities is still receiving updates k weeks on.

    Exactness: min/DIV/count on integers only (rule 11); retention_ppm is
    BIGINT ``(10^6 * n_active) DIV cohort_size``.

    100 TB notes: first-day is a window min over ONE ``partitionBy(key)``
    exchange; the per-(key, cohort, offset) dedup then re-shuffles on a
    strictly finer key (no second pass over raw events), the final agg is
    map-side combinable, and cohort sizes join back via BROADCAST (one row
    per cohort period — thousands at most for decades of data).  No
    Python runners.
    """
    key_cols = list(key_cols)
    w = Window.partitionBy(*key_cols)
    day = F.col(day_col).cast("long")
    # true integer division (div), not float division — truncation
    # semantics must match the SQL twin's // on BIGINTs
    base = (
        df.withColumn("__first_day", F.min(day).over(w))
        .select(
            *key_cols,
            F.expr(f"__first_day div {int(period_days)}").alias(
                "cohort_period"
            ),
            (
                F.expr(f"{day_col} div {int(period_days)}")
                - F.expr(f"__first_day div {int(period_days)}")
            ).cast("long").alias("period_offset"),
        )
        .distinct()
    )
    active = base.groupBy("cohort_period", "period_offset").agg(
        F.count("*").cast("long").alias("n_active")
    )
    sizes = (
        base.filter(F.col("period_offset") == 0)
        .groupBy("cohort_period")
        .agg(F.count("*").cast("long").alias("cohort_size"))
    )
    return active.join(F.broadcast(sizes), "cohort_period").select(
        "cohort_period",
        "period_offset",
        "n_active",
        "cohort_size",
        F.expr("(1000000 * n_active) div cohort_size").alias(
            "retention_ppm"
        ),
    )


def snapshot_diff(
    scd: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
    t1: int,
    t2: int,
    tombstone: Optional[Column] = None,
) -> DataFrame:
    """CDC changefeed between two as-of snapshots of an SCD2 history
    (``scd2_history`` output: ``valid_from``/``valid_to`` with NULL = open
    current version): emit one row per key whose state DIFFERS between
    ``t1`` and ``t2``, classified ``insert`` / ``update`` / ``delete``,
    with ``old_*`` / ``new_*`` value columns.  ``tombstone`` (a boolean
    Column over the version's value columns) marks soft-deleted versions:
    a tombstoned version is ABSENT from its snapshot, which is what makes
    ``delete`` (live at t1, tombstoned by t2) and re-activation
    (``insert`` after a tombstone) reachable from an append-only ledger.

    This is the incremental-consumption face of the temporal family:
    ``kg_snapshot_asof`` reads ONE point in time; a downstream consumer
    that already holds the t1 state applies exactly this diff to reach t2
    (Iceberg/Delta CDC semantics) instead of re-reading the world —
    the 100 TB reason this operator exists.

    Exactness: equality-only predicates over integral timestamps and
    null-safe value comparison (rule 11) — unchanged keys are dropped by
    ``NOT (old <=> new)`` per value column.

    100 TB notes: both snapshots are pure filters over the SAME SCD2
    dataframe (one upstream window shuffle, evaluated twice); the diff is
    a single full-outer shuffle join on the key (full-outer cannot
    broadcast — both sides are entity-sized by design).  State per key is
    one row per side.
    """
    key_cols = list(key_cols)
    value_cols = list(value_cols)

    def snap(t: int, pfx: str) -> DataFrame:
        s = scd.filter(
            (F.col("valid_from") <= F.lit(t))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(t)))
        )
        if tombstone is not None:
            s = s.filter(~tombstone)
        return s.select(
            *key_cols, *[F.col(c).alias(f"{pfx}{c}") for c in value_cols]
        )

    s1 = snap(t1, "old_")
    s2 = snap(t2, "new_")
    j = s1.join(s2, key_cols, "full_outer")
    probe_old = F.col(f"old_{value_cols[0]}")
    probe_new = F.col(f"new_{value_cols[0]}")
    # presence probes: value_cols[0] must be non-null in live versions
    # (snapshots emit at most one row per key, so a NULL probe == no row)
    change = (
        F.when(probe_old.isNull(), F.lit("insert"))
        .when(probe_new.isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    unchanged = F.lit(True)
    for c in value_cols:
        unchanged = unchanged & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    return j.filter(
        probe_old.isNull() | probe_new.isNull() | ~unchanged
    ).select(
        *key_cols,
        change.alias("change_type"),
        *[F.col(f"old_{c}") for c in value_cols],
        *[F.col(f"new_{c}") for c in value_cols],
    )
