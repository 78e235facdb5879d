"""Distributed evaluation — strict span P/R/F1 and relaxed metrics.

Strict (seqeval ``mode='strict'`` analogue, ``BERT/evaluate.py:46-52``):
exact-span equi-join of gold × pred mention tables on
``(url, sent_id, start, end, type)`` → TP; anti-joins → FN / FP; one
aggregation. This is the P/R ≥ 0.95 gate of the north rule, expressed as
three hash joins Catalyst can plan freely.

Relaxed (``util/relaxed_metrics.py:111-189``): the greedy Jaccard matcher is
inherently per-sentence, so it runs as a **cogrouped applyInPandas** over
``(url, sent_id)`` groups, reusing the oracle kernel verbatim inside the
Arrow UDF; per-type tp/fp/fn are additive across groups → final ``groupBy``
sum. Distribution-safe because the reference metric itself never compares
entities across sentences.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_KEY = ["url", "sent_id", "start", "end", "type"]


def strict_span_prf(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """One-row DataFrame: tp, fp, fn, precision, recall, f1.

    Plan-only (single job): expressed on top of the same full-outer join as
    :func:`strict_span_counts` — the old 3-``count()`` form ran three driver
    actions over the same joins and is gone."""
    counts = _strict_counts_plan(gold, pred)
    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    return counts.select(
        "tp",
        "fp",
        "fn",
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(prec + rec > 0, 2 * prec * rec / (prec + rec))
        .otherwise(F.lit(0.0))
        .alias("f1"),
    )


_SPANMATCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("sent_id", T.IntegerType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("exact_match", T.LongType()),
        T.StructField("exceeding_match", T.LongType()),
        T.StructField("partial_match", T.LongType()),
        T.StructField("missing_match", T.LongType()),
        T.StructField("incorrect_match", T.LongType()),
    ]
)


def span_match_taxonomy(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """Distributed span-match taxonomy scoring (``util/xlarge.py:6-118``
    semantics): per (url, sent_id), the oracle scorer runs inside a cogrouped
    Arrow UDF; returns per-sentence scores + category counts. Aggregate with
    ``.agg(avg('score'))`` for the corpus number."""
    from ..oracle.spanmatch import span_match_score

    def per_sentence(key, g: pd.DataFrame, p: pd.DataFrame):
        gg = sorted(
            ({"span": (s, e), "type": t} for s, e, t in zip(g["start"], g["end"], g["type"])),
            key=lambda d: d["span"][0],
        )
        pp = sorted(
            ({"span": (s, e), "type": t} for s, e, t in zip(p["start"], p["end"], p["type"])),
            key=lambda d: d["span"][0],
        )
        out: dict = {}
        score = span_match_score(gg, pp, out)
        return pd.DataFrame(
            [
                {
                    "url": key[0],
                    "sent_id": key[1],
                    "score": float(score),
                    "exact_match": out["exact_match"],
                    "exceeding_match": out["exceeding_match"],
                    "partial_match": out["partial_match"],
                    "missing_match": out["missing_match"],
                    "incorrect_match": out["incorrect_match"],
                }
            ]
        )

    g = gold.select("url", "sent_id", "start", "end", "type")
    p = pred.select("url", "sent_id", "start", "end", "type")
    return (
        g.groupBy("url", "sent_id")
        .cogroup(p.groupBy("url", "sent_id"))
        .applyInPandas(per_sentence, schema=_SPANMATCH_SCHEMA)
    )


def fold_metric_stats(metrics: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Cross-validation averaging (``scripts/crossvalidation/utils/
    crossvalidation_utils.py:7-71``): mean/std per metric column across
    folds. ``metrics``: one row per fold with numeric columns."""
    num_cols = [
        f.name
        for f in metrics.schema.fields
        if f.dataType.typeName() in ("double", "float", "long", "integer")
        and f.name not in (by or [])
    ]
    aggs = []
    for c in num_cols:
        aggs.append(F.avg(c).alias(f"{c}_mean"))
        aggs.append(F.stddev(c).alias(f"{c}_std"))
    return metrics.groupBy(*(by or [])).agg(*aggs) if by else metrics.agg(*aggs)


def _strict_counts_plan(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """Shared tp/fp/fn aggregation: full-outer span join → one agg row."""
    g = gold.select(*SPAN_KEY).distinct().withColumn("_g", F.lit(1))
    p = pred.select(*SPAN_KEY).distinct().withColumn("_p", F.lit(1))
    joined = g.join(p, SPAN_KEY, "full_outer")
    return joined.agg(
        F.coalesce(
            F.sum(F.when(F.col("_g").isNotNull() & F.col("_p").isNotNull(), 1).otherwise(0)),
            F.lit(0),
        ).alias("tp"),
        F.coalesce(F.sum(F.when(F.col("_g").isNull(), 1).otherwise(0)), F.lit(0)).alias("fp"),
        F.coalesce(F.sum(F.when(F.col("_p").isNull(), 1).otherwise(0)), F.lit(0)).alias("fn"),
    )


def strict_span_counts(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """Plan-only strict P/R (no driver .count() actions): full-outer join →
    one aggregation row. Composable into larger plans and usable as a
    driver-checkable query (rounded for oracle parity)."""
    agg = _strict_counts_plan(gold, pred)
    return agg.select(
        "tp",
        "fp",
        "fn",
        F.round(F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)), 6).alias("precision"),
        F.round(F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)), 6).alias("recall"),
    )


def strict_span_counts_by_type(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """Per-type strict P/R/F1 — the seqeval ``classification_report``
    analogue (``util/iob_util.py:354-364``, printed by ``BERT/evaluate.py:
    46-58``): one row per entity type with tp/fp/fn/precision/recall/f1.

    Same full-outer span join as :func:`strict_span_counts`, grouped by the
    ``type`` key column (coalesced across the join, so types present on only
    one side still report). Ratios rounded to 6 for oracle parity; zero
    denominators guarded with ``greatest(·, 1)`` so an all-miss type reads
    0.0, matching seqeval's zero_division=0 default."""
    g = gold.select(*SPAN_KEY).distinct().withColumn("_g", F.lit(1))
    p = pred.select(*SPAN_KEY).distinct().withColumn("_p", F.lit(1))
    joined = g.join(p, SPAN_KEY, "full_outer")
    agg = joined.groupBy("type").agg(
        F.sum(
            F.when(F.col("_g").isNotNull() & F.col("_p").isNotNull(), 1).otherwise(0)
        ).alias("tp"),
        F.sum(F.when(F.col("_g").isNull(), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("_p").isNull(), 1).otherwise(0)).alias("fn"),
    )
    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    return agg.select(
        "type",
        "tp",
        "fp",
        "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(F.lit(0.0)),
            6,
        ).alias("f1"),
    )


_RELAXED_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("tp", T.LongType()),
        T.StructField("fp", T.LongType()),
        T.StructField("fn", T.LongType()),
    ]
)


def relaxed_span_metrics(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """Per-type tp/fp/fn/precision/recall/f1 under the relaxed (Jaccard
    overlap, greedy matching) semantics. gold/pred: mention tables with
    token-position spans (start inclusive, end exclusive)."""

    def per_sentence(key, gold_pdf: pd.DataFrame, pred_pdf: pd.DataFrame):
        # token-position sets per entity; greedy Jaccard matching per type —
        # identical algorithm to oracle.relaxed but on span rows directly
        import numpy as np

        # deterministic entity order: ties in the greedy matching resolve
        # by (ti, pi), so the index order must not depend on shuffle order
        gold_pdf = gold_pdf.sort_values(["type", "start", "end"], kind="mergesort")
        pred_pdf = pred_pdf.sort_values(["type", "start", "end"], kind="mergesort")
        types = set(gold_pdf["type"]) | set(pred_pdf["type"])
        rows = []
        for ent_type in types:
            tt = [
                set(range(s, e))
                for s, e, t in zip(gold_pdf["start"], gold_pdf["end"], gold_pdf["type"])
                if t == ent_type
            ]
            pp = [
                set(range(s, e))
                for s, e, t in zip(pred_pdf["start"], pred_pdf["end"], pred_pdf["type"])
                if t == ent_type
            ]
            mat = np.zeros((len(tt), len(pp)))
            for ti, ts in enumerate(tt):
                for pi, ps in enumerate(pp):
                    mat[ti, pi] = len(ts & ps) / len(ts | ps)
            true_matched: list[int] = []
            pred_matched: list[int] = []
            while np.sum(mat > 0):
                best = mat.max()
                t_idx, p_idx = np.where(mat == best)
                for pi, ti in zip(p_idx, t_idx):
                    if ti in true_matched or pi in pred_matched:
                        continue
                    true_matched.append(ti)
                    pred_matched.append(pi)
                    mat[ti, pi] = 0
                mat[t_idx, p_idx] = 0
            rows.append(
                (
                    ent_type,
                    len(true_matched),
                    len(pp) - len(pred_matched),
                    len(tt) - len(true_matched),
                )
            )
        return pd.DataFrame(rows, columns=["type", "tp", "fp", "fn"])

    g = gold.select("url", "sent_id", "start", "end", "type")
    p = pred.select("url", "sent_id", "start", "end", "type")
    counts = (
        g.groupBy("url", "sent_id")
        .cogroup(p.groupBy("url", "sent_id"))
        .applyInPandas(per_sentence, schema=_RELAXED_SCHEMA)
    )
    agg = counts.groupBy("type").agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
    )
    return agg.select(
        "type",
        "tp",
        "fp",
        "fn",
        (F.col("tp") / F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") + F.col("fp")))
        .alias("precision"),
        (F.col("tp") / F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") + F.col("fn")))
        .alias("recall"),
        (
            F.col("tp")
            / F.when(
                F.col("tp") + 0.5 * (F.col("fp") + F.col("fn")) > 0,
                F.col("tp") + 0.5 * (F.col("fp") + F.col("fn")),
            )
        ).alias("f1"),
    )
