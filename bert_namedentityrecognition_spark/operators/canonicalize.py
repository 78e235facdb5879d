"""Alias canonicalization — connected components over alias edges.

The reference resolves aliases only implicitly (each normalizer maps surface
→ canonical in one hop; OICI recurses once, ``OICI_database.py:34-39``). At
KG scale alias chains (A→B→C) must collapse to one canonical id: connected
components via iterative min-id label propagation — pure DataFrame self-joins
(GraphFrames-free), the standard alternating contraction:

    label(v) ← min(label(v), min over neighbors(label(n)))

Each iteration is one shuffle on ``node``; ``localCheckpoint`` truncates the
growing lineage so plan size stays O(1) per iteration (critical for the
fixpoint loop at scale). Converges in O(diameter) iterations; alias chains
in practice are short (≤ 32 capped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iterations: int = 32, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """edges(src, dst) → (node, component) with component = min node id.

    Deterministic: component ids are the lexicographic min over each
    component (stable across partitionings and cluster sizes).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    sym = sym.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nmin"), F.col("component")) < F.col("component"))
                .cast("int")
                .alias("_changed"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        changed = updated.agg(F.sum("_changed")).collect()[0][0] or 0
        labels = updated.drop("_changed")
        if changed == 0:
            break
    return labels


def canonical_alias_map(alias_edges: DataFrame, dim: DataFrame) -> DataFrame:
    """Collapse alias chains onto dimension canonicals.

    alias_edges(src, dst): surface alias pairs. Returns
    (surface, canonical_surface): every member of a component maps to the
    component's representative — preferring a surface present in ``dim``
    (so chains terminate at a real canonical entity), else the min id.
    """
    comp = connected_components(alias_edges)
    dim_surfaces = dim.select(F.col("surface").alias("node")).distinct()
    rep = (
        comp.join(dim_surfaces.withColumn("_in_dim", F.lit(1)), "node", "left")
        .groupBy("component")
        .agg(
            F.min(F.when(F.col("_in_dim") == 1, F.col("node"))).alias("dim_rep"),
            F.min("node").alias("any_rep"),
        )
        .select(
            "component", F.coalesce("dim_rep", "any_rep").alias("canonical_surface")
        )
    )
    return comp.join(rep, "component").select(
        F.col("node").alias("surface"), "canonical_surface"
    )


def apply_alias_map(mentions: DataFrame, alias_map: DataFrame, col: str = "canonical") -> DataFrame:
    """Rewrite a canonical column through the (small, broadcast) alias map."""
    am = alias_map.withColumnRenamed("surface", col)
    return (
        mentions.join(F.broadcast(am), col, "left")
        .withColumn(col, F.coalesce("canonical_surface", F.col(col)))
        .drop("canonical_surface")
    )
