"""Mention pairing → (subj, pred, obj, count) triples.

Re-expresses the ADE-table pairing (``ade_table/ade_table.py:14-64``) as
joins + aggregation:

- per-document dedup (``list(set(...))``, :25-27)  → ``dropDuplicates``
- drug ``len >= 2`` floor (:31-33)                 → ``length() >= 2`` filter
- entity '' / ``len < 2`` drop post-normalize (:49-55)
- all-pairs per scope key (:29-61)                 → self-equi-join on the key
- "No Symptoms" for drug docs with zero symptom mentions *pre-normalization*
  (:41-46 — the empty check happens before the normalizer runs)
                                                   → ``left_anti`` join
- nested-dict counting                             → ``groupBy().count()``
  (map-side partial aggregation = the scale win), optionally **salted**:
  two-phase ``groupBy(subj, obj, salt) → groupBy(subj, obj)`` so one hot
  (drug, symptom) cell cannot pin a single reducer at 10^12 docs.

Scope: 'document' (reference behavior) or 'sentence'
(``ade_table/generate_table_from_xml_file.py:33-34``'s co-sentence variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NO_SYMPTOMS = "No Symptoms"
DEFAULT_PRED = "HAS_ADVERSE_EVENT"


def salted_count(
    df: DataFrame, keys: list[str], salt_buckets: int = 0, count_col: str = "count"
) -> DataFrame:
    """groupBy(keys).count() with optional explicit two-phase salting."""
    if salt_buckets and salt_buckets > 1:
        salted = df.withColumn(
            "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
        )
        partial = salted.groupBy(*keys, "_salt").agg(F.count("*").alias("_c"))
        return partial.groupBy(*keys).agg(F.sum("_c").alias(count_col))
    return df.groupBy(*keys).agg(F.count("*").alias(count_col))


def build_triples(
    mentions: DataFrame,
    subj_type: str = "drug",
    obj_type: str = "symptom",
    pred: str = DEFAULT_PRED,
    scope: str = "document",
    remove_duplicates: bool = True,
    use_canonical: bool = True,
    salt_buckets: int = 0,
    emit_no_symptoms: bool = True,
) -> DataFrame:
    """mentions(url, sent_id, type, word[, canonical]) → (subj, pred, obj, count).

    With ``use_canonical`` the normalized surface is paired (''-sentinel rows
    drop, reference :49-55); otherwise the raw surface.
    """
    keys = ["url"] if scope == "document" else ["url", "sent_id"]
    name = F.col("canonical") if use_canonical and "canonical" in mentions.columns else F.col("word")

    base = mentions.withColumn("_name", F.trim(name))

    syms_raw = base.filter(F.col("type") == obj_type)

    # the reference pairs raw drug surfaces (normalization applies to the
    # entity/symptom side in from_lists); drugs use the raw word
    drugs = (
        base.filter(F.col("type") == subj_type)
        .withColumn("_subj", F.trim(F.col("word")))
        .filter(F.length("_subj") >= 2)
        .select(*keys, "_subj")
    )
    # dedup happens on RAW surfaces before normalization (reference :25-27
    # dedups the raw list, THEN normalizes each member — two raw variants
    # that normalize to the same canonical still count twice)
    syms_src = syms_raw.dropDuplicates(keys + ["word"]) if remove_duplicates else syms_raw
    syms = (
        syms_src.withColumn("_obj", F.col("_name"))
        .filter((F.col("_obj") != "") & (F.length("_obj") >= 2))
        .select(*keys, "_obj")
    )
    if remove_duplicates:
        drugs = drugs.dropDuplicates(keys + ["_subj"])

    pairs = drugs.join(syms, keys, "inner").select(
        F.col("_subj").alias("subj"), F.col("_obj").alias("obj")
    )
    counted = salted_count(pairs, ["subj", "obj"], salt_buckets)

    if emit_no_symptoms:
        # pre-normalization presence test (reference :41 checks the raw list)
        sym_docs = syms_raw.select(*keys).distinct()
        lonely = (
            drugs.join(sym_docs, keys, "left_anti")
            .select(F.col("_subj").alias("subj"))
        )
        no_sym = salted_count(
            lonely.withColumn("obj", F.lit(NO_SYMPTOMS)), ["subj", "obj"], salt_buckets
        )
        counted = counted.unionByName(no_sym)

    return counted.select(
        "subj", F.lit(pred).alias("pred"), "obj", F.col("count")
    )


def pivot_table(
    triples: DataFrame, top_subj: int | None = None, top_obj: int | None = None
) -> DataFrame:
    """ADE matrix export (``ade_table/ade_table.py:67-97``): rows ordered by
    row-sum desc, optional top-k on both axes. Small-result export only."""
    totals = triples.groupBy("subj").agg(F.sum("count").alias("_total"))
    if top_subj:
        keep = totals.orderBy(F.desc("_total"), "subj").limit(top_subj)
        triples = triples.join(F.broadcast(keep.select("subj")), "subj")
    if top_obj:
        keep_o = (
            triples.groupBy("obj")
            .agg(F.sum("count").alias("_t"))
            .orderBy(F.desc("_t"), "obj")
            .limit(top_obj)
        )
        triples = triples.join(F.broadcast(keep_o.select("obj")), "obj")
    pivoted = (
        triples.groupBy("subj").pivot("obj").sum("count").na.fill(0)
    )
    return pivoted.join(totals, "subj").orderBy(F.desc("_total"), "subj").drop("_total")
