"""Regression pins for the round-4 ADVICE items fixed in round 5."""
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_apply_alias_map_rep_is_kind_aware_and_deterministic(spark):
    """A surface present in dim under TWO kinds must hand back the ids of
    the MENTION's kind, not an arbitrary row-order-dependent one (the old
    dropDuplicates(['canonical_surface']) pick)."""
    from bert_namedentityrecognition_spark.operators.canonicalize import (
        apply_alias_map,
    )

    # "アスピリン" exists as a drug row AND (pathologically) a symptom row;
    # dim row order puts the symptom row first so the old arbitrary pick
    # would plausibly hand S9's ids to a drug mention.
    dim = spark.createDataFrame(
        [
            ("S9", "アスピリン", "アスピリン", "Z9", "symptom", None),
            ("D1", "アスピリン", "アスピリン", "A1", "drug", None),
        ],
        "entity_id string, surface string, canonical string, code string, "
        "kind string, human_check string",
    )
    alias_map = spark.createDataFrame(
        [("バファリン", "アスピリン")], ["surface", "canonical_surface"]
    )
    mentions = spark.createDataFrame(
        [(1, "バファリン", "drug", "バファリン", "D0", "C0")],
        "doc_id long, word string, type string, canonical string, "
        "entity_id string, code string",
    )
    out = apply_alias_map(mentions, alias_map, dim=dim).collect()
    assert len(out) == 1
    assert out[0].canonical == "アスピリン"
    assert out[0].entity_id == "D1"  # the drug row, not the symptom row
    assert out[0].code == "A1"


def test_apply_alias_map_falls_back_kind_agnostic_min(spark):
    """Representative surface with NO dim row for the mention's kind falls
    back to the value-deterministic (min canonical/entity_id/code) row
    across kinds — still stable, never row-order-dependent."""
    from bert_namedentityrecognition_spark.operators.canonicalize import (
        apply_alias_map,
    )

    dim = spark.createDataFrame(
        [
            ("S2", "頭痛", "頭痛", "I2", "symptom", None),
            ("S1", "頭痛", "頭痛", "I1", "symptom", None),
        ],
        "entity_id string, surface string, canonical string, code string, "
        "kind string, human_check string",
    )
    alias_map = spark.createDataFrame(
        [("ずつう", "頭痛")], ["surface", "canonical_surface"]
    )
    mentions = spark.createDataFrame(
        [(1, "ずつう", "drug", "ずつう", "D0", "C0")],
        "doc_id long, word string, type string, canonical string, "
        "entity_id string, code string",
    )
    out = apply_alias_map(mentions, alias_map, dim=dim).collect()
    assert out[0].entity_id == "S1"  # min over (canonical, entity_id, code)
    assert out[0].code == "I1"


def test_embedding_cosine_overflow_guard_raises_loudly(spark):
    """Products past the decimal(38) bound must RAISE, not NULL-drop the
    pair: shrink the bound via a huge threshold_den so tiny docs trip it.
    Two loud paths are acceptable: under ANSI (the session default) Spark
    itself raises NUMERIC_VALUE_OUT_OF_RANGE on the dot²·den product;
    under non-ANSI that product NULLs silently and OUR raise_error guard
    on the na·nb side fires instead. Either way: an exception, never a
    silently-dropped pair."""
    from bert_namedentityrecognition_spark.operators.dedup import (
        embedding_cosine_dups,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")], ["doc_id", "text"]
    )
    loud = "overflow-safe bound|NUMERIC_VALUE_OUT_OF_RANGE|cannot be represented"
    with pytest.raises(Exception, match=loud):
        embedding_cosine_dups(
            docs, threshold_num=1, threshold_den=10**37
        ).collect()
    ansi = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        with pytest.raises(Exception, match=loud):
            embedding_cosine_dups(
                docs, threshold_num=1, threshold_den=10**37
            ).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi)


def test_stateful_keeper_is_global_min_across_chunks():
    """The in-batch keeper must be the min doc_id over the whole group, not
    per-Arrow-chunk: drive the update kernel directly with a group split
    across two chunks where the SECOND chunk holds the lower doc_id."""
    from bert_namedentityrecognition_spark.streaming.stateful import (
        _make_update_fn,
    )

    class FakeState:
        exists = False

        def update(self, v):
            self.exists, self.get = True, v

    update = _make_update_fn()
    st = FakeState()
    chunks = iter(
        [
            pd.DataFrame({"doc_id": [7], "fingerprint": ["f"]}),
            pd.DataFrame({"doc_id": [3], "fingerprint": ["f"]}),
        ]
    )
    out = pd.concat(list(update(("f",), chunks, st)), ignore_index=True)
    flags = dict(zip(out["doc_id"], out["is_duplicate"]))
    assert flags == {3: False, 7: True}  # global min keeps, not chunk-local
    assert st.get == (2,)


def test_bucketed_join_table_is_write_once_per_source(spark):
    """kg_bucketed_join must REUSE its bucketed catalog table on repeat
    invocations in one session (write-once/query-many at scale — r4
    VERDICT nit): the stored parquet part files' mtimes must not change
    between calls, and the results must be identical."""
    import glob
    import os
    from urllib.parse import unquote, urlparse

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    r1 = {tuple(r) for r in E.queries()["kg_bucketed_join"](spark, sf).collect()}
    p = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    loc = os.path.join(unquote(p.path), "kgb_mentions_sf0_001")
    parts = sorted(glob.glob(os.path.join(loc, "part-*")))
    assert parts, loc
    mtimes = [os.stat(f).st_mtime_ns for f in parts]
    r2 = {tuple(r) for r in E.queries()["kg_bucketed_join"](spark, sf).collect()}
    assert r2 == r1
    assert [os.stat(f).st_mtime_ns for f in sorted(
        glob.glob(os.path.join(loc, "part-*")))] == mtimes
    # stale marker (changed testdata identity) forces a rewrite
    with open(os.path.join(loc, "_KGB_SOURCE"), "w") as fh:
        fh.write("stale")
    E.queries()["kg_bucketed_join"](spark, sf).count()
    assert open(os.path.join(loc, "_KGB_SOURCE")).read() != "stale"
