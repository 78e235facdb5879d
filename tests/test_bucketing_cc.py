"""Scale-evidence tests: bucketed-storage co-located joins, CC stress."""

import io
import random
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from bert_namedentityrecognition_spark.sources import fixtures


def test_bucketed_mentions_join_has_no_exchange(spark, tmp_path):
    """The 100 TB plan: mentions stored bucketed by url → the drug×symptom
    pairing join needs NO shuffle of either side. Verified on the physical
    plan of a bucketed self-join (the Exchange disappears vs the unbucketed
    plan)."""
    import shutil
    import uuid

    from bert_namedentityrecognition_spark.operators.tagger import extract_mentions

    pages = fixtures.pages_to_spark(spark, fixtures.generate_pages(80, seed=3))
    mentions = extract_mentions(pages, fixtures.pipeline_term_types())
    table = f"mb_{uuid.uuid4().hex[:8]}"
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    shutil.rmtree(f"{wh}/{table}", ignore_errors=True)
    (
        mentions.write.bucketBy(8, "url")
        .sortBy("url")
        .format("parquet")
        .mode("overwrite")
        .saveAsTable(table)
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # tiny test data would legitimately broadcast; disable it so the
        # planner exercises the at-scale strategy (bucketed co-located join)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        mb = spark.table(table)
        drugs = mb.filter(F.col("type") == "drug").select(
            "url", F.col("word").alias("subj")
        )
        syms = mb.filter(F.col("type") == "symptom").select(
            "url", F.col("word").alias("obj")
        )
        joined = drugs.join(syms, "url")
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain()
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan  # co-located
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def _python_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


def test_connected_components_stress(spark):
    """Random graph (chains, stars, cycles) vs a union-find oracle; min-id
    components must match exactly — and be independent of partitioning."""
    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = []
    for _ in range(90):
        edges.append((rng.choice(nodes), rng.choice(nodes)))
    # long chain to force multiple iterations
    for i in range(30):
        edges.append((f"c{i}", f"c{i+1}"))
    edges = [(a, b) for a, b in edges if a != b]

    from bert_namedentityrecognition_spark.operators.canonicalize import (
        connected_components,
    )

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.component for r in connected_components(df).collect()}

    want_parent = _python_components(edges)
    # canonical form: map each node to the min node id of its component
    comp_members = {}
    for n, root in want_parent.items():
        comp_members.setdefault(root, []).append(n)
    want = {}
    for members in comp_members.values():
        m = min(members)
        for n in members:
            want[n] = m
    assert got == want

    # partitioning independence
    got2 = {
        r.node: r.component
        for r in connected_components(df.repartition(13)).collect()
    }
    assert got2 == want


def test_salted_count_matches_plain(spark):
    from bert_namedentityrecognition_spark.operators.triples import salted_count

    df = spark.createDataFrame(
        [("a", "x")] * 500 + [("b", "y")] * 3, ["subj", "obj"]
    )
    plain = {(r.subj, r.obj): r["count"] for r in salted_count(df, ["subj", "obj"]).collect()}
    salted = {
        (r.subj, r.obj): r["count"]
        for r in salted_count(df, ["subj", "obj"], salt_buckets=8).collect()
    }
    assert plain == salted == {("a", "x"): 500, ("b", "y"): 3}


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in list(parent)}


def test_star_cc_equals_union_find(spark):
    """large-star/small-star vs a pure-Python union-find ground truth on
    adversarial shapes: long path (diameter >> rounds), star, clique,
    disjoint pairs, random."""
    import random

    from bert_namedentityrecognition_spark.operators.canonicalize import (
        connected_components_star,
    )

    rng = random.Random(13)
    shapes = {
        "path": [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(120)],
        "star": [("hub", f"s{i}") for i in range(40)],
        "clique": [(f"c{i}", f"c{j}") for i in range(8) for j in range(i + 1, 8)],
        "pairs": [(f"p{i}a", f"p{i}b") for i in range(20)],
        "random": [
            (f"r{rng.randrange(60):03d}", f"r{rng.randrange(60):03d}")
            for _ in range(80)
        ],
    }
    for name, edges in shapes.items():
        edges = [(a, b) for a, b in edges if a != b]
        want = _union_find_components(edges)
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {
            r.node: r.component
            for r in connected_components_star(df).collect()
        }
        assert got == want, f"shape {name} mismatch"


def test_propagation_cc_raises_on_diameter_above_cap(spark):
    """The plain propagation variant must fail LOUDLY (not silently return
    wrong labels) when a component's diameter exceeds the iteration cap."""
    import pytest

    from bert_namedentityrecognition_spark.operators.canonicalize import (
        connected_components,
    )

    path = [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(80)]
    df = spark.createDataFrame(path, ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iterations=10)


def test_alias_components_gate_needs_star_variant(spark):
    """kg_alias_components' fixture graph (chains of 40 in groups of 3 →
    ~41 hops from the farthest node to its component min) EXCEEDS plain label propagation's 32-round cap — the
    gate query genuinely pins connected_components_star, not the easy
    variant — and the star output matches the closed form 60*(node//60)."""
    import pytest
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from bert_namedentityrecognition_spark.operators.canonicalize import (
        connected_components,
    )

    df = E.queries()["kg_alias_components"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 1000
    assert all(r.component == 120 * (r.node // 120) for r in rows)

    ids = spark.range(1000)
    chain = ids.filter((F.col("id") > 0) & (F.col("id") % 40 != 0)).select(
        F.col("id").alias("src"), (F.col("id") - 1).alias("dst")
    )
    heads = ids.filter(
        (F.col("id") > 0)
        & (F.col("id") % 40 == 0)
        & ((F.col("id") / 40).cast("long") % 3 != 0)
    ).select(F.col("id").alias("src"), (F.col("id") - 40).alias("dst"))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain.union(heads))
