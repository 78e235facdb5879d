"""Graph materialization: id-keyed nodes/edges tables."""


from bert_namedentityrecognition_spark.plans.pipeline import run_kg_pipeline, write_outputs
from bert_namedentityrecognition_spark.sources import fixtures


def test_nodes_and_edges_resolve_entity_ids(spark, tmp_path):
    corpus = fixtures.generate_pages(100, seed=21)
    pages = fixtures.pages_to_spark(spark, corpus)
    dim = fixtures.entity_dim_to_spark(spark)
    out = run_kg_pipeline(pages, dim, fixtures.pipeline_term_types())

    nodes = out["nodes"].collect()
    assert nodes
    for n in nodes:
        assert n.entity_id is not None
        assert n.kind in ("drug", "symptom")
        assert n.mention_count >= n.doc_count >= 1

    edges = out["edges"].collect()
    assert edges
    dim_ids = {r.entity_id for r in dim.collect()}
    for e in edges:
        assert e.pred == "HAS_ADVERSE_EVENT"
        assert e["count"] >= 1
        # drug subjects are dictionary surfaces → must resolve to real ids;
        # No-Symptoms objects get the synthetic SURF: id
        if e.obj == "No Symptoms":
            assert e.dst_id == "SURF:No Symptoms"
        else:
            assert e.dst_id in dim_ids
    resolved_src = [e for e in edges if not e.src_id.startswith("SURF:")]
    assert len(resolved_src) > len(edges) * 0.8

    # edge counts must agree with the triples table
    t = {(r.subj, r.obj): r["count"] for r in out["triples"].collect()}
    g = {(r.subj, r.obj): r["count"] for r in out["edges"].collect()}
    assert t == g

    base = str(tmp_path / "kg")
    write_outputs(out, base)
    assert spark.read.parquet(f"{base}/edges").count() == len(edges)
    assert spark.read.parquet(f"{base}/nodes").count() == len(nodes)
    assert spark.read.parquet(f"{base}/mentions").count() > 0


def test_write_outputs_iceberg_requires_catalog(spark):
    """The V2 writeTo path is real code that fails only at catalog
    resolution in this jar-less sandbox (no silent parquet fallback)."""
    import pytest
    from pyspark.sql.utils import AnalysisException

    from bert_namedentityrecognition_spark.plans.pipeline import (
        write_outputs_iceberg,
    )

    mentions = spark.createDataFrame([("u1", 0, "w", "drug")],
                                     ["url", "sent_id", "word", "type"])
    with pytest.raises(AnalysisException):
        write_outputs_iceberg({"mentions": mentions, "triples": mentions,
                               "nodes": mentions}, "nocatalog.db.kg")
