"""Launchability of the curation CLI: scripts/run_curation.py via
spark-submit --py-files, outputs checked against the in-process
curate_corpus result (same input, same parameters)."""

import json
import os
import shutil
import subprocess
import sys

from tests.test_spark_submit import _make_pkg_zip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def test_run_curation_spark_submit(spark, tmp_path):
    from pyspark.sql import functions as F

    from bert_namedentityrecognition_spark.operators.corpus import curate_corpus

    docs_path = os.path.join(SF_DIR, "documents.parquet")
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)
    out_dir = str(tmp_path / "curated")
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", _make_pkg_zip(tmp_path),
            os.path.join(REPO, "scripts", "run_curation.py"),
            "--docs-dir", docs_path,
            "--out", out_dir,
            "--scrub-pii",
        ],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    metrics = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert metrics["kept_docs"] > 0
    assert metrics["bins"] <= metrics["kept_docs"]

    # the CLI output equals the in-process composition on the same split
    d = spark.read.parquet(docs_path)
    expected = curate_corpus(
        d.filter(F.col("doc_id") % 23 != 0), d.filter(F.col("doc_id") % 23 == 0)
    )
    got = spark.read.parquet(os.path.join(out_dir, "packed"))
    assert sorted(
        map(tuple, got.select(*expected.columns).collect())
    ) == sorted(map(tuple, expected.collect()))
    kept = spark.read.parquet(os.path.join(out_dir, "kept"))
    assert kept.count() == metrics["kept_docs"]
