"""Launchability: the pipeline runs via spark-submit --py-files (the
north-star deployment mode), package shipped as a zip."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_pkg_zip(tmp_path) -> str:
    zpath = str(tmp_path / "kgspark.zip")
    pkg = os.path.join(REPO, "bert_namedentityrecognition_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_py_files(spark, tmp_path):
    from bert_namedentityrecognition_spark.sources import fixtures

    pages_dir = str(tmp_path / "pages")
    fixtures.pages_to_spark(spark, fixtures.generate_pages(60, seed=13)).write.mode(
        "overwrite"
    ).parquet(pages_dir)

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    out_dir = str(tmp_path / "kg")
    proc = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[4]",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            _make_pkg_zip(tmp_path),
            os.path.join(REPO, "scripts", "run_pipeline.py"),
            "--pages-dir",
            pages_dir,
            "--out",
            out_dir,
            "--pred-patterns",
            "中止したところ=IMPROVED_ON_WITHDRAWAL;処方した=PRESCRIBED_FOR",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # not the repo: imports must come from the zip
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    status = [l for l in proc.stdout.splitlines() if l.startswith('{"status"')]
    assert status, proc.stdout[-2000:]
    payload = json.loads(status[-1])
    assert payload["triple_rows"] > 0
    assert os.path.isdir(f"{out_dir}/triples")
    assert os.path.isdir(f"{out_dir}/edges")
    # pattern-based predicates flow through the CLI: non-default relations
    # appear alongside the default for unmatched sentences
    patterned = spark.read.parquet(f"{out_dir}/triples_patterned")
    preds = {r.pred for r in patterned.select("pred").distinct().collect()}
    assert "HAS_ADVERSE_EVENT" in preds
    assert preds & {"IMPROVED_ON_WITHDRAWAL", "PRESCRIBED_FOR"}, preds
