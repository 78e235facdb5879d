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


def test_spark_submit_checkpoint_model_path(spark, tmp_path):
    """North-star launch mode with a trained-checkpoint FILE: spark-submit
    --py-files + --checkpoint model.npz drives the numpy
    BertForTokenClassification forward (broadcast weights) end-to-end —
    the file-interchange claim of operators/bert_numpy.py proven through
    the real deployment surface."""
    from bert_namedentityrecognition_spark.operators.bert_numpy import (
        init_token_classifier_state,
        save_checkpoint,
    )
    from bert_namedentityrecognition_spark.operators.ner import (
        CharTokenizer,
        label_vocab_for_types,
    )
    from bert_namedentityrecognition_spark.oracle.textproc import han_to_zen
    from bert_namedentityrecognition_spark.sources import fixtures

    rows = fixtures.generate_pages(30, seed=21)
    pages_dir = str(tmp_path / "pages")
    fixtures.pages_to_spark(spark, rows).write.mode("overwrite").parquet(pages_dir)

    alphabet = sorted({c for r in rows if r["text"] for c in han_to_zen(r["text"])})
    tok = CharTokenizer(alphabet)
    vocab = label_vocab_for_types(["drug", "symptom"])
    sd = init_token_classifier_state(
        vocab_size=len(tok.itos), num_labels=len(vocab.itos), hidden=32,
        layers=1, heads=2, intermediate=64, seed=9,
    )
    ckpt = str(tmp_path / "model.npz")
    save_checkpoint(sd, ckpt, tokenizer_itos=tok.itos, label_itos=vocab.itos,
                    tokenizer_kind="char")

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)
    out_dir = str(tmp_path / "kg")
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", _make_pkg_zip(tmp_path),
            os.path.join(REPO, "scripts", "run_pipeline.py"),
            "--pages-dir", pages_dir,
            "--out", out_dir,
            "--checkpoint", ckpt,
        ],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    status = [l for l in proc.stdout.splitlines() if l.startswith('{"status"')]
    assert status, proc.stdout[-2000:]
    payload = json.loads(status[-1])
    assert payload["triple_rows"] >= 0
    assert os.path.isdir(f"{out_dir}/mentions")
