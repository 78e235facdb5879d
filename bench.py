"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] in TWO time-separated windows (r4 VERDICT #4 —
the host's multi-minute burst windows shift every wall 5-16% in lockstep, so
one window cannot distinguish drift from regression; the scaling/ner/skew
sections run between the windows), then the KG-pipeline throughput scaling
check at two parallelism levels (local[N] vs local[4N] — the sandbox
stand-in for N vs 4N executors per BASELINE.md).

Prints ONE COMPACT JSON line (<1900 chars — the recording driver keeps only
a ~2000-char stdout tail; r3/r4 printed longer lines and their BENCH
artifacts landed unparsed):

    {"metric": ..., "value": <total headline sec, per-query min-of-windows>,
     "unit": "sec", "queries": {name: sec, ...}, "sf": ...,
     "headline_window_totals": [w1, w2],
     "kg_scaling": {"cores_low": N, "cores_high": 4N,
                    "scaling_efficiency": ..., ...},
     "full_artifact": "BENCH_FULL.json"}

The FULL result — per-window per-query trial lists ("query_trials" — sub-2s
queries run min-of-3, the rest min-of-2), the cross scaling pair local[2] vs
local[8] with its own host probe, skew reducer splits, ppjoin walls — is
written to BENCH_FULL.json at the repo root (checked in per round; var/ is
wiped between rounds, which is how the r3/r4 full histories were lost).

Further recorded sections: "ner_numpy" / "ner_numpy_wordpiece" (real-model
inference pages/s), "skew" (walls + deterministic reducer split), and
"ppjoin_openvocab" (naive vs prefix-filtered set-similarity join).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, KG_BENCH_PAGES (corpus
size, default 250000), KG_BENCH_TRIALS (base trials per scaling level,
default 2), KG_BENCH_CORES_LOW / KG_BENCH_CORES_HIGH (gate pair override),
and section skips: KG_BENCH_SKIP_SCALING, KG_BENCH_SKIP_CROSS,
KG_BENCH_SKIP_NER_NUMPY, KG_BENCH_SKIP_SKEW, KG_BENCH_SKIP_PPJOIN (=1).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "events_hourly",
    "events_sessionize",
    "kg_mentions",
    "kg_triples_codoc",
    "kg_normalize_lev",
    "kg_e2e_triples_lev",
    "doc_quality_filter",
    "text_stats",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
]

REPO = os.path.dirname(os.path.abspath(__file__))
BENCH_DATA = os.path.join(REPO, "var", "bench_pages")

# min-of-3 set (VERDICT r2 item 5): these sub-2s queries regressed 40-60%
# between r1 and r2 with UNCHANGED physical plans — burst host noise is a
# larger fraction of a short wall, so they get an extra trial and the trial
# lists land in the JSON so a regression can be adjudicated from the
# artifact itself
SUB2S_MIN3 = {
    "dedup_minhash_signatures",
    "text_stats",
    "doc_fingerprint",
    "dedup_exact",
}


def _noop_write(df):
    df.write.format("noop").mode("overwrite").save()


def run_headline(sf_dir: str, cores: int) -> tuple[dict, dict]:
    import __spark_entry__ as entrymod
    from bert_namedentityrecognition_spark.plans.session import build_session

    spark = build_session(app_name="bench", cores=cores, shuffle_partitions=cores)
    qs = entrymod.queries()
    # warm-up: JVM classloading + codegen + python workers once, so the
    # first query's number measures the query, not session bring-up
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).groupBy(
        "l_returnflag"
    ).count().collect()
    timings = {}
    trials_out = {}
    # min-of-N per query: the host shows burst slowdowns of 1.5-2x lasting
    # minutes; a single-shot timing judges the host's mood, not the plan
    for name in HEADLINE:
        fn = qs[name]
        # discarded per-query warm-up (r3 VERDICT #7): codegen compilation +
        # per-plan python-worker spin-up land here instead of inside trial 1
        # (the r3 artifact showed 2-4x first-trial bursts, e.g. q1 4.31->1.84)
        _noop_write(fn(spark, sf_dir))
        trials = []
        for _ in range(3 if name in SUB2S_MIN3 else 2):
            t0 = time.perf_counter()
            _noop_write(fn(spark, sf_dir))
            trials.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(trials)
        trials_out[name] = trials
    spark.stop()
    return timings, trials_out


def run_curation_bench(sf_dir: str, cores: int) -> dict:
    """Throughput of the composed curation pass (corpus_curation_e2e:
    quality → repetition → dedup → decontaminate → sample → pack) at the
    bench sf. Separate session, discarded warm-up, min-of-2 — same
    protocol as the headline queries, kept out of HEADLINE so the
    round-over-round headline total stays comparable."""
    import __spark_entry__ as entrymod
    from bert_namedentityrecognition_spark.plans.session import build_session

    spark = build_session(app_name="bench-curation", cores=cores, shuffle_partitions=cores)
    fn = entrymod.queries()["corpus_curation_e2e"]
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    _noop_write(fn(spark, sf_dir))  # discarded warm-up (codegen + workers)
    trials = []
    kept = 0
    for _ in range(2):
        t0 = time.perf_counter()
        kept = fn(spark, sf_dir).count()
        trials.append(round(time.perf_counter() - t0, 3))
    spark.stop()
    wall = min(trials)
    return {
        "wall_sec": wall,
        "trials": trials,
        "input_docs": n_docs,
        "kept_docs": kept,
        "docs_per_sec": round(n_docs / wall, 1) if wall else None,
    }


def _write_pages_parquet(rows: list[dict], out_dir: str, marker: str) -> str:
    """Deterministic pages corpus on disk (generated once, reused; marker
    file keyed on the corpus size). Written directly with pyarrow (no
    Spark) in 32 row-group-sized files so both parallelism levels see
    identical, well-split input — the ONE corpus-write contract both the
    scaling and skew benches depend on."""
    marker_path = os.path.join(out_dir, marker)
    if os.path.exists(marker_path):
        return out_dir
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us", tz="UTC")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    n_files = 32
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per]
        if not chunk:
            break
        table = pa.Table.from_pylist(chunk, schema=schema)
        pq.write_table(table, os.path.join(out_dir, f"part-{i:05d}.parquet"))
    open(marker_path, "w").close()
    return out_dir


def _ensure_bench_corpus(n_pages: int) -> str:
    marker = f".n{n_pages}"
    if os.path.exists(os.path.join(BENCH_DATA, marker)):
        return BENCH_DATA
    from bert_namedentityrecognition_spark.sources import fixtures

    rows = fixtures.generate_pages(n_pages, seed=42, min_sents=4, max_sents=12)
    return _write_pages_parquet(rows, BENCH_DATA, marker)


def run_kg_level(data_dir: str, cores: int) -> dict:
    """One scaling level: full KG pipeline (model path) at local[cores]."""
    from pyspark.sql import functions as F

    from bert_namedentityrecognition_spark.operators.ner import (
        DictionaryStubModel,
        label_vocab_for_types,
    )
    from bert_namedentityrecognition_spark.plans.pipeline import run_kg_pipeline
    from bert_namedentityrecognition_spark.plans.session import build_session
    from bert_namedentityrecognition_spark.sources import fixtures

    term_types = fixtures.pipeline_term_types()
    vocab = label_vocab_for_types(list(term_types.values()))
    spark = build_session(
        app_name=f"kg-bench-{cores}", cores=cores, shuffle_partitions=cores
    )
    pages = spark.read.parquet(data_dir)
    dim = fixtures.entity_dim_to_spark(spark)
    model = DictionaryStubModel(term_types, vocab, emulate_compute=True)
    # warm-up (excluded from timing): JVM + codegen via a small scan, plus
    # ALL python workers — limit(64).count() alone runs one task and spins
    # one worker, so at local[8] seven workers would cold-start inside the
    # timed region (fixed cost that depresses the high level's efficiency)
    pages.limit(64).count()
    _warm_python_workers(spark, cores)
    t0 = time.perf_counter()
    result = run_kg_pipeline(pages, dim, term_types, model=model, label_vocab=vocab)
    n_triples = result["triples"].agg(F.sum("count")).collect()[0][0]
    dt = time.perf_counter() - t0
    spark.stop()
    return {"cores": cores, "wall_sec": round(dt, 3), "n_triples": int(n_triples)}


def _warm_python_workers(spark, cores: int) -> None:
    """Start one Arrow python worker per core before the timed region
    (workers are reused afterwards: spark.python.worker.reuse)."""

    def _noop(batches):
        for pdf in batches:
            yield pdf

    spark.range(0, cores * 2, 1, cores * 2).mapInPandas(
        _noop, schema="id long"
    ).write.format("noop").mode("overwrite").save()


def run_ner_numpy_bench(
    cores: int, n_pages: int = 2000, tokenizer_kind: str = "char"
) -> dict:
    """Real-model inference data point: ner_pages with the numpy
    BertForTokenClassification forward (random-init weights) — measures the
    §2.6 model path's distributed throughput, complementing the
    gazetteer-stub scaling bench. ``tokenizer_kind='wordpiece'`` drives the
    sub-token path (piece tokenization + piece→char span lifting) so the
    alignment overhead is a measured number, not a guess."""
    import time as _t

    from bert_namedentityrecognition_spark.operators.bert_numpy import (
        init_token_classifier_state,
    )
    from bert_namedentityrecognition_spark.operators.ner import (
        CharTokenizer,
        NumpyTokenClassifier,
        label_vocab_for_types,
        ner_pages,
    )
    from bert_namedentityrecognition_spark.oracle.textproc import han_to_zen
    from bert_namedentityrecognition_spark.plans.session import build_session
    from bert_namedentityrecognition_spark.sources import fixtures

    rows = fixtures.generate_pages(n_pages, seed=7, min_sents=4, max_sents=12)
    alphabet = sorted(
        {c for r in rows[:200] if r["text"] for c in han_to_zen(r["text"])}
    )
    if tokenizer_kind == "wordpiece":
        from bert_namedentityrecognition_spark.oracle.wordpiece import (
            WordPieceTokenizer,
        )

        # char vocab + ## continuations + a few hot multi-char pieces so
        # words genuinely expand to >1 piece mid-word
        pieces = [d for d in fixtures.DRUGS[:8]] + ["##" + c for c in alphabet]
        tok = WordPieceTokenizer(alphabet + pieces)
    else:
        tok = CharTokenizer(alphabet)
    vocab = label_vocab_for_types(["drug", "symptom"])
    sd = init_token_classifier_state(
        vocab_size=len(tok.itos), num_labels=len(vocab.itos),
        hidden=64, layers=2, heads=4, intermediate=256, seed=0,
    )
    spark = build_session(
        app_name="ner-numpy-bench", cores=cores, shuffle_partitions=cores
    )
    pages = fixtures.pages_to_spark(spark, rows).repartition(cores * 4)
    model = NumpyTokenClassifier(sd, tok)
    _warm_python_workers(spark, cores)
    t0 = _t.perf_counter()
    n_mentions = ner_pages(pages, model, vocab, batch_size=16).count()
    dt = _t.perf_counter() - t0
    spark.stop()
    return {
        "n_pages": n_pages,
        "wall_sec": round(dt, 3),
        "pages_per_sec": round(n_pages / dt, 1),
        "n_mentions": int(n_mentions),
        "model": f"numpy-bert 2L/64H/4h random-init ({tokenizer_kind} tokenizer)",
        "tokenizer": tokenizer_kind,
    }


def _ensure_skew_corpus(n_pages: int) -> str:
    """Skewed pages corpus: hot drug in ~30% of pages, ONE hot
    (drug, symptom) cell — the SURVEY §4 skew shape."""
    import random

    out_dir = os.path.join(REPO, "var", "skew_pages")
    marker = f".n{n_pages}"
    if os.path.exists(os.path.join(out_dir, marker)):
        return out_dir
    from bert_namedentityrecognition_spark.sources import fixtures

    rng = random.Random(13)
    rows = []
    for i in range(n_pages):
        if i % 10 < 3:
            text = f"{fixtures.HOT_DRUG}を服用後、頭痛が出現した。"
        else:
            d = rng.choice(fixtures.DRUGS[1:])
            s = rng.choice(fixtures.SYMPTOMS[1:])
            text = f"{d}の投与により{s}を認めた。経過は良好である。"
        rows.append({"url": f"https://s/{i}", "warc_ts": None, "html": None,
                     "text": text, "lang": "ja"})
    return _write_pages_parquet(rows, out_dir, marker)


def _reducer_split(df, key_cols, n_parts: int) -> dict:
    """Per-reducer shuffle-row split of a would-be ``groupBy(key_cols)``
    exchange, computed DETERMINISTICALLY: Spark's hash partitioning assigns
    a row to ``pmod(murmur3(keys), P)`` and ``F.hash`` IS that Murmur3
    expression, so this replays the partitioner bit-for-bit — the numbers
    are pure plan math, immune to host windows (the defect of the wall-
    based skew claim, r3 VERDICT #4)."""
    import statistics

    from pyspark.sql import functions as F

    rows = [
        r["count"]
        for r in df.groupBy(
            F.pmod(F.hash(*[F.col(k) for k in key_cols]), F.lit(n_parts)).alias(
                "_r"
            )
        )
        .count()
        .collect()
    ]
    rows += [0] * (n_parts - len(rows))
    rows.sort()
    total = sum(rows)
    return {
        "max_rows": rows[-1],
        "median_rows": int(statistics.median(rows)),
        "total_rows": total,
        "max_share": round(rows[-1] / total, 3) if total else 0.0,
    }


def run_skew_bench(cores: int, n_pages: int = 40000) -> dict:
    """Skewed-corpus salting evidence, reducer-based (r3 VERDICT #4): the
    primary claim is the DETERMINISTIC per-reducer row split of the pairing
    exchange — plain ``(subj, obj)`` keys pin the hot cell's rows on one
    reducer; salted ``(subj, obj, salt)`` keys flatten max/median — which
    no host window can flip. Wall times for the full pipeline are recorded
    too, with the honest note that for groupBy().count() map-side partial
    aggregation already collapses the hot cell before the wire, so salting
    is ~free insurance there; the split quantifies its real target:
    aggregations whose partial state doesn't collapse (collect_list /
    collect_set). AQE skew-join splitting (on in build_session) covers the
    join side. Identical output plain vs salted is asserted in
    tests/test_skew_evidence.py.
    """
    import time as _t

    from pyspark.sql import functions as F

    from bert_namedentityrecognition_spark.operators.normalize import (
        normalize_mentions,
    )
    from bert_namedentityrecognition_spark.operators.tagger import extract_mentions
    from bert_namedentityrecognition_spark.operators.triples import build_pairs
    from bert_namedentityrecognition_spark.plans.pipeline import run_kg_pipeline
    from bert_namedentityrecognition_spark.plans.session import build_session
    from bert_namedentityrecognition_spark.sources import fixtures

    SALT = 32  # ONE constant: the pipeline salt AND the reducer-split salt
    data_dir = _ensure_skew_corpus(n_pages)
    tt = fixtures.pipeline_term_types()
    out = {"n_pages": n_pages, "hot_cell_share": 0.3, "salt_buckets": SALT}
    for label, salt in (("plain", 0), ("salted", SALT)):
        spark = build_session(app_name=f"skew-{label}", cores=cores,
                              shuffle_partitions=cores)
        pages = spark.read.parquet(data_dir)
        dim = fixtures.entity_dim_to_spark(spark)
        pages.limit(64).count()
        _warm_python_workers(spark, cores)
        t0 = _t.perf_counter()
        res = run_kg_pipeline(pages, dim, tt, salt_buckets=salt, persist=False)
        n = res["triples"].agg(F.sum("count")).collect()[0][0]
        out[f"wall_sec_{label}"] = round(_t.perf_counter() - t0, 3)
        out["n_triples"] = int(n)
        if label == "salted":
            # reducer split of the counting exchange, on the exact pair
            # stream the pipeline aggregates (same session, data cached)
            mentions = extract_mentions(pages, tt)
            pairs = build_pairs(normalize_mentions(mentions, dim)).persist()
            out["reducer_split_plain"] = _reducer_split(
                pairs, ["subj", "obj"], cores
            )
            salted_pairs = pairs.withColumn(
                "_salt", (F.rand(seed=42) * SALT).cast("int")
            )
            out["reducer_split_salted"] = _reducer_split(
                salted_pairs, ["subj", "obj", "_salt"], cores
            )
            pairs.unpersist()
        spark.stop()
    out["skew_note"] = (
        "reducer_split_* is deterministic partitioner math (pmod(murmur3)) "
        "— the salting claim; walls show salting is ~free for the "
        "map-side-combining count agg"
    )
    return out


def run_ppjoin_bench(cores: int, n_docs: int = 15000) -> dict:
    """Open-vocabulary regime: naive vs PPJoin set-similarity join on a
    boilerplate-bearing web-like corpus (identical output asserted in
    tests/test_ppjoin_openvocab.py; here the wall-time evidence that the
    auto default picks the winning plan in each regime)."""
    import time as _t

    from bert_namedentityrecognition_spark.operators.dedup import (
        naive_join_blowup,
        ngram_jaccard_pairs,
        token_shingles,
    )
    from bert_namedentityrecognition_spark.plans.session import build_session
    from tests.test_ppjoin_openvocab import _web_docs

    spark = build_session(app_name="ppjoin-bench", cores=cores,
                          shuffle_partitions=max(cores, 32))
    docs = spark.createDataFrame(
        _web_docs(n_docs, boiler_share=0.3, seed=5), "doc_id long, text string"
    ).repartition(32).cache()
    docs.count()
    _warm_python_workers(spark, cores)
    out = {
        "n_docs": n_docs,
        "blowup_probe": round(naive_join_blowup(token_shingles(docs), sample_mod=8), 1),
    }
    for label, pf in (("naive", False), ("ppjoin", True)):
        t0 = _t.perf_counter()
        n = ngram_jaccard_pairs(docs, threshold=0.6, prefix_filter=pf).count()
        out[f"wall_sec_{label}"] = round(_t.perf_counter() - t0, 3)
        out[f"rows_{label}"] = int(n)
    spark.stop()
    # self-validating evidence: a pruning regression that only bites at
    # this scale must fail the bench, not advertise a wrong-answer speedup
    assert out["rows_naive"] == out["rows_ppjoin"], out
    out["ppjoin_speedup"] = round(out["wall_sec_naive"] / out["wall_sec_ppjoin"], 2)
    return out


def _run_level_subprocess(data_dir: str, cores: int) -> dict | None:
    """Each level runs in a fresh process -> fresh JVM, identical starting
    conditions for both parallelism levels (a shared JVM carries heap/GC
    state from whatever ran before and skews the comparison).

    A trial that exceeds the timeout (a burst-stalled host window, per the
    module docstring up to 24×) returns ``None`` instead of raising — one
    bad window must not abort the whole bench and lose every completed
    section's numbers."""
    import subprocess

    code = (
        "import sys, json; sys.path.insert(0, %r); import bench; "
        "print('KGLEVEL ' + json.dumps(bench.run_kg_level(%r, %d)))"
        % (REPO, data_dir, cores)
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=1200,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in proc.stdout.splitlines():
        if line.startswith("KGLEVEL "):
            return json.loads(line[len("KGLEVEL "):])
    raise RuntimeError(f"scaling level failed: {proc.stderr[-2000:]}")


def _host_burn(_):
    """Fixed CPU work quantum for the host-delivery probe (BLAS pinned)."""
    import time as _t

    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((256, 256)).astype("float32")
    t0 = _t.perf_counter()
    for _ in range(400):
        a = np.tanh(a @ a) * 0.5
    return _t.perf_counter() - t0


def host_per_proc_seconds(k: int, repeats: int = 6) -> float:
    """Best-case per-process wall for the fixed quantum with k concurrent
    processes. Measures what the HOST delivers per core at that concurrency
    — this VM's per-proc throughput degrades ~2× going 2 → 8+ busy procs
    in its best windows, with burst stalls up to 24× in bad ones, which
    depresses any raw scaling number independent of the engine under test.
    Min over repeats pairs with the min-of-trials Spark walls: both estimate
    the best-window state at their concurrency."""
    import multiprocessing as mp

    best = float("inf")
    for _ in range(repeats):
        with mp.Pool(k) as p:
            per = p.map(_host_burn, range(k))
        best = min(best, sum(per) / len(per))
    return best


def run_kg_scaling(
    n_pages: int,
    cores_low: int,
    cores_high: int,
    trials: int | None = None,
    adaptive: bool = True,
) -> dict:
    """Min-of-N wall per level: the host VM shows ±15% steal-time noise, and
    the minimum is the best estimate of the engine's steady-state throughput
    at each level (identical code, identical input, fresh JVM per trial).

    Reports BOTH raw scaling efficiency and a host-normalized one: the
    pure-CPU probe measures how much per-process throughput the host itself
    loses between the two concurrency levels (a perfectly scaling engine
    cannot beat that), and the normalized figure divides that host loss
    out. On a real multi-executor cluster, executors own their cores, so
    the normalized number is the cluster-relevant one; the raw number
    measures this shared VM."""
    if trials is None:
        trials = int(os.environ.get("KG_BENCH_TRIALS", "2"))
    data_dir = _ensure_bench_corpus(n_pages)
    out = {
        "cores_low": cores_low,
        "cores_high": cores_high,
        "n_pages": n_pages,
        # base count only — the high level runs max(base, 3) and adaptive
        # mode may add more; the authoritative per-level protocol is the
        # LENGTH of each wall_sec_*_trials list
        "trials_base": trials,
    }
    for label, cores in (("low", cores_low), ("high", cores_high)):
        # asymmetric sampling: the high level is ~3× cheaper per trial AND
        # noisier (burst stalls hit concurrent procs harder, and a short run
        # can sit entirely inside one bad window), so spend the extra trials
        # where variance lives
        n_trials = trials if label == "low" else max(trials, 3)
        walls = []
        n_timeouts = 0
        n_triples = None
        for _ in range(n_trials):
            lv = _run_level_subprocess(data_dir, cores)
            if lv is None:
                n_timeouts += 1
                continue
            walls.append(lv["wall_sec"])
            n_triples = lv["n_triples"]
        # adaptive extra trials: keep sampling (bounded) until the best two
        # agree within 5% — a single good window is not a steady-state
        # estimate, two agreeing ones are. Disabled for the cross-check
        # pair (it documents the host, it is not the gate — unbounded
        # retries there cost ~10 min for no decision value)
        while adaptive and len(walls) + n_timeouts < n_trials + 3:
            best2 = sorted(walls)[:2]
            if len(walls) >= 2 and (best2[1] - best2[0]) / best2[0] <= 0.05:
                break
            lv = _run_level_subprocess(data_dir, cores)
            if lv is None:
                n_timeouts += 1
                continue
            walls.append(lv["wall_sec"])
        if not walls:
            raise RuntimeError(
                f"every {label}-level trial timed out ({n_timeouts}); "
                "host unusable for a scaling measurement in this window"
            )
        if n_timeouts:
            out[f"n_timeouts_{label}"] = n_timeouts
        wall = min(walls)
        out[f"wall_sec_{label}"] = wall
        out[f"wall_sec_{label}_trials"] = walls
        out[f"triples_per_sec_{label}"] = round(n_triples / wall, 1)
        out[f"pages_per_sec_{label}"] = round(n_pages / wall, 1)
        out["n_triples"] = n_triples
    speedup = out["triples_per_sec_high"] / out["triples_per_sec_low"]
    out["speedup"] = round(speedup, 3)
    raw_eff = speedup / (cores_high / cores_low)
    out["scaling_efficiency"] = round(raw_eff, 3)
    per_low = host_per_proc_seconds(cores_low)
    per_high = host_per_proc_seconds(cores_high)
    out["host_per_proc_sec_low"] = round(per_low, 3)
    out["host_per_proc_sec_high"] = round(per_high, 3)
    # clamp at 1: more concurrency cannot physically speed the host's
    # per-proc delivery — a measured ratio < 1 only means the two probes
    # sampled different host windows (seen: 0.157 when the low-k probe hit
    # a burst stall), and normalizing by it would corrupt the figure
    host_factor = max(1.0, per_high / per_low)
    out["host_cpu_factor"] = round(host_factor, 3)
    out["scaling_efficiency_host_normalized"] = round(
        min(1.0, raw_eff * host_factor), 3
    )
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    # headline window 1 of 2 (r4 VERDICT #4): the host shows multi-minute
    # burst windows that shift every per-query wall 5-16% in lockstep with
    # UNCHANGED plans; a single window cannot distinguish host drift from a
    # plan regression. Window 2 runs at the END of main() — the scaling /
    # ner / skew / ppjoin sections between them (~20-40 min) guarantee the
    # two samples sit in different host windows. The headline figure of
    # record ("queries"/"value") is the per-query min across both windows.
    t_w1 = time.time()
    timings_w1, trials_w1 = run_headline(sf_dir, cores)

    result = {
        "metric": "headline_queries_total",
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cores": cores,
    }

    if os.environ.get("KG_BENCH_SKIP_SCALING", "0") != "1":
        # Pair choice N=1 vs 4N=4: the pure-CPU host probe shows this shared
        # VM delivers 2-3× LESS per-process CPU at 8 busy procs than at 2
        # (window-dependent), so the 2→8 pair's raw efficiency tracks the
        # HOST's mood, not the engine — measured 0.67-0.87 across windows
        # with identical code. At 1→4 busy procs host delivery is ~flat and
        # the raw number is reproducible: 0.89 measured in the same window
        # where 2→8 read 0.69. The 2→8 pair remains available via
        # KG_BENCH_CORES_LOW/HIGH for cross-checking; the host probe +
        # host-normalized figure are reported either way.
        # 250k pages keeps the local[4] level ~85 s — far above the zone
        # where fixed per-run costs (worker spin-up now pre-warmed) bite.
        n_pages = int(os.environ.get("KG_BENCH_PAGES", "250000"))
        c_lo = int(os.environ.get("KG_BENCH_CORES_LOW", "1"))
        c_hi = int(os.environ.get("KG_BENCH_CORES_HIGH", str(4 * c_lo)))
        result["kg_scaling"] = run_kg_scaling(n_pages, c_lo, c_hi)
        if os.environ.get("KG_BENCH_SKIP_CROSS", "0") != "1":
            # cross-check pair (VERDICT r2 item 6): the 2→8 numbers used to
            # live only in BASELINE.md prose; record them in the artifact so
            # both pairs + both host probes travel together. Raw 2→8 reads
            # 0.67-0.87 purely with host windows (the probe quantifies the
            # per-proc CPU the host withdraws at 8 busy procs); the
            # host-normalized figure is the cluster-relevant one.
            # min-of-3 BOTH levels (r3 VERDICT #3) so a single bad window
            # at either level cannot decide the pair
            result["kg_scaling_cross"] = run_kg_scaling(
                n_pages, 2, 8, trials=3, adaptive=False
            )

    if os.environ.get("KG_BENCH_SKIP_NER_NUMPY", "0") != "1":
        result["ner_numpy"] = run_ner_numpy_bench(cores)
        result["ner_numpy_wordpiece"] = run_ner_numpy_bench(
            cores, tokenizer_kind="wordpiece"
        )

    if os.environ.get("KG_BENCH_SKIP_SKEW", "0") != "1":
        result["skew"] = run_skew_bench(cores)

    if os.environ.get("KG_BENCH_SKIP_PPJOIN", "0") != "1":
        result["ppjoin_openvocab"] = run_ppjoin_bench(cores)

    if os.environ.get("KG_BENCH_SKIP_CURATION", "0") != "1":
        result["curation"] = run_curation_bench(sf_dir, cores)

    # headline window 2 of 2 (see comment at window 1). Skippable for quick
    # iteration runs; the figure of record then degrades to one window.
    if os.environ.get("KG_BENCH_SKIP_HEADLINE_W2", "0") != "1":
        t_w2 = time.time()
        timings_w2, trials_w2 = run_headline(sf_dir, cores)
    else:
        t_w2, timings_w2, trials_w2 = None, {}, {}

    timings = {
        q: min(v for v in (timings_w1.get(q), timings_w2.get(q)) if v is not None)
        for q in timings_w1
    }
    result["value"] = round(sum(timings.values()), 3)
    result["queries"] = timings
    # full per-window evidence: totals, per-query mins, raw trial lists and
    # the wall-clock separation between the two samples
    result["headline_windows"] = [
        w
        for w in (
            {
                "window": 1,
                "total": round(sum(timings_w1.values()), 3),
                "queries": timings_w1,
                "query_trials": trials_w1,
            },
            {
                "window": 2,
                "total": round(sum(timings_w2.values()), 3),
                "queries": timings_w2,
                "query_trials": trials_w2,
                "minutes_after_window1": round((t_w2 - t_w1) / 60.0, 1)
                if t_w2
                else None,
            }
            if timings_w2
            else None,
        )
        if w
    ]
    # back-compat: older artifacts carried one flat trial list
    result["query_trials"] = {
        q: trials_w1.get(q, []) + trials_w2.get(q, []) for q in timings_w1
    }

    # Full evidence goes to a FILE; stdout gets a compact line. The driver
    # that records BENCH_r{N}.json keeps only the last ~2000 chars of
    # stdout and json-parses that: rounds 3 and 4 printed one JSON line
    # >2000 chars and both artifacts landed with parsed=null — the full
    # sections (trial lists, per-window probes) were lost when var/ was
    # wiped between rounds. BENCH_FULL.json is checked in per round so the
    # complete history survives.
    with open(os.path.join(REPO, "BENCH_FULL.json"), "w") as f:
        json.dump(result, f, indent=1)

    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "sec",
        "queries": result["queries"],
        "sf": result["sf"],
        "cores": cores,
        "headline_window_totals": [
            w["total"] for w in result["headline_windows"]
        ],
        "full_artifact": "BENCH_FULL.json",
    }
    _SCALING_KEYS = (
        "cores_low", "cores_high", "n_pages", "wall_sec_low", "wall_sec_high",
        "speedup", "scaling_efficiency", "host_cpu_factor",
        "scaling_efficiency_host_normalized",
    )
    for sec in ("kg_scaling", "kg_scaling_cross"):
        if sec in result:
            compact[sec] = {
                k: result[sec][k] for k in _SCALING_KEYS if k in result[sec]
            }
    for sec in ("ner_numpy", "ner_numpy_wordpiece"):
        if sec in result:
            compact[sec + "_pages_per_sec"] = result[sec]["pages_per_sec"]
    if "skew" in result:
        compact["skew_max_share"] = {
            "plain": result["skew"]["reducer_split_plain"]["max_share"],
            "salted": result["skew"]["reducer_split_salted"]["max_share"],
        }
    if "ppjoin_openvocab" in result:
        compact["ppjoin_speedup"] = result["ppjoin_openvocab"]["ppjoin_speedup"]
    if "curation" in result:
        compact["curation_docs_per_sec"] = result["curation"]["docs_per_sec"]
    line = json.dumps(compact)
    if len(line) > 1900:  # hard budget: the driver's stdout tail is 2000
        for k in ("skew_max_share", "kg_scaling_cross", "queries"):
            compact.pop(k, None)
            line = json.dumps(compact)
            if len(line) <= 1900:
                break
    print(line)


if __name__ == "__main__":
    main()
