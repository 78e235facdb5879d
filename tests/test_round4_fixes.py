"""Regression pins for the round-3 ADVICE items fixed in round 4."""
import zipfile

import numpy as np


def _abs_target_xlsx(path: str) -> None:
    """Workbook whose rels use ABSOLUTE part targets ('/xl/worksheets/…') —
    valid OPC, and the round-3 code turned them into 'xl/xl/…' (never in
    the zip) so such files silently fell back to filename order."""
    main = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    relns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

    def sheet_xml(k):
        return (
            f'<worksheet xmlns="{main}"><sheetData>'
            f'<row r="1"><c r="A1" t="inlineStr"><is><t>col</t></is></c></row>'
            f'<row r="2"><c r="A2" t="inlineStr"><is><t>v{k}</t></is></c></row>'
            f"</sheetData></worksheet>"
        )

    # declared order: sheet2 first — filename-order fallback would flip it
    sheets = (
        f'<sheet name="B" sheetId="1" r:id="rId1"/>'
        f'<sheet name="A" sheetId="2" r:id="rId2"/>'
    )
    workbook = (
        f'<workbook xmlns="{main}" xmlns:r="{relns}"><sheets>{sheets}</sheets></workbook>'
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f'<Relationship Id="rId1" Type="{relns}/worksheet" Target="/xl/worksheets/sheet2.xml"/>'
        f'<Relationship Id="rId2" Type="{relns}/worksheet" Target="/xl/worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml(1))
        zf.writestr("xl/worksheets/sheet2.xml", sheet_xml(2))


def test_xlsx_sheet_order_handles_absolute_rel_targets(tmp_path):
    from bert_namedentityrecognition_spark.sources.dims import read_xlsx_rows

    p = str(tmp_path / "abs.xlsx")
    _abs_target_xlsx(p)
    # declared order resolves through the absolute targets: sheet2 first
    assert read_xlsx_rows(p, sheet_index=0) == [{"col": "v2"}]
    assert read_xlsx_rows(p, sheet_index=1) == [{"col": "v1"}]


def test_checkpoint_resave_roundtrip(tmp_path):
    """save→load→save again with explicit vocab args must not raise
    duplicate-kwarg (the loaded dict already carries _meta.*) and the
    explicit args must win."""
    from bert_namedentityrecognition_spark.operators.bert_numpy import (
        load_checkpoint,
        save_checkpoint,
    )

    sd = {"classifier.weight": np.zeros((3, 4), dtype=np.float32)}
    p1 = str(tmp_path / "a.npz")
    save_checkpoint(sd, p1, tokenizer_itos=["x", "y"], label_itos=["O", "B"],
                    tokenizer_kind="char")
    loaded = load_checkpoint(p1)
    assert "_meta.tokenizer_itos" in loaded
    p2 = str(tmp_path / "b.npz")
    # re-save the loaded dict WITH explicit args — crashed before the fix
    save_checkpoint(loaded, p2, tokenizer_itos=["x", "y", "z"],
                    label_itos=["O", "B"], tokenizer_kind="char")
    again = load_checkpoint(p2)
    assert list(again["_meta.tokenizer_itos"]) == ["x", "y", "z"]
    assert list(again["_meta.label_itos"]) == ["O", "B"]


def test_guarded_neardup_driver_fixture_fires_both_branches(spark):
    """The dedup_embedding_neardup_guarded driver query's parameters must
    actually exercise the hot-bucket guard (r3 VERDICT 'what's wrong' #1):
    on the same embeddings fixture, the split levels run AND some final
    buckets stay hot with pairs_skipped > 0, while others are small."""
    from pyspark.sql import functions as F

    from __spark_entry__ import _GUARD_DIV, _GUARD_W
    from bert_namedentityrecognition_spark.operators.similarity import (
        embedding_near_dup_bucket_stats,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cap = max(8, emb.count() // _GUARD_DIV)
    stats = embedding_near_dup_bucket_stats(
        emb, m_bits=2, dim=64, bucket_cap=cap, rehash_levels=2,
        rehash_bits=1, neighbor_window=_GUARD_W,
    ).collect()
    hot = [r for r in stats if r.truncated]
    small = [r for r in stats if not r.truncated]
    assert hot and small, (len(hot), len(small))
    assert sum(r.pairs_skipped for r in hot) > 0
    # split actually ran: some final keys carry the '/' re-hash suffix
    assert any("/" in r.key for r in stats)


def _brute_pairs(rows, t):
    import numpy as np

    out = set()
    for i, (ia, va) in enumerate(rows):
        for ib, vb in rows[i + 1 :]:
            a, b = np.asarray(va), np.asarray(vb)
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            if na > 0 and nb > 0 and float(a @ b) / (na * nb) >= t:
                out.add((ia, ib))
    return out


def test_neardup_multiprobe_recall_vs_brute(spark):
    """The multi_probe=1 dial must strictly raise pair recall vs single
    probe on the clustered embeddings fixture, measured against brute-force
    cosine ground truth (r3 VERDICT #8)."""
    from bert_namedentityrecognition_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = [(r.vec_id, list(r.embedding)) for r in emb.collect()]
    truth = _brute_pairs(rows, 0.4)
    assert truth

    def got(mp):
        df = embedding_near_dup_pairs(
            emb, threshold=0.4, m_bits=2, dim=64, bucket_cap=10**9,
            multi_probe=mp,
        )
        return {(r.vec_a, r.vec_b) for r in df.collect()}

    single, multi = got(0), got(1)
    assert single <= truth and multi <= truth  # LSH never invents pairs
    r_single = len(single & truth) / len(truth)
    r_multi = len(multi & truth) / len(truth)
    assert r_multi > r_single, (r_single, r_multi)
    assert single <= multi  # strictly additive candidates


def test_neardup_multiprobe_excludes_hot_buckets(spark):
    """multi_probe with the guard active: hot-bucket rows are excluded from
    cross-bucket expansion (no k·|neighbor| blowup), same-bucket guard
    behavior unchanged — pair count equals the guarded single-probe count
    on an all-hot corpus."""
    import numpy as np

    from bert_namedentityrecognition_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    rng = np.random.RandomState(11)
    base = rng.randn(8) * 2.0
    rows = [(i, [float(x) for x in base + rng.randn(8) * 1e-6]) for i in range(2000)]
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(threshold=0.95, m_bits=4, dim=8, bucket_cap=100,
              rehash_levels=2, rehash_bits=4, neighbor_window=16)
    plain = embedding_near_dup_pairs(vectors, **kw).count()
    probed = embedding_near_dup_pairs(vectors, multi_probe=1, **kw).count()
    assert probed == plain == 2000 * 16 - 16 * 17 // 2


def test_streaming_dedup_gate_query_cross_batch(spark):
    """The dedup_streaming_stateful driver query must flag EXACTLY the 50
    salted copies, whose originals arrive three micro-batches earlier —
    a false flag or a missed one means the keyed state did not survive
    across batches."""
    import __spark_entry__ as E

    rows = E.queries()["dedup_streaming_stateful"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 550
    dups = {r.doc_id for r in rows if r.is_duplicate}
    # copies live past the original id range (hi0=499) -> batch 3 of 4;
    # their originals (ids 0..49) were streamed in batch 0
    assert dups == set(range(500, 550))


def test_normalize_dedups_collapsed_dim_rows_both_paths(spark):
    """A dictionary carrying half- and full-width variants of one term as
    separate rows collapses to one surface_norm under han_to_zen; the
    exact stage must not fan out (one output row per mention) and the
    distributed and driver paths must pick the SAME row by value."""
    from bert_namedentityrecognition_spark.operators.normalize import (
        normalize_surfaces,
        resolve_surfaces_driver,
    )

    dim = spark.createDataFrame(
        [
            ("ﾛｷｿﾆﾝ", "CANON_B", "E2", "C2", "drug"),
            ("ロキソニン", "CANON_A", "E1", "C1", "drug"),
        ],
        "surface string, canonical string, entity_id string, code string, kind string",
    )
    surfaces = spark.createDataFrame(
        [("ロキソニン", "drug")], "word string, type string"
    )
    rows = normalize_surfaces(surfaces, dim).collect()
    assert len(rows) == 1  # no fan-out
    assert (rows[0].canonical, rows[0].entity_id) == ("CANON_A", "E1")

    got = resolve_surfaces_driver(
        [("ロキソニン", "drug")],
        [r.asDict() for r in dim.collect()],
    )
    assert len(got) == 1
    assert (got[0][2], got[0][3]) == ("CANON_A", "E1")


def test_embedding_cosine_dups_no_bigint_wrap_on_huge_docs(spark):
    """Book-length docs push dot²·den past 2^63; non-ANSI BIGINT multiply
    wraps silently. The predicate now runs in decimal(38,0): two identical
    huge docs (cosine exactly 1) must be detected."""
    from bert_namedentityrecognition_spark.operators.dedup import (
        embedding_cosine_dups,
    )

    # ~15k DISTINCT shingles folded into dim=1 → na = cnt² ≈ 2.2e8, so
    # dot²·400 ≈ 2e19 > 2^63 (the wrap regime) while the bucket join stays
    # one row per side (shingle construction is O(tokens²) per doc, so the
    # regime is reached by concentrating counts, not by a longer doc)
    text = " ".join(f"w{i}" for i in range(15_000))
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    rows = embedding_cosine_dups(docs, dim=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.dot == r.na == r.nb  # identical docs: cosine exactly 1
    assert r.dot * r.dot * 400 > 2**63  # the regime where bigint wrapped


def test_token_shingles_linear_in_doc_length(spark):
    """Book-length docs: shingle construction must be linear in tokens.
    The regression (split expression inlined into the transform lambda →
    full re-split per shingle, O(tokens²)) made this 64k-token doc take
    ~10 minutes; linear construction finishes in ~a second — the suite
    timeout IS the guard."""
    from bert_namedentityrecognition_spark.operators.dedup import token_shingles

    text = " ".join(f"w{i}" for i in range(64_000))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    assert token_shingles(docs).count() == 63_998


def test_guard_split_recall_measured(spark):
    """Quantify the hot-bucket guard's recall trade (review finding): with
    split+window forced on EVERY bucket of the clustered fixture, the
    retained fraction of the unguarded LSH pairs is measured — the
    docstring's number comes from here, not from a guess. Split-separated
    pairs are unrecoverable by multi_probe (it flips base bits only)."""
    from bert_namedentityrecognition_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(threshold=0.4, m_bits=2, dim=64)
    unguarded = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup_pairs(emb, bucket_cap=10**9, **kw).collect()
    }
    assert unguarded

    def recall(rb):
        g = {
            (r.vec_a, r.vec_b)
            for r in embedding_near_dup_pairs(
                emb, bucket_cap=64, rehash_levels=3, rehash_bits=rb,
                neighbor_window=10**6, **kw
            ).collect()
        }
        return len(g & unguarded) / len(unguarded)

    r2, r4 = recall(2), recall(4)
    # t=0.4 -> per-bit survive ~0.63: expect ~0.63**2=0.4 / ~0.16 — the
    # fixture measures 0.29 / 0.05 (small-sample); pin the shape:
    # loss is real, monotone in rehash_bits, and not total at 2 bits
    assert 0.1 <= r2 < 0.8, r2
    assert r4 < r2, (r2, r4)
