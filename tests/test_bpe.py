"""Distributed BPE tokenizer training (operators/bpe.py) vs the pure-Python
kernel (oracle/bpe.py) vs the DuckDB SQL twin (oracle/bpe_sql.py).

The kernel is the semantic source of truth (CLAUDE.md rule 6); the Spark
operator and the SQL replay must both match it exactly — including the
greedy-leftmost overlap rule (l == r chains take odd streak positions),
tie-breaking, early stop, and the unseen-word character fallback.
"""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bert_namedentityrecognition_spark.oracle.bpe import (
    apply_merge,
    pair_counts,
    segment_word,
    train_bpe,
    word_symbols,
)
from bert_namedentityrecognition_spark.oracle.bpe_sql import (
    bpe_encode_sql,
    bpe_merges_sql,
    bpe_vocab_sql,
)

# open-vocabulary corpus: repeated stems, an l==r chain word ('aaaa',
# 'aaaaa'), unicode, digits — deliberately unlike the closed 31-word
# testdata so the tie/overlap paths actually fire
DOCS = [
    (1, "low lower lowest low low newer new"),
    (2, "aaaa aaaaa aa baaab low"),
    (3, "日本語 日本 語語語 newer"),
    (4, "x1 x2 x1 lowest  \t aaaa"),
    (5, ""),
    (6, None),
    (7, "low"),
]


def _word_counts(rows):
    cnt = {}
    for _, t in rows:
        for w in (t or "").split():
            cnt[w] = cnt.get(w, 0) + 1
    return cnt


def _naive_apply(syms, left, right):
    # sequential scan reference for the fold
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@given(
    st.lists(st.sampled_from(["a", "b", "ab", "aa"]), max_size=12),
    st.sampled_from([("a", "a"), ("a", "b"), ("b", "a"), ("a", "ab")]),
)
@settings(max_examples=200, deadline=None)
def test_apply_merge_matches_sequential_scan(syms, pair):
    assert apply_merge(list(syms), *pair) == _naive_apply(list(syms), *pair)


def test_kernel_greedy_leftmost_odd_streaks():
    # 'aaaa' -> (aa)(aa); 'aaaaa' -> (aa)(aa)a — classic overlap cases
    assert apply_merge(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert apply_merge(list("aaaaa"), "a", "a") == ["aa", "aa", "a"]
    assert pair_counts([(list("aaaa"), 2)]) == {("a", "a"): 6}


def test_kernel_early_stop_and_segment_replay():
    wc = _word_counts(DOCS)
    merges, seg = train_bpe(wc, 10_000)
    # fully merged: every word is one symbol, no pairs remain
    assert all(len(s) == 1 for s in seg.values())
    assert len(merges) < 10_000
    for w in wc:
        assert segment_word(w, merges) == seg[w]


def _duck(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return con


@pytest.mark.parametrize("nm", [0, 3, 16, 64])
def test_sql_twin_matches_kernel(nm):
    wc = _word_counts(DOCS)
    merges, seg = train_bpe(wc, nm)
    con = _duck(DOCS)
    vocab = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(bpe_vocab_sql(nm)).fetchall()
    }
    assert vocab == {
        w: (c, len(seg[w]), " ".join(seg[w])) for w, c in wc.items()
    }
    got = sorted(con.execute(bpe_merges_sql(nm)).fetchall())
    assert got == [(i, l, r, c) for i, (l, r, c) in enumerate(merges)]
    enc = {
        r[0]: (r[1], r[2]) for r in con.execute(bpe_encode_sql(nm)).fetchall()
    }
    for doc_id, t in DOCS:
        toks = (t or "").split()
        assert enc[doc_id] == (len(toks), sum(len(seg[w]) for w in toks))


def test_spark_operator_matches_kernel(spark):
    from bert_namedentityrecognition_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
        merge_table,
        segmented_vocab,
    )

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    wc = _word_counts(DOCS)
    kmerges, kseg = train_bpe(wc, 16)

    merges, words = bpe_train(docs, 16)
    assert merges == kmerges
    got = {r["tok"]: (r["c"], list(r["syms"])) for r in words.collect()}
    assert got == {w: (c, kseg[w]) for w, c in wc.items()}

    mt = sorted(merge_table(docs, 16).collect(), key=lambda r: r["step"])
    assert [(r["left"], r["right"], r["pair_count"]) for r in mt] == kmerges

    seg_df = segmented_vocab(docs, 16)
    enc = {
        r["doc_id"]: (r["n_tokens"], r["n_pieces"])
        for r in bpe_encode(docs, seg_df).collect()
    }
    for doc_id, t in DOCS:
        toks = (t or "").split()
        assert enc[doc_id] == (len(toks), sum(len(kseg[w]) for w in toks))


def test_spark_early_stop_returns_short_merge_list(spark):
    from bert_namedentityrecognition_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    merges, words = bpe_train(docs, 50)
    assert merges == [("a", "b", 3)]
    assert [list(r["syms"]) for r in words.collect()] == [["ab"]]


def test_spark_encode_unseen_word_falls_back_to_chars(spark):
    from bert_namedentityrecognition_spark.operators.bpe import (
        bpe_encode,
        segmented_vocab,
    )

    train = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    seg = segmented_vocab(train, 4)
    apply = spark.createDataFrame(
        [(9, "ab zzz"), (10, None)], "doc_id long, text string"
    )
    enc = {
        r["doc_id"]: (r["n_tokens"], r["n_pieces"])
        for r in bpe_encode(apply, seg).collect()
    }
    assert enc == {9: (2, 1 + 3), 10: (0, 0)}  # 'zzz' → 3 chars; null → 0


def test_wordpiece_kernel_prefers_likelihood_over_frequency():
    from bert_namedentityrecognition_spark.oracle.bpe import (
        train_bpe,
        train_wordpiece,
    )

    # (c,c) and (a,b) tie on frequency 5; WordPiece scores (a,b) higher
    # because a and b occur less often apart: 5/(8·5) > 5/(10·5)
    wc = {"aab": 3, "ab": 2, "ccd": 5}
    wp, _ = train_wordpiece(wc, 1)
    bp, _ = train_bpe(wc, 1)
    assert wp[0][:2] == ("a", "b") and bp[0][:2] == ("a", "b")
    wc2 = {"aab": 3, "ab": 2, "ccd": 5, "cc": 1}
    wp2, _ = train_wordpiece(wc2, 1)
    bp2, _ = train_bpe(wc2, 1)
    assert bp2[0][:2] == ("c", "c")  # frequency 6 wins for BPE
    assert wp2[0][:2] == ("a", "b")  # likelihood still prefers (a, b)


@pytest.mark.parametrize("nm", [0, 3, 16])
def test_wordpiece_sql_twin_matches_kernel(nm):
    from bert_namedentityrecognition_spark.oracle.bpe import train_wordpiece
    from bert_namedentityrecognition_spark.oracle.bpe_sql import (
        wordpiece_merges_sql,
        wordpiece_vocab_sql,
    )

    wc = _word_counts(DOCS)
    merges, seg = train_wordpiece(wc, nm)
    con = _duck(DOCS)
    vocab = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(wordpiece_vocab_sql(nm)).fetchall()
    }
    assert vocab == {
        w: (c, len(seg[w]), " ".join(seg[w])) for w, c in wc.items()
    }
    got = sorted(con.execute(wordpiece_merges_sql(nm)).fetchall())
    assert got == [
        (i, l, r, c, sl, sr) for i, (l, r, c, sl, sr) in enumerate(merges)
    ]


def test_wordpiece_spark_matches_kernel(spark):
    from bert_namedentityrecognition_spark.operators.bpe import (
        wordpiece_merge_table,
        wordpiece_segmented_vocab,
    )
    from bert_namedentityrecognition_spark.oracle.bpe import train_wordpiece

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    wc = _word_counts(DOCS)
    kmerges, kseg = train_wordpiece(wc, 12)
    mt = sorted(wordpiece_merge_table(docs, 12).collect(), key=lambda r: r["step"])
    assert [
        (
            r["left_sym"],
            r["right_sym"],
            r["pair_count"],
            r["left_count"],
            r["right_count"],
        )
        for r in mt
    ] == kmerges
    seg = {
        r["tok"]: (r["c"], r["n_pieces"], r["pieces"])
        for r in wordpiece_segmented_vocab(docs, 12).collect()
    }
    assert seg == {w: (c, len(kseg[w]), " ".join(kseg[w])) for w, c in wc.items()}
