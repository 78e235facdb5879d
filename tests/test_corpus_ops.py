"""Corpus-curation operators (operators/corpus.py): decontamination,
deterministic weighted sampling, repetition quality signals.

Each test pins the semantics on a handcrafted fixture where the expected
values are computable by eye; the driver-gate twins
(decontaminate_ngram / domain_weighted_sample / doc_repetition_signals)
then pin the same kernels against DuckDB at three scale factors.
"""

import pytest

from bert_namedentityrecognition_spark.operators.corpus import (
    SAMPLE_DENOM,
    SAMPLE_RATES_PCT,
    decontaminate,
    repetition_signals,
    weighted_sample,
)

POLY_MOD = 1_000_000_007


def _poly(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % POLY_MOD
    return h


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 0: shares the trigram "alpha beta gamma" with the eval doc
        (0, "alpha beta gamma delta epsilon", "src0"),
        # 1: disjoint vocabulary — never contaminated
        (1, "one two three four five six", "src1"),
        # 2: too short for a trigram — zero shingles, never contaminated
        (2, "alpha beta", "src0"),
        # 3: the eval document itself
        (3, "alpha beta gamma zeta", "src2"),
        # 4: heavy repetition — "spam spam" dominates the 2-grams and every
        #    3-gram is duplicated
        (4, "spam spam spam spam spam spam", "src1"),
        # 5: no repeated grams at all
        (5, "a b c d e f g", "src2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_decontaminate_flags_overlap_and_skips_short_docs(docs):
    ev = docs.filter("doc_id = 3")
    train = docs.filter("doc_id <> 3")
    out = {
        r["doc_id"]: r.asDict()
        for r in decontaminate(train, ev, n=3, threshold_num=1, threshold_den=10).collect()
    }
    # doc 0 has 3 distinct trigrams; the eval doc's trigram set is
    # {alpha beta gamma, beta gamma zeta} → overlap == 1 (alpha beta gamma)
    assert out[0]["n_shingles"] == 3 and out[0]["n_overlap"] == 1
    assert out[0]["contaminated"]  # 1*10 >= 3*1
    assert out[1]["n_overlap"] == 0 and not out[1]["contaminated"]
    # < n tokens → zero shingles → vacuously clean
    assert out[2]["n_shingles"] == 0 and not out[2]["contaminated"]


def test_decontaminate_threshold_is_integer_exact(docs):
    ev = docs.filter("doc_id = 3")
    train = docs.filter("doc_id = 0")
    # overlap 1 of 3: 1*3 >= 3*1 holds at threshold 1/3, fails at 1/2
    loose = decontaminate(train, ev, n=3, threshold_num=1, threshold_den=3).collect()
    tight = decontaminate(train, ev, n=3, threshold_num=1, threshold_den=2).collect()
    assert loose[0]["contaminated"] and not tight[0]["contaminated"]


def test_weighted_sample_replays_the_portable_hash(docs):
    out = weighted_sample(docs).collect()
    assert len(out) == docs.count()
    for r in out:
        rate = SAMPLE_RATES_PCT[_poly(r["source"]) % len(SAMPLE_RATES_PCT)]
        bucket = _poly(f"{r['source']}:{r['doc_id']}") * 2654435761 % SAMPLE_DENOM
        assert r["rate_pct"] == rate and r["bucket"] == bucket
        assert r["sampled"] == (bucket * 100 < rate * SAMPLE_DENOM)


def test_weighted_sample_is_partitioning_invariant(docs):
    a = sorted(map(tuple, weighted_sample(docs).collect()))
    b = sorted(map(tuple, weighted_sample(docs.repartition(7)).collect()))
    assert a == b


def test_oov_ratio_vocab_and_keep(spark):
    from bert_namedentityrecognition_spark.operators.corpus import oov_ratio

    rows = [
        (0, "a a a b b c"),      # corpus counts: a=5, b=3, c=2, z=1
        (1, "a a b z"),
        (2, ""),                  # zero tokens → keep vacuously
        (3, None),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    # top_k=2 vocab is {a, b} (counts 5, 3); c and z are OOV
    out = {r["doc_id"]: r.asDict() for r in oov_ratio(d, top_k=2).collect()}
    assert out[0]["n_tokens"] == 6 and out[0]["n_oov"] == 1    # c
    assert out[0]["keep"]                                       # 1*4 <= 6
    assert out[1]["n_tokens"] == 4 and out[1]["n_oov"] == 1    # z
    assert out[1]["keep"]                                       # 1*4 <= 4
    assert out[2]["n_tokens"] == 0 and out[2]["keep"]
    assert out[3]["n_tokens"] == 0 and out[3]["keep"]
    # tie-break is (count desc, token asc): with top_k=3, c(2) beats z(1);
    # drop doc 0's c from OOV but doc 1's z stays
    out3 = {r["doc_id"]: r.asDict() for r in oov_ratio(d, top_k=3).collect()}
    assert out3[0]["n_oov"] == 0 and out3[1]["n_oov"] == 1


def test_redact_pii_order_and_counts(spark):
    from pyspark.sql import functions as F

    from bert_namedentityrecognition_spark.functions.textstats import (
        pii_counts,
        redact_pii,
    )

    rows = [
        (0, "write bob@x.co or visit https://a.b/c?d=1 id 123456789 ok"),
        (1, "no pii here"),
        # an email-shaped substring INSIDE a url: the url is redacted first
        # (whole match → one <URL>), while the raw-text email count still
        # sees it — counts are per-pattern over the unredacted text
        (2, "go https://user@mail.example.com/path now"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    ne, nu, nd = pii_counts(F.col("text"))
    out = {
        r["doc_id"]: r.asDict()
        for r in d.select(
            "doc_id",
            redact_pii(F.col("text")).alias("clean"),
            ne.alias("ne"), nu.alias("nu"), nd.alias("nd"),
        ).collect()
    }
    assert out[0]["clean"] == "write <EMAIL> or visit <URL> id <NUM> ok"
    assert (out[0]["ne"], out[0]["nu"], out[0]["nd"]) == (1, 1, 1)
    assert out[1]["clean"] == "no pii here" and out[1]["nu"] == 0
    assert out[2]["clean"] == "go <URL> now"
    assert (out[2]["ne"], out[2]["nu"]) == (1, 1)


def test_pack_group_kernel():
    from bert_namedentityrecognition_spark.oracle.packing import pack_group

    # budget 10: [4,5] fill bin 0; 3 overflows → bin 1; oversize 12 → bin 2
    # (alone, fill 12 > budget); 2 can't join (12+2 > 10) → bin 3
    items = [(0, 4), (1, 5), (2, 3), (3, 12), (4, 2)]
    assert list(pack_group(items, 10)) == [
        (0, 0, 0), (1, 0, 4), (2, 1, 0), (3, 2, 0), (4, 3, 0),
    ]
    # the FIRST doc seeds bin 0 even when oversize
    assert list(pack_group([(7, 99), (8, 1)], 10)) == [(7, 0, 0), (8, 1, 0)]
    # zero-token docs stack for free
    assert list(pack_group([(0, 10), (1, 0), (2, 0)], 10)) == [
        (0, 0, 0), (1, 0, 10), (2, 0, 10),
    ]


def test_pack_group_kernel_invariants_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bert_namedentityrecognition_spark.oracle.packing import pack_group

    @settings(max_examples=200, deadline=None)
    @given(
        toks=st.lists(st.integers(min_value=0, max_value=40), max_size=30),
        budget=st.integers(min_value=1, max_value=25),
    )
    def run(toks, budget):
        items = list(enumerate(toks))
        out = list(pack_group(items, budget))
        assert [d for d, _, _ in out] == [d for d, _ in items]  # order kept
        fills = {}
        last_bin = 0
        for (doc_id, bin_id, off), (_, nt) in zip(out, items):
            assert bin_id in (last_bin, last_bin + 1)  # bins open in order
            last_bin = bin_id
            assert off == fills.get(bin_id, 0)  # offset == fill before doc
            fills[bin_id] = off + nt
        for bin_id, fill in fills.items():
            members = [
                nt for (d, b, _), (_, nt) in zip(out, items) if b == bin_id
            ]
            assert fill == sum(members)
            # a bin exceeds the budget only when an oversize doc seeded it,
            # and then nothing else joins (fill + nt <= budget fails for
            # every nt ≥ 0 once fill > budget)
            if fill > budget:
                assert len(members) == 1 and members[0] > budget

    run()


def test_pack_sequences_matches_kernel_and_is_partition_invariant(spark):
    from bert_namedentityrecognition_spark.operators.corpus import pack_sequences
    from bert_namedentityrecognition_spark.oracle.packing import pack_group

    rows = [(i, "tok " * (i % 7) if i % 11 else None, "s") for i in range(40)]
    d = spark.createDataFrame(
        [(i, t.strip() if t else t, s) for i, t, s in rows],
        "doc_id long, text string, source string",
    )
    out = sorted(map(tuple, pack_sequences(d, budget=8, n_groups=3).collect()))
    # replay with the kernel per group
    expected = []
    toks = {i: (0 if (t is None or not t.strip()) else len(t.split())) for i, t, _ in rows}
    for g in range(3):
        items = [(i, toks[i]) for i in sorted(toks) if i % 3 == g]
        for doc_id, bin_id, off in pack_group(items, 8):
            expected.append(
                (doc_id, g, bin_id, off, toks[doc_id], toks[doc_id] > 8)
            )
    assert out == sorted(expected)
    out2 = sorted(
        map(tuple, pack_sequences(d.repartition(5), budget=8, n_groups=3).collect())
    )
    assert out == out2


def test_curate_corpus_composition_matches_individual_stages(spark, sf_dir):
    import os

    from pyspark.sql import functions as F

    from bert_namedentityrecognition_spark.functions.textstats import quality_score
    from bert_namedentityrecognition_spark.operators.corpus import (
        curate_corpus,
        decontaminate,
        repetition_signals,
        weighted_sample,
    )
    from bert_namedentityrecognition_spark.operators.dedup import exact_dedup

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    ev = d.filter(F.col("doc_id") % 23 == 0)
    train = d.filter(F.col("doc_id") % 23 != 0)

    out = curate_corpus(train, ev, budget=64, n_groups=8)
    kept_ids = {r["doc_id"] for r in out.select("doc_id").collect()}

    q = {r[0] for r in train.filter(
        F.round(quality_score(F.col("text")), 6) >= 0.5).select("doc_id").collect()}
    rep = {r[0] for r in repetition_signals(train).filter("keep").select("doc_id").collect()}
    uniq = {r[0] for r in exact_dedup(train).filter("NOT is_duplicate").select("doc_id").collect()}
    clean = {r[0] for r in decontaminate(train, ev, threshold_num=2, threshold_den=5)
             .filter("NOT contaminated").select("doc_id").collect()}
    samp = {r[0] for r in weighted_sample(train).filter("sampled").select("doc_id").collect()}

    assert kept_ids == q & rep & uniq & clean & samp
    assert kept_ids  # non-degenerate: the pipeline keeps something
    # and the filter actually fires: at least one doc dropped overall
    assert len(kept_ids) < train.count()
    # packing invariant: offsets within a bin are strictly increasing in
    # doc_id order and stay under budget unless the doc is oversize alone
    rows = out.collect()
    by_bin = {}
    for r in rows:
        by_bin.setdefault((r["group_id"], r["bin_id"]), []).append(r)
    for members in by_bin.values():
        members.sort(key=lambda r: r["doc_id"])
        running = 0
        for m in members:
            assert m["tok_offset"] == running
            running += m["n_tokens"]


def test_repetition_signals_flags_spam(docs):
    out = {r["doc_id"]: r.asDict() for r in repetition_signals(docs).collect()}
    # doc 4: five "spam spam" 2-grams (all the same gram) → top2=5/total2=5;
    # four identical "spam spam spam" 3-grams → dup3=4/total3=4 → dropped
    assert out[4]["top2"] == 5 and out[4]["total2"] == 5
    assert out[4]["dup3"] == 4 and out[4]["total3"] == 4
    assert not out[4]["keep"]
    # doc 5: 6 distinct 2-grams (top2=1 ≤ 6/5), no duplicated 3-grams → keep
    assert out[5]["top2"] == 1 and out[5]["total2"] == 6
    assert out[5]["dup3"] == 0 and out[5]["keep"]
    # doc 2 has one 2-gram, zero 3-grams: 1*5 > 1 → the top-2-gram share is
    # 100 % and the doc is dropped — degenerate-short docs fail the Gopher
    # top-gram test by construction (length filters catch them upstream)
    assert out[2]["total3"] == 0 and not out[2]["keep"]


# ---- unigram-LM surprisal filter (oracle/lm.py kernels) ----

LM_DOCS = [
    (1, "the the the cat"),      # common tokens -> low surprisal
    (2, "zyzzyva qwfp zyzzyva"), # rare tokens -> high surprisal
    (3, ""),                     # zero tokens -> keep vacuously
    (4, None),
    (5, "the cat 日本語"),
]


def _lm_expected(rows, cap):
    from bert_namedentityrecognition_spark.oracle.lm import (
        doc_surprisal,
        oov_lp_micro,
        vocab_table,
    )

    wc = {}
    for _, t in rows:
        for w in (t or "").split():
            wc[w] = wc.get(w, 0) + 1
    n_total = sum(wc.values())
    table = vocab_table(wc, cap, n_total=n_total)
    oov = oov_lp_micro(n_total)
    return {
        doc_id: doc_surprisal((t or "").split(), table, oov)
        for doc_id, t in rows
    }


def test_lm_kernel_fixed_point_matches_duckdb_ln():
    # the design premise: Python math.log == DuckDB ln on this host
    import duckdb

    from bert_namedentityrecognition_spark.oracle.lm import lp_micro, oov_lp_micro

    con = duckdb.connect()
    for n, c in [(10, 1), (10, 3), (123456, 7), (999983, 999983)]:
        db = con.execute(
            "SELECT CAST(floor(ln(CAST(? AS DOUBLE)/CAST(? AS DOUBLE))"
            " * 1000000 + 0.5) AS BIGINT)",
            [n, c],
        ).fetchone()[0]
        assert lp_micro(n, c) == db
    assert (
        oov_lp_micro(123456)
        == con.execute(
            "SELECT CAST(floor(ln(CAST(2 * 123456 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
        ).fetchone()[0]
    )


def test_lm_vocab_table_capped_needs_explicit_total():
    from bert_namedentityrecognition_spark.oracle.lm import lp_micro, vocab_table

    wc = {"a": 5, "b": 3, "c": 1}
    t = vocab_table(wc, cap=2, n_total=9)
    assert set(t) == {"a", "b"}  # (count desc, tok asc)
    assert t["a"] == lp_micro(9, 5) and t["b"] == lp_micro(9, 3)


@pytest.mark.parametrize("cap", [2, 100])  # cap=2 fires the OOV path
def test_lm_surprisal_filter_matches_kernel(spark, cap):
    from bert_namedentityrecognition_spark.operators.corpus import (
        lm_surprisal_filter,
    )

    docs = spark.createDataFrame(LM_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["surprisal_micro"], r["keep"])
        for r in lm_surprisal_filter(docs, vocab_cap=cap).collect()
    }
    exp = _lm_expected(LM_DOCS, cap)
    assert set(got) == set(exp)
    for doc_id, (n, s) in exp.items():
        assert got[doc_id][:2] == (n, s), doc_id
        assert got[doc_id][2] == (s <= n * 3_405_000)
    # the common-token doc must score below the rare-token doc per token
    assert got[1][1] * got[2][0] < got[2][1] * got[1][0]
    assert got[3] == (0, 0, True) and got[4] == (0, 0, True)


def test_lm_surprisal_filter_plan_no_corpus_join_back(spark):
    from bert_namedentityrecognition_spark.operators.corpus import (
        lm_surprisal_filter,
    )

    docs = spark.createDataFrame(LM_DOCS, "doc_id long, text string")
    df = lm_surprisal_filter(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_lm_surprisal_filter_empty_corpus(spark):
    from bert_namedentityrecognition_spark.operators.corpus import (
        lm_surprisal_filter,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["surprisal_micro"], r["keep"])
        for r in lm_surprisal_filter(docs).collect()
    }
    assert got == {1: (0, 0, True), 2: (0, 0, True)}


def test_lm_bigram_rewards_predictable_sequences(spark):
    from bert_namedentityrecognition_spark.operators.corpus import (
        lm_bigram_surprisal_filter,
        lm_surprisal_filter,
    )

    # corpus where "a b" always follows: bigram model scores the repeated
    # sequence far below the unigram model (c(a b) == c(a) → conditional
    # surprisal ~0), while scrambled docs pay the backoff penalty
    rows = [(i, "a b " * 10) for i in range(8)] + [
        (100 + i, f"x{i} a y{i} b z{i} c{i}") for i in range(4)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bi = {r["doc_id"]: r for r in lm_bigram_surprisal_filter(docs, keep_thresh_micro=1_000_000).collect()}
    uni = {r["doc_id"]: r for r in lm_surprisal_filter(docs).collect()}
    assert len(bi) == len(rows)
    for i in range(8):
        per_tok_bi = bi[i]["surprisal_micro"] / bi[i]["n_tokens"]
        per_tok_uni = uni[i]["surprisal_micro"] / uni[i]["n_tokens"]
        assert per_tok_bi < per_tok_uni  # conditioning helps on repeats
        assert bi[i]["keep"]  # mean well under 1.0 nats
    for i in range(4):
        # scrambled docs: rare bigrams -> backoff + rare unigrams -> high
        assert bi[100 + i]["surprisal_micro"] / bi[100 + i]["n_tokens"] > 2_000_000
        assert not bi[100 + i]["keep"]


def test_lm_bigram_token_accounting_and_degenerates(spark):
    from bert_namedentityrecognition_spark.operators.corpus import (
        lm_bigram_surprisal_filter,
    )

    rows = [(1, "a b c"), (2, "solo"), (3, ""), (4, None), (5, "   ")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in lm_bigram_surprisal_filter(docs).collect()}
    assert got[1]["n_tokens"] == 3  # first + two bigram transitions
    assert got[2]["n_tokens"] == 1 and got[2]["surprisal_micro"] > 0
    for i in (3, 4, 5):
        assert got[i]["n_tokens"] == 0 and got[i]["surprisal_micro"] == 0
        assert got[i]["keep"]  # vacuous


def test_lm_bigram_empty_corpus(spark):
    from bert_namedentityrecognition_spark.operators.corpus import (
        lm_bigram_surprisal_filter,
    )

    docs = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in lm_bigram_surprisal_filter(docs).collect()}
    assert all(r["n_tokens"] == 0 and r["keep"] for r in got.values())
