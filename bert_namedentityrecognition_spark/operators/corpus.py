"""Corpus-curation operators for LLM training-data pipelines.

Three operations every web-scale pretraining pipeline runs between crawl
and tokenizer, beyond the dedup family in ``operators/dedup.py``:

- **decontaminate**: flag training documents whose n-gram shingles overlap
  a benchmark/eval set (the GPT-3-style n-gram decontamination filter).
  The eval set is tiny relative to the corpus (benchmark suites are MBs,
  the corpus is TBs), so its shingle set is **broadcast** — the training
  side never shuffles on shingle, only one groupBy(doc_id) aggregation.
- **weighted_sample**: deterministic hash-threshold sampling with a
  per-domain rate (mixture building / domain re-weighting). No RNG state:
  the keep decision is a pure function of (source, doc_id) via the
  portable polynomial hash, so the sample is reproducible on any cluster
  size, any partitioning, and replayable bit-for-bit in the SQL oracle.
- **repetition_signals**: Gopher-style within-document repetition quality
  signals — the occurrence share of the most frequent 2-gram and the
  occurrence share of duplicated 3-grams — with the keep decision made on
  integer cross-multiplication (``top2*5 <= total2``), never a float
  threshold, so engines agree bit-for-bit (CLAUDE.md rule 11).

100 TB notes: decontaminate is broadcast + one doc-keyed shuffle;
weighted_sample is a pure map (no shuffle at all — it composes with any
scan); repetition_signals shuffles exploded grams once on (doc_id, gram)
with map-side partial counts. No Python UDFs anywhere on these paths.

Reference parity: the reference repo has no corpus-curation stage (its
corpora are hand-curated annotation sets); these operators are part of the
beyond-reference training-data family requested alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import poly_hash
from .dedup import token_shingles

# hash-threshold sampling resolution: buckets per unit of rate
SAMPLE_DENOM = 1_000_000

# the per-domain rate menu (percent); a domain's rate is chosen
# deterministically from its name so the operator needs no side-channel
# weights table at gate time — production callers pass explicit weights
SAMPLE_RATES_PCT = [10, 25, 50, 75, 100]


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_shingles, n_overlap, contaminated): benchmark n-gram
    decontamination.

    A document is contaminated when at least ``threshold_num/threshold_den``
    of its distinct n-token shingles also occur in the eval set
    (``n_overlap * den >= n_shingles * num`` — integer-exact, no float
    boundary). Documents with fewer than ``n`` tokens have zero shingles
    and are never contaminated (nothing was compared).

    Scale shape: the eval shingle set is broadcast (benchmark suites are
    tiny next to the corpus); the training side is an exploded shingle
    stream aggregated once on doc_id with map-side partial counts. The
    only shuffle is that doc-keyed aggregation.
    """
    # outer=True keeps shingle-less docs as a null sentinel, and the
    # overlap flag rides the SAME broadcast left join as the size count —
    # one aggregation, no corpus⋈corpus join-back (the first cut joined
    # two separate per-doc aggregates back onto the corpus: two SMJs of
    # corpus-sized sides)
    sh = token_shingles(docs, n=n, id_col=id_col, text_col=text_col, outer=True)
    ev = (
        token_shingles(eval_docs, n=n, id_col=id_col, text_col=text_col)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    out = (
        sh.join(F.broadcast(ev), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("shingle").cast("long").alias("n_shingles"),
            F.coalesce(F.sum(F.coalesce(F.col("_hit"), F.lit(0))), F.lit(0))
            .cast("long")
            .alias("n_overlap"),
        )
    )
    return out.withColumn(
        "contaminated",
        (F.col("n_shingles") > 0)
        & (F.col("n_overlap") * threshold_den >= F.col("n_shingles") * threshold_num),
    )


def weighted_sample(
    docs: DataFrame,
    rates_pct: list[int] | None = None,
    denom: int = SAMPLE_DENOM,
    id_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """(doc_id, source, rate_pct, bucket, sampled): deterministic
    hash-threshold sampling per domain — the mixture-building primitive.

    ``bucket = poly_hash(source ‖ ':' ‖ doc_id) mod denom`` and the row is
    sampled iff ``bucket * 100 < rate_pct * denom`` (integer-exact). The
    domain's rate is picked from ``rates_pct`` by ``poly_hash(source) mod
    len(rates_pct)`` so the gate query is self-contained; production
    callers join their own weights table instead — the keep predicate is
    unchanged.

    Scale shape: a pure per-row map — zero shuffles, composes with any
    scan, and the sample is identical at any cluster size because the
    hash depends only on row values (no partition-seeded RNG like
    ``df.sample`` whose output changes with partitioning).
    """
    rate_pct, bucket, sampled = sample_columns(
        rates_pct=rates_pct, denom=denom, id_col=id_col, domain_col=domain_col
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(domain_col).alias("source"),
        rate_pct.cast("long").alias("rate_pct"),
        bucket.cast("long").alias("bucket"),
        sampled.alias("sampled"),
    )


def sample_columns(
    rates_pct: list[int] | None = None,
    denom: int = SAMPLE_DENOM,
    id_col: str = "doc_id",
    domain_col: str = "source",
):
    """(rate_pct, bucket, sampled) column expressions — the
    ``weighted_sample`` predicate as inlineable columns, so compositions
    (``curate_corpus``) get the zero-shuffle map without a self-join."""
    rates = rates_pct or SAMPLE_RATES_PCT
    rate_arr = F.array(*[F.lit(r) for r in rates])
    rate_pct = F.element_at(
        rate_arr, (poly_hash(F.col(domain_col)) % len(rates) + 1).cast("int")
    )
    # odd-multiplier scramble before the small mod: the raw polynomial
    # hash is near-affine in trailing characters, so consecutive doc_ids
    # would otherwise land in one narrow bucket band and whole id-runs
    # would share the keep decision (see mixture_upsample)
    bucket = (
        poly_hash(
            F.concat(F.col(domain_col), F.lit(":"), F.col(id_col).cast("string"))
        )
        * 2654435761
    ) % denom
    sampled = bucket * 100 < rate_pct.cast("long") * denom
    return rate_pct, bucket, sampled


def pack_sequences(
    docs: DataFrame,
    budget: int = 64,
    n_groups: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, group_id, bin_id, tok_offset, n_tokens, oversize):
    sample packing — greedy in-order first-fit of documents into
    token-budget bins, within deterministic hash groups
    (``group_id = doc_id % n_groups``).

    Packing is inherently a sequential fold, so it runs per group in ONE
    fused ``applyInPandas`` stage (rule 1) importing the pure-Python
    kernel ``oracle/packing.pack_group`` (rule 6) — the DuckDB twin
    replays the same fold as a per-group recursive CTE. The group hash
    makes the result a pure function of row values: identical at any
    cluster size / partitioning.

    Scale shape: one shuffle on group_id; per-group state is O(1)
    (current bin + fill), rows stream through; choose n_groups ≈ the
    write parallelism you want (at 100 TB, thousands of groups — each
    group packs independently, bins are later read group-major so
    packing locality survives the shuffle).
    """
    from ..functions.textstats import ws_token_count

    d = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_groups).cast("long").alias("group_id"),
        ws_token_count(F.coalesce(F.col(text_col), F.lit("")))
        .cast("long")
        .alias("n_tokens"),
    )

    schema = (
        "doc_id long, group_id long, bin_id long, tok_offset long, n_tokens long"
    )

    def _pack(pdf):
        import pandas as pd

        from bert_namedentityrecognition_spark.oracle.packing import pack_group

        pdf = pdf.sort_values("doc_id")
        packed = list(pack_group(zip(pdf["doc_id"], pdf["n_tokens"]), budget))
        out = pd.DataFrame(packed, columns=["doc_id", "bin_id", "tok_offset"])
        return out.merge(
            pdf[["doc_id", "group_id", "n_tokens"]], on="doc_id"
        )[["doc_id", "group_id", "bin_id", "tok_offset", "n_tokens"]]

    return (
        d.groupBy("group_id")
        .applyInPandas(_pack, schema)
        .withColumn("oversize", F.col("n_tokens") > budget)
    )


def oov_ratio(
    docs: DataFrame,
    top_k: int = 16,
    keep_num: int = 1,
    keep_den: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, n_oov, keep): out-of-vocabulary ratio against the
    corpus's own top-``top_k`` token vocabulary (vocabulary-coverage
    quality filter, CCNet-style LM scoring's integer-exact cousin).

    Two passes: (1) global token counts → the top-k vocabulary, ranked by
    (count desc, token asc) — a TOTAL order, so the vocabulary is
    deterministic across engines and cluster sizes even at count ties;
    (2) per-doc token stream left-joined against the **broadcast**
    vocabulary (top-k is tiny by construction). Keep iff
    ``n_oov * keep_den <= n_tokens * keep_num`` (default ≤ 25 % OOV) —
    integer cross-multiplication. Zero-token docs keep vacuously.

    Scale shape: pass 1 is a map-side-combined groupBy on tokens followed
    by a driver-size top-k; pass 2 is a broadcast join — the token stream
    shuffles once on doc_id for the final rollup. No Python UDFs.
    """
    from pyspark.sql import Window

    # explode_outer over the FILTERED token array keeps zero-token docs as
    # one null-token sentinel row, so the pass is scan → broadcast join →
    # one doc_id aggregation — no corpus⋈corpus join-back to restore empty
    # docs (the join-back planned as a SortMergeJoin of two corpus-sized
    # sides; null join keys pass the broadcast join unmatched)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(
            F.filter(
                F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok"),
    )
    counts = (
        toks.filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    w = Window.orderBy(F.col("c").desc(), F.col("tok").asc())
    vocab = counts.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= top_k
    ).select("tok")
    out = (
        toks.join(F.broadcast(vocab.withColumn("_in", F.lit(1))), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("tok").cast("long").alias("n_tokens"),
            F.coalesce(
                F.sum(
                    F.when(F.col("tok").isNull(), 0)
                    .when(F.col("_in").isNull(), 1)
                    .otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_oov"),
        )
    )
    return out.withColumn(
        "keep", F.col("n_oov") * keep_den <= F.col("n_tokens") * keep_num
    )


def curate_corpus(
    docs: DataFrame,
    eval_docs: DataFrame,
    budget: int = 64,
    n_groups: int = 8,
    decon_num: int = 2,
    decon_den: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
) -> DataFrame:
    """The full curation pass, crawl → training batches, composed from the
    individually-gated stages: quality filter (composite score ≥ 0.5) →
    repetition filter (Gopher keep) → exact dedup (min-id survivor) →
    benchmark decontamination (drop at ≥ decon_num/decon_den trigram
    overlap — default 2/5 = 40 %) → deterministic domain-weighted
    sampling → sequence packing of the survivors.

    Stage order mirrors a production pipeline: cheap per-row predicates
    (quality, sampling) are plain columns — Catalyst evaluates them in the
    scan stage with zero shuffles — while the three aggregation-based
    flags (repetition, dedup window, decontamination) join back on doc_id.
    At 100 TB the doc_id-keyed joins share one hash partitioning (a single
    exchange reused across them), the eval shingle set is broadcast, and
    packing adds one group_id shuffle with O(1) state per group.

    Returns the packed survivors: (doc_id, group_id, bin_id, tok_offset,
    n_tokens, oversize).
    """
    from ..functions.textstats import quality_score
    from .dedup import exact_dedup

    _, _, sampled = sample_columns(id_col=id_col, domain_col=domain_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        (F.round(quality_score(F.col(text_col)), 6) >= 0.5).alias("k_quality"),
        sampled.alias("k_sampled"),
    )
    rep = repetition_signals(docs, id_col=id_col, text_col=text_col).select(
        "doc_id", F.col("keep").alias("k_rep")
    )
    uniq = exact_dedup(docs, id_col=id_col, text_col=text_col).select(
        "doc_id", (~F.col("is_duplicate")).alias("k_uniq")
    )
    # composition default 2/5 (vs the standalone gate's 1/10): the overlap
    # distribution rises with corpus size on a closed vocabulary, and at
    # 10 % the stage would drop ~99 % of the large corpus — the filter
    # should prune the tail, not become the pipeline
    clean = decontaminate(
        docs,
        eval_docs,
        n=3,
        threshold_num=decon_num,
        threshold_den=decon_den,
        id_col=id_col,
        text_col=text_col,
    ).select("doc_id", (~F.col("contaminated")).alias("k_clean"))
    kept = (
        base.join(rep, "doc_id")
        .join(uniq, "doc_id")
        .join(clean, "doc_id")
        .filter(
            F.col("k_quality")
            & F.col("k_sampled")
            & F.col("k_rep")
            & F.col("k_uniq")
            & F.col("k_clean")
        )
        .select("doc_id", "text")
    )
    return pack_sequences(kept, budget=budget, n_groups=n_groups)


def repetition_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, top2, total2, dup3, total3, keep): within-document
    repetition quality signals (Gopher-style repetition filters).

    - ``top2 / total2``: occurrence share of the single most frequent
      2-gram (boilerplate/menu detector),
    - ``dup3 / total3``: occurrence share of 3-grams that appear more than
      once (loop/spam detector),
    - ``keep`` iff ``top2*5 <= total2`` (≤ 20 %) AND ``dup3*2 <= total3``
      (≤ 50 %) — integer cross-multiplication, bit-identical in DuckDB.
      Documents too short to have grams keep vacuously (0 ≤ 0).

    Scale shape: ONE corpus scan builds both gram streams as a single
    tagged struct array (k=2 ‖ k=3) and ``explode_outer`` keeps gram-less
    docs as a null sentinel — no corpus⋈corpus join-back (the first cut
    scanned the corpus twice and joined two per-doc aggregates back onto
    it: two SMJs of corpus-sized sides). Grams aggregate on
    (doc_id, k, gram) with map-side partial counts, so the shuffle
    carries per-doc-distinct grams, not raw occurrences; the per-doc
    rollup is conditional aggregation over the same doc_id hashing.
    """
    from .dedup import shingle_array

    toks = F.col("_toks")
    tagged = F.concat(
        F.transform(
            shingle_array(toks, 2),
            lambda s: F.struct(F.lit(2).alias("k"), s.alias("shingle")),
        ),
        F.transform(
            shingle_array(toks, 3),
            lambda s: F.struct(F.lit(3).alias("k"), s.alias("shingle")),
        ),
    )
    g = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"),
        )
        .select("doc_id", F.explode_outer(tagged).alias("p"))
        .select("doc_id", F.col("p.k").alias("k"), F.col("p.shingle").alias("shingle"))
    )
    cnt = g.groupBy("doc_id", "k", "shingle").agg(
        F.count("shingle").alias("c")  # sentinel rows count 0
    )
    k2, k3 = F.col("k") == 2, F.col("k") == 3
    out = cnt.groupBy("doc_id").agg(
        F.coalesce(F.max(F.when(k2, F.col("c"))), F.lit(0)).cast("long").alias("top2"),
        F.coalesce(F.sum(F.when(k2, F.col("c"))), F.lit(0)).cast("long").alias("total2"),
        F.coalesce(F.sum(F.when(k3 & (F.col("c") > 1), F.col("c"))), F.lit(0))
        .cast("long")
        .alias("dup3"),
        F.coalesce(F.sum(F.when(k3, F.col("c"))), F.lit(0)).cast("long").alias("total3"),
    )
    return out.withColumn(
        "keep",
        (F.col("top2") * 5 <= F.col("total2")) & (F.col("dup3") * 2 <= F.col("total3")),
    )


LM_VOCAB_CAP = 65536

# keep iff mean token surprisal <= 3.405 nats (perplexity ~30 under the
# corpus's own unigram LM) — derived from the measured per-doc mean
# distribution on the test corpus (p75 ~3.4053e6 micro-nats at all three
# SFs, max 3.7-4.0e6), so the filter drops the rare-token-heavy tail at
# every scale factor while the comparison stays integer-exact
LM_KEEP_THRESH_MICRO = 3_405_000


def lm_surprisal_filter(
    docs: DataFrame,
    vocab_cap: int = LM_VOCAB_CAP,
    keep_thresh_micro: int = LM_KEEP_THRESH_MICRO,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, surprisal_micro, keep): CCNet-style unigram-LM
    quality filter — per-doc total fixed-point surprisal (micro-nats)
    under the corpus's own unigram distribution; keep iff
    ``surprisal_micro <= n_tokens * keep_thresh_micro`` (integer
    cross-multiplication; zero-token docs keep vacuously).

    Engine-exact by the rule-20 recipe (kernels in ``oracle/lm.py``): the
    ONLY transcendental (``ln``) runs driver-side in Python over the
    bounded top-``vocab_cap`` count table and is inlined as a literal
    broadcast dim; executors and the SQL twin only ever add BIGINTs.
    Tokens ranked past the cap (or unseen at apply time) take the
    add-half OOV surprisal — same formula both sides.

    Scale shape: one map-side-combined token count (the Zipf-compressed
    word table, same as BPE training), ONE bounded driver collect
    (vocab_cap rows — the tokenizer-artifact size class), then a single
    corpus pass: scan → explode_outer (zero-token docs ride along as a
    null-token sentinel; no corpus⋈corpus join-back) → broadcast join →
    one doc_id aggregation. No Python UDFs, nothing float on executors.
    """
    from ..oracle.lm import oov_lp_micro, vocab_table

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(
            F.filter(
                F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok"),
    )
    counts = (
        toks.filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    # total token count N: one scalar agg (exact at any cap); the top-cap
    # collect is bounded by vocab_cap — both the bounded-driver-action
    # class (VERDICT r4 audit)
    n_total = counts.agg(F.sum("c")).collect()[0][0] or 0
    top = (
        counts.orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(vocab_cap)
        .collect()
    )
    if n_total == 0:
        return docs.select(
            F.col(id_col).alias("doc_id"),
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("surprisal_micro"),
            F.lit(True).alias("keep"),
        )
    table = vocab_table(
        {r["tok"]: r["c"] for r in top}, vocab_cap, n_total=n_total
    )
    oov = oov_lp_micro(n_total)
    dim = docs.sparkSession.createDataFrame(
        list(table.items()), "tok string, lp long"
    )
    per_doc = (
        toks.join(F.broadcast(dim), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("tok").cast("long").alias("n_tokens"),
            F.coalesce(
                F.sum(
                    F.when(F.col("tok").isNull(), F.lit(0)).otherwise(
                        F.coalesce(F.col("lp"), F.lit(oov))
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("surprisal_micro"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "surprisal_micro",
        (
            F.col("surprisal_micro")
            <= F.col("n_tokens") * F.lit(keep_thresh_micro)
        ).alias("keep"),
    )


def distill_quality_classifier(
    docs: DataFrame,
    n_buckets: int = 512,
    scale: int = 1_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score, student_keep, teacher_keep): distill the composite
    quality heuristic into a hashed-feature linear classifier and apply it
    corpus-wide — the FineWeb-Edu / DCLM pattern where an expensive
    "teacher" judgment is compressed into a cheap linear student that the
    full crawl can afford. Here the teacher is the engine-stable
    ``quality_score`` keep decision; the student is a Naive-Bayes-style
    likelihood-ratio scorer over hashed token unigrams.

    Everything is integer-exact: per-bucket class counts (pos/neg token
    occurrences under the teacher label) are plain distributed sums;
    weights are add-one-smoothed fixed-point ratios
    ``(pos+1)·scale // (P+B) − (neg+1)·scale // (N+B)`` (floor division on
    non-negatives — identical in Python and DuckDB); a document's score is
    the BIGINT sum of its tokens' weights, keep = score > 0. Weights are
    bounded by ±``scale`` so scores never overflow BIGINT at any corpus
    size — the normalization is what makes this 100 TB-safe, unlike raw
    cross-products.

    Scale shape: training is ONE map-side-combined aggregation down to
    ≤``n_buckets`` rows (the only shuffle), collected driver-side
    (bounded at any corpus size) and re-broadcast as a map literal;
    inference is then a ZERO-shuffle map-only stage — a codegen
    ``aggregate`` over the token array with a map lookup, no explode, no
    join, no Python. Unseen buckets fall back to the smoothed-zero weight
    so a trained model serves new documents.

    Ref: the reference has no corpus filtering (hand-curated annotation
    sets); SURVEY §2.12 training-data extension family."""
    from ..functions.textstats import quality_score

    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: F.length(x) > 0
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(toks, F.array().cast("array<string>")).alias("t"),
        # explicit null-text branch: quality_score(NULL) is 0.625 on Spark
        # (a size(NULL) artifact) but NULL in the SQL formulation — unknown
        # content is NOT kept, and both twins say so for the same reason
        F.when(F.col(text_col).isNull(), F.lit(False))
        .otherwise(F.round(quality_score(F.col(text_col)), 6) >= 0.5)
        .alias("teacher_keep"),
    )
    counts = (
        base.select("teacher_keep", F.explode("t").alias("tok"))
        .withColumn("b", poly_hash(F.col("tok")) % n_buckets)
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("teacher_keep"), 1).otherwise(0)).alias("pos"),
            F.sum(F.when(F.col("teacher_keep"), 0).otherwise(1)).alias("neg"),
        )
        .collect()  # ≤ n_buckets rows at ANY corpus size
    )
    p_tot = sum(int(r["pos"]) for r in counts)
    n_tot = sum(int(r["neg"]) for r in counts)

    def _w(pos: int, neg: int) -> int:
        return (pos + 1) * scale // (p_tot + n_buckets) - (neg + 1) * scale // (
            n_tot + n_buckets
        )

    weights = {int(r["b"]): _w(int(r["pos"]), int(r["neg"])) for r in counts}
    w_oov = _w(0, 0)
    if weights:
        wmap = F.create_map(
            *[
                F.lit(x).cast("long")
                for b, wt in sorted(weights.items())
                for x in (b, wt)
            ]
        )

        def _lookup(c):
            return F.coalesce(wmap[c], F.lit(w_oov).cast("long"))

    else:  # empty corpus: every token (there are none) would be OOV

        def _lookup(c):
            return F.lit(w_oov).cast("long")

    score = F.aggregate(
        F.col("t"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + _lookup(poly_hash(x) % n_buckets),
    )
    return base.select(
        "doc_id",
        score.alias("score"),
        (score > 0).alias("student_keep"),
        "teacher_keep",
    )


def mixture_upsample(
    docs: DataFrame,
    rate_ppm,
    id_col: str = "doc_id",
    source_col: str = "source",
    ppm: int = 1_000_000,
) -> DataFrame:
    """(doc_id, source, n_copies, copy): deterministic FRACTIONAL
    replication — the mixture-application step (DoReMi/Pile-style domain
    weights) that ``weighted_sample`` (keep/drop only) cannot express. A
    rate of 2.3×10⁶ ppm yields 2 copies always plus a 3rd for the 30 % of
    docs whose fractional hash falls under the remainder; a rate under
    1×10⁶ downsamples (0 copies drops the doc). Expected copy count over
    any corpus equals the configured mixture weight exactly, and the
    decision is a pure function of (source, doc_id) — reproducible on any
    cluster size / partitioning, replayable bit-for-bit in SQL.

    ``rate_ppm`` is a Column (map-literal lookup over driver-known
    weights, or any derived expression) so the whole operator is ONE
    zero-shuffle map + explode stage that composes with any scan.

    Ref: the reference has no mixture machinery; SURVEY §2.12
    training-data extension."""
    # the odd-multiplier scramble matters: the raw polynomial hash is
    # near-affine in trailing characters, so consecutive doc_ids of one
    # source land in one narrow band and a bare ``% ppm`` would give whole
    # id-runs the same fractional decision (measured: 100 consecutive ids
    # span <9000 of the 10^6 buckets). After ×2654435761 consecutive
    # hashes are ~434434 buckets apart. Max intermediate <2.7e18 < 2^63.
    frac = (
        poly_hash(
            F.concat_ws(
                "|", F.col(source_col), F.col(id_col).cast("string")
            )
        )
        * 2654435761
    ) % ppm
    n = (
        F.floor(rate_ppm / F.lit(ppm)).cast("long")
        + (frac < rate_ppm % ppm).cast("long")
    )
    seq = F.when(n >= 1, F.sequence(F.lit(1).cast("long"), n)).otherwise(
        F.array().cast("array<long>")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        n.alias("n_copies"),
        F.explode(seq).alias("copy"),
    )


# count-min sketch hash family: seeded affine transforms over the portable
# polynomial hash, scrambled by the odd multiplier (see mixture_upsample)
# so token-space locality cannot band rows into few counters
_CMS_MOD = 1_000_000_007
_CMS_SCRAMBLE = 2654435761


def _cms_bucket(col, d: int, width: int):
    h = (poly_hash(col) * (2 * d + 3) + (7 * d + 10)) % _CMS_MOD
    return (h * _CMS_SCRAMBLE) % _CMS_MOD % width


def cms_sketch(
    docs: DataFrame,
    width: int = 1024,
    depth: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """(d, j, cnt): the count-min sketch of the corpus token stream —
    ``depth`` hash rows × ``width`` counters, each cell the total count of
    tokens landing there. THE bounded-memory frequency structure for open
    vocabularies: the aggregation state is ``depth·width`` cells no
    matter how many distinct tokens a 100 TB crawl holds (an exact
    vocabulary count table is unbounded), map-side combined, one shuffle
    of at most ``depth·width`` groups."""
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok")
    )
    rows = toks.select(
        "tok", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    )
    return (
        rows.select(
            F.col("d").cast("long").alias("d"),
            F.element_at(
                F.array(
                    *[_cms_bucket(F.col("tok"), d, width) for d in range(depth)]
                ),
                (F.col("d") + 1).cast("int"),
            ).alias("j"),
        )
        .groupBy("d", "j")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_heavy_hitters(
    docs: DataFrame,
    width: int = 1024,
    depth: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """(token, true_count, est_count, overestimated): every distinct token
    with its exact count and its count-min estimate (min over the sketch's
    depth rows). The CMS guarantee — estimate ≥ truth always, equality
    unless another token collides in every row — is exposed as the
    ``overestimated`` flag, so the gate verifies the sketch's defining
    property value-for-value. At open-vocabulary scale the exact side of
    this query is replaced by the candidate stream being filtered (the
    sketch answers point queries from its ``depth·width`` cells); here the
    closed gate vocabulary keeps the exact twin cheap."""
    sketch = cms_sketch(docs, width=width, depth=depth, text_col=text_col)
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("token")
    )
    true_counts = toks.groupBy("token").agg(
        F.count("*").cast("long").alias("true_count")
    )
    probes = true_counts.select(
        "token",
        "true_count",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).select(
        "token",
        "true_count",
        F.col("d").cast("long").alias("d"),
        F.element_at(
            F.array(*[_cms_bucket(F.col("token"), d, width) for d in range(depth)]),
            (F.col("d") + 1).cast("int"),
        ).alias("j"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["d", "j"])
        .groupBy("token", "true_count")
        .agg(F.min("cnt").cast("long").alias("est_count"))
    )
    return est.select(
        "token",
        "true_count",
        "est_count",
        (F.col("est_count") > F.col("true_count")).alias("overestimated"),
    )


def hll_registers(
    docs: DataFrame,
    m_registers: int = 64,
    rank_bits: int = 24,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, j, max_rank): per-group HyperLogLog register state over
    the distinct-token stream — the MERGEABLE distinct-count sketch: a
    100 TB corpus unions per-shard register tables with one more
    ``max`` (never re-reading data), then estimates cardinality from
    ``m`` integers per group. Only the integer state is emitted (the
    float harmonic estimate is a driver-side formula over ≤``m`` rows —
    see ``oracle`` tests); everything here is exact integer arithmetic:
    ``j = h mod m``, ``rank`` = leading-zero count of the
    ``rank_bits``-wide suffix + 1, computed as ``rank_bits + 1 −
    len(bin(v))`` (both engines' ``bin()`` drops leading zeros), hash
    scrambled by the odd multiplier so token-space locality cannot skew
    registers."""
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.explode(
            F.filter(
                F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok"),
    )
    h = (poly_hash(F.col("tok")) * _CMS_SCRAMBLE) % _CMS_MOD
    j = (h % m_registers).cast("long")
    v = F.floor(h / m_registers).cast("long") % (2**rank_bits)
    rank = F.when(v > 0, F.lit(rank_bits + 1) - F.length(F.bin(v))).otherwise(
        F.lit(rank_bits + 1)
    )
    return (
        toks.select("source", j.alias("j"), rank.cast("long").alias("rank"))
        .groupBy("source", "j")
        .agg(F.max("rank").alias("max_rank"))
    )


def _bloom_positions(col, k: int, m_bits: int):
    """Array of the k seeded bloom bit positions of a string column —
    the CMS hash family over the portable polynomial hash."""
    return F.array(*[_cms_bucket(col, i, m_bits) for i in range(k)])


def bloom_decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    m_bits: int = 16384,
    k: int = 3,
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_shingles, n_overlap, n_bloom_hits, contaminated_exact,
    contaminated_bloom): decontamination through a BLOOM FILTER of the
    eval shingle set — the scale path when the exact set outgrows a
    broadcast: the filter is a fixed ``m_bits``-bound artifact no matter
    how many benchmark shingles exist, mergeable across eval suites by
    OR. A shingle "hits" iff ALL ``k`` seeded positions are set; bloom
    hits can only OVERSHOOT exact overlap (no false negatives — the
    guarantee the exact columns verify row-by-row), so the bloom flag is
    a conservative superset of the exact flag at the same threshold.

    Scale shape: the set-bit table (≤ ``m_bits`` rows) is broadcast; the
    corpus side is one distinct-shingle stream exploded ×k, one
    (doc, shingle) hit reduction, one doc-keyed aggregation."""
    sh = (
        token_shingles(docs, n=n, id_col=id_col, text_col=text_col)
        .select("doc_id", "shingle")
        .distinct()
    )
    ev = (
        token_shingles(eval_docs, n=n, id_col=id_col, text_col=text_col)
        .select("shingle")
        .distinct()
    )
    bits = (
        ev.select(
            F.explode(_bloom_positions(F.col("shingle"), k, m_bits)).alias("p")
        )
        .distinct()
        .withColumn("_set", F.lit(1))
    )
    probes = sh.select(
        "doc_id",
        "shingle",
        F.explode(_bloom_positions(F.col("shingle"), k, m_bits)).alias("p"),
    )
    hits = (
        probes.join(F.broadcast(bits), "p", "left")
        .groupBy("doc_id", "shingle")
        .agg((F.sum(F.coalesce(F.col("_set"), F.lit(0))) == k).alias("_hit"))
    )
    exact = ev.withColumn("_ov", F.lit(1))
    per_doc = (
        hits.join(F.broadcast(exact), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_ov"), F.lit(0))).cast("long").alias("n_overlap"),
            F.sum(F.when(F.col("_hit"), 1).otherwise(0))
            .cast("long")
            .alias("n_bloom_hits"),
        )
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    out = base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
        F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
        F.coalesce("n_bloom_hits", F.lit(0)).cast("long").alias("n_bloom_hits"),
    )
    return out.select(
        "*",
        (
            (F.col("n_shingles") > 0)
            & (F.col("n_overlap") * threshold_den >= F.col("n_shingles") * threshold_num)
        ).alias("contaminated_exact"),
        (
            (F.col("n_shingles") > 0)
            & (
                F.col("n_bloom_hits") * threshold_den
                >= F.col("n_shingles") * threshold_num
            )
        ).alias("contaminated_bloom"),
    )


LM2_VOCAB_CAP = 64
LM2_BIGRAM_CAP = 1024
# mean ≤ 3.42 nats/token under the bigram LM: splits the gate corpus
# 73/72/57 % kept at sf0.001/0.01/0.1 — both branches live everywhere
LM2_KEEP_THRESH_MICRO = 3_420_000


def lm_bigram_surprisal_filter(
    docs: DataFrame,
    vocab_cap: int = LM2_VOCAB_CAP,
    bigram_cap: int = LM2_BIGRAM_CAP,
    keep_thresh_micro: int = LM2_KEEP_THRESH_MICRO,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, surprisal_micro, keep): bigram-LM quality filter
    with stupid backoff — the n-gram step past ``lm_surprisal_filter``
    toward CCNet's KenLM: the first token pays its unigram surprisal,
    every later token pays the CONDITIONAL surprisal ln(c(w1)/c(w1,w2))
    when its bigram is tabled, else ln(2) backoff penalty + the unigram
    surprisal of w2. Same engine-exactness recipe (rule 20): both capped
    tables (top-``vocab_cap`` unigrams, top-``bigram_cap`` bigrams) are
    built from two map-side-combined counts, the only transcendentals run
    driver-side over those bounded tables and ship as literal broadcast
    dims, executors and the twin only add BIGINTs, keep is integer
    cross-multiplication.

    Scale shape: two count aggs (word-table- and bigram-table-sized
    after combine — Zipf-compressed, not corpus-sized), two bounded
    collects, then ONE corpus pass: scan → pair/first explode →
    broadcast joins → one doc_id aggregation. No Python on executors."""
    from ..oracle.lm import (
        backoff_penalty_micro,
        bigram_table,
        oov_lp_micro,
        vocab_table,
    )
    from .dedup import shingle_array

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
            lambda t: F.length(t) > 0,
        ).alias("t"),
    )
    toks = base.select("doc_id", F.explode("t").alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").cast("long").alias("c"))
    n_total = counts.agg(F.sum("c")).collect()[0][0] or 0
    if n_total == 0:
        return docs.select(
            F.col(id_col).alias("doc_id"),
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("surprisal_micro"),
            F.lit(True).alias("keep"),
        )
    top1 = (
        counts.orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(vocab_cap)
        .collect()
    )
    uni_full = {r["tok"]: int(r["c"]) for r in top1}
    bg_counts = (
        base.select(F.explode(shingle_array(F.col("t"), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").cast("long").alias("c"))
    )
    top2 = (
        bg_counts.orderBy(F.col("c").desc(), F.col("bg").asc())
        .limit(bigram_cap)
        .collect()
    )
    # c(w1) for tabled bigrams: w1 is at least as frequent as its bigram,
    # but may still rank past vocab_cap — fetch the exact counts for the
    # ≤bigram_cap distinct w1 values (bounded driver action)
    w1s = sorted({r["bg"].split(" ")[0] for r in top2})
    w1_counts = {
        r["tok"]: int(r["c"])
        for r in counts.filter(F.col("tok").isin(w1s)).collect()
    }
    tbl1 = vocab_table({t: c for t, c in uni_full.items()}, vocab_cap, n_total=n_total)
    tbl2 = bigram_table({r["bg"]: int(r["c"]) for r in top2}, w1_counts, bigram_cap)
    oov = oov_lp_micro(n_total)
    pen = backoff_penalty_micro()
    spark = docs.sparkSession
    dim1 = F.broadcast(spark.createDataFrame(list(tbl1.items()), "w2 string, lp1 long"))
    dim2 = F.broadcast(spark.createDataFrame(list(tbl2.items()), "bg string, lp2 long"))
    first = base.filter(F.size("t") >= 1).select(
        "doc_id", F.element_at(F.col("t"), 1).alias("w2")
    )
    first_lp = first.join(dim1, "w2", "left").select(
        "doc_id", F.coalesce(F.col("lp1"), F.lit(oov)).alias("lp")
    )
    pairs = base.select(
        "doc_id", F.explode(shingle_array(F.col("t"), 2)).alias("bg")
    ).withColumn("w2", F.element_at(F.split(F.col("bg"), " "), 2))
    pair_lp = (
        pairs.join(dim2, "bg", "left")
        .join(dim1, "w2", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.col("lp2"),
                F.lit(pen) + F.coalesce(F.col("lp1"), F.lit(oov)),
            ).alias("lp"),
        )
    )
    per_doc = (
        first_lp.unionByName(pair_lp)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("lp").cast("long").alias("surprisal_micro"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("surprisal_micro", F.lit(0))
            .cast("long")
            .alias("surprisal_micro"),
            (
                F.coalesce(F.col("surprisal_micro"), F.lit(0))
                <= F.coalesce(F.col("n_tokens"), F.lit(0))
                * F.lit(keep_thresh_micro)
            ).alias("keep"),
        )
    )
