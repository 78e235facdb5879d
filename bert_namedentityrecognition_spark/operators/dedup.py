"""Deduplication operators for web-scale corpora.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup detection over a
``documents``-style table. Design points for 100 TB:

- **exact**: one hash-shuffle on a 16-byte fingerprint, window min keeps the
  canonical copy. Never compares full texts.
- **minhash**: shingle → portable-polynomial universal hashes → per-doc min
  per seed (map-side combined agg); LSH banding turns O(n²) into a
  groupBy-band join that only pairs candidates sharing a band.
- **simhash**: 64-bit signature from token hashes; near-dups = signatures
  equal in all but ≤ k bits, found via pivot-on-bands (4×16-bit chunks).
- **ngram jaccard**: relational set-similarity join — shingles exploded,
  equi-join on shingle, count/|union| ≥ τ. A length/size prefilter bounds
  the candidate blowup.

The shingle/minhash hash is the *portable* polynomial family (same
arithmetic runs in DuckDB), so the driver's SQL oracle can verify the exact
signature values, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..functions.textstats import md5_fingerprint, poly_hash

POLY_MOD = 1_000_000_007

# fixed universal-hash parameters (seed family), deterministic everywhere
MINHASH_PARAMS = [(2 * i + 1, 7 * i + 3) for i in range(1, 17)]  # 16 seeds


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint, is_duplicate): duplicate = not the min-id doc of
    its fingerprint group. Null-text docs carry a null fingerprint and are
    NEVER duplicates — unknown content was not compared to anything, and a
    window partitioned on the null key would otherwise silently flag every
    null-text doc but one as a duplicate of the rest."""
    fp = docs.select(
        F.col(id_col).alias("doc_id"), md5_fingerprint(F.col(text_col)).alias("fingerprint")
    )
    w = Window.partitionBy("fingerprint")
    return fp.select(
        "doc_id",
        "fingerprint",
        (
            F.col("fingerprint").isNotNull()
            & (F.col("doc_id") != F.min("doc_id").over(w))
        ).alias("is_duplicate"),
    )


def shingle_array(toks, n: int):
    """Array column of n-token shingles over a token-array column, built
    JVM-side via transform + slice + array_join (no UDF).

    Guard: ``sequence(1, 0)`` is DESCENDING [1, 0] and ``slice(_, 0, n)``
    throws — docs with < n tokens (common in web text) must yield an
    empty array, matching the oracle's ``range(0, greatest(len-(n-1), 0))``.

    Pass a COLUMN holding the materialized token array, not the ``split``
    expression: inlining ``split`` into the lambda makes Spark re-split
    the whole text once per shingle — O(tokens²) per doc, measured 4×
    wall per 2× tokens — while a column reference is sliced O(n) per
    element."""
    n_shingles = F.size(toks) - (n - 1)
    idxs = F.sequence(F.lit(1), F.greatest(n_shingles, F.lit(1)))
    return F.when(
        n_shingles > 0,
        F.transform(idxs, lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def token_shingles(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    distinct: bool = True,
    outer: bool = False,
) -> DataFrame:
    """(doc_id, shingle): n-token shingles (see ``shingle_array``).
    ``distinct=True`` (the dedup default) keeps one row per
    (doc, shingle); ``distinct=False`` keeps multiplicity — needed by
    occurrence-counting consumers such as the repetition-quality signals
    in ``operators/corpus.py``. ``outer=True`` keeps shingle-less docs as
    one null-shingle sentinel row (``explode_outer``), so consumers can
    aggregate per doc without a corpus⋈corpus join-back to restore them."""
    sh = shingle_array(F.col("_toks"), n)
    exploded = F.explode_outer(sh) if outer else F.explode(sh)
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"),
    ).select("doc_id", exploded.alias("shingle"))
    return out.distinct() if distinct else out


def minhash_signatures(
    docs: DataFrame,
    n: int = 3,
    params: list[tuple[int, int]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, seed, minhash) — one row per doc per hash-family member.

    minhash_i(doc) = min over shingles of (a_i * poly(shingle) + b_i) % p.
    Aggregation is a plain groupBy min → map-side partial agg at scale.
    """
    params = params or MINHASH_PARAMS
    sh = token_shingles(docs, n=n, id_col=id_col, text_col=text_col)
    sh = sh.withColumn("h", poly_hash(F.col("shingle")))
    # one min-aggregate per hash-family member, then unpivot with stack():
    # the shuffle carries |docs|×k scalars instead of |shingles|×k rows
    aggs = [
        F.min((F.col("h") * a + b) % POLY_MOD).alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    g = sh.groupBy("doc_id").agg(*aggs)
    stack_args = ", ".join(f"{i}, m{i}" for i in range(len(params)))
    return g.select(
        "doc_id",
        F.expr(f"stack({len(params)}, {stack_args}) as (seed, minhash)"),
    ).select("doc_id", F.col("seed").cast("int").alias("seed"), "minhash")


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    bands: int = 4,
    params: list[tuple[int, int]] | None = None,
    jaccard_threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, jaccard): LSH candidates verified by true shingle
    Jaccard. Only docs sharing a full band of minhashes are compared."""
    params = params or MINHASH_PARAMS
    cand = lsh_band_candidates(
        docs, n=n, bands=bands, params=params, id_col=id_col, text_col=text_col
    )
    return verify_jaccard(cand, docs, n=n, id_col=id_col, text_col=text_col).filter(
        F.col("jaccard") >= jaccard_threshold
    )


def lsh_band_candidates(
    docs: DataFrame,
    n: int = 3,
    bands: int = 4,
    params: list[tuple[int, int]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b): the distinct LSH candidate pairs — docs sharing at
    least one full band of minhashes (the banded equi-join, never
    all-pairs).  Shared by ``minhash_lsh_pairs`` and
    ``contrastive_pairs``."""
    params = params or MINHASH_PARAMS
    rows_per_band = len(params) // bands
    sig = minhash_signatures(docs, n=n, params=params, id_col=id_col, text_col=text_col)
    banded = (
        sig.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                    lambda s: s["minhash"].cast("string"),
                ),
                ",",
            ).alias("band_sig")
        )
    )
    return (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "band_sig"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )


def candidate_overlap(
    pairs: DataFrame, docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_a, doc_b, inter, sz_a, sz_b): exact integer shingle-set
    overlap for candidate pairs — the shared stage behind
    ``verify_jaccard`` (float ratio) and ``contrastive_pairs``
    (integer-exact threshold label)."""
    sh = token_shingles(docs, n=n, id_col=id_col, text_col=text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingle"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle").alias("shingle_b"))
    inter = (
        pairs.join(a, "doc_a")
        .join(b, (pairs.doc_b == b.doc_b) & (F.col("shingle") == F.col("shingle_b")))
        .drop(b.doc_b)
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
    )


def verify_jaccard(
    pairs: DataFrame, docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """True shingle-set Jaccard for candidate pairs."""
    return candidate_overlap(
        pairs, docs, n=n, id_col=id_col, text_col=text_col
    ).select(
        "doc_a",
        "doc_b",
        (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias("jaccard"),
    )


def contrastive_pairs(
    docs: DataFrame,
    n: int = 3,
    bands: int = 4,
    params: list[tuple[int, int]] | None = None,
    pos_num: int = 1,
    pos_den: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, inter, uni, label): contrastive TRAINING-PAIR mining
    for embedding models over the LSH candidate stream — ``positive`` when
    shingle Jaccard ≥ pos_num/pos_den (a true near-duplicate: the pair an
    embedding should map close), ``hard_negative`` otherwise (the pair
    COLLIDED in a minhash band yet is not a near-dup — lexically confusable,
    exactly the negatives contrastive training needs; random negatives are
    trivially separable).

    Integer-exact label (rule 11): ``pos_den·inter ≥ pos_num·(sz_a+sz_b−
    inter)`` — no float ratio crosses an engine boundary.  Scale shape:
    candidates come from the banded equi-join (never all-pairs); overlap is
    one shingle join + map-side-combined count; the label is codegen'd
    arithmetic.  The mined table feeds a (doc_a, doc_b, label) training
    manifest — at 100 TB it is written bucketed by doc_a for the
    per-anchor batch sampler."""
    cand = lsh_band_candidates(
        docs, n=n, bands=bands, params=params, id_col=id_col, text_col=text_col
    )
    ov = candidate_overlap(cand, docs, n=n, id_col=id_col, text_col=text_col)
    uni = F.col("sz_a") + F.col("sz_b") - F.col("inter")
    return ov.select(
        "doc_a",
        "doc_b",
        F.col("inter").cast("long").alias("inter"),
        uni.cast("long").alias("uni"),
        F.when(
            F.lit(int(pos_den)) * F.col("inter") >= F.lit(int(pos_num)) * uni,
            F.lit("positive"),
        )
        .otherwise(F.lit("hard_negative"))
        .alias("label"),
    )


def minhash_dedup_clusters(
    docs: DataFrame,
    n: int = 3,
    bands: int = 4,
    params: list[tuple[int, int]] | None = None,
    jaccard_threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_components: bool = True,
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, keep) for EVERY document — the
    production fuzzy-dedup shape (RefinedWeb/FineWeb style): LSH candidate
    pairs verified by true Jaccard, collapsed transitively into clusters
    via connected components, one canonical keeper (min doc_id) per
    cluster. Transitivity is the point: A≈B and B≈C puts A and C in one
    cluster even when their direct Jaccard is below threshold — pairwise
    dedup alone would keep both.

    Scale shape: the pair graph is banded (never all-pairs), components
    use the alternating large/small-star O(log²) variant (diameter-safe
    for duplicate chains), and the corpus-side mapback is one join on
    doc_id plus ONE window shuffle on cluster_id (size + keeper from the
    same partition — no corpus-sized join-back). ``broadcast_components``
    hints the mapback join: components only contain docs that appear in a
    verified near-dup pair, typically a small fraction of the corpus; at
    a duplicate-heavy 100 TB crawl set it False and let AQE pick the
    shuffle join.

    Ref: the reference has no corpus dedup (single-document NER); this is
    the SURVEY §2.12 training-data-pipeline extension family."""
    from .canonicalize import connected_components_star

    pairs = minhash_lsh_pairs(
        docs,
        n=n,
        bands=bands,
        params=params,
        jaccard_threshold=jaccard_threshold,
        id_col=id_col,
        text_col=text_col,
    )
    comps = connected_components_star(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    ).select(F.col("node").alias("doc_id"), F.col("component"))
    if broadcast_components:
        comps = F.broadcast(comps)
    base = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comps, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    w = Window.partitionBy("cluster_id")
    return base.select(
        "doc_id",
        "cluster_id",
        F.count("*").over(w).alias("cluster_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"),
    )


def naive_join_blowup(
    sh: DataFrame, sample_mod: int = 64, id_col: str = "doc_id"
) -> float:
    """Corpus probe: estimated rows-per-occurrence blowup of the naive
    shingle self-join, ``Σ df·(df−1) / Σ df + 1``, from a deterministic
    ~1/``sample_mod`` hash-sample of documents.

    Corpus-pair counts scale as df², so the sample's pair sum is scaled by
    ``sample_mod²`` and its occurrence sum by ``sample_mod`` (unbiased for
    corpus-shared shingles; rare shingles contribute ~0 to both). The
    statistic grows LINEARLY with corpus size for a fixed shingle
    distribution — which is exactly why the naive join that wins at bench
    scale loses at 100 TB, and why this must be probed, not hardcoded.

    This is one bounded aggregate over a sample, run deliberately at
    plan-construction time (same policy as IVF's training collect): the
    result decides plan SHAPE, which cannot be deferred to execution."""
    s = sh.filter((F.abs(F.hash(F.col(id_col))) % sample_mod) == 0)
    row = (
        s.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .agg(
            F.sum(F.col("df") * (F.col("df") - 1)).alias("s2"),
            F.sum("df").alias("s1"),
        )
        .first()
    )
    if not row or not row.s1:
        return 0.0  # empty sample: no blowup, naive join is free anyway
    return sample_mod * row.s2 / row.s1 + 1.0


# Calibration (local[8], measured): blowup 5.4 (documents sf0.1) → naive 2×
# faster (5.8 s vs 11.7 s); blowup 81 (6k-doc boilerplate web corpus) →
# naive still 1.4× faster (7.7 s vs 10.6 s); blowup 207 (15k-doc same
# distribution) → PPJoin 2× faster (21 s vs 42 s). Wall-time breakeven ≈
# 110; 100 keeps a small margin toward the scalable plan. The statistic
# grows linearly with corpus size, so any web-scale corpus probes in the
# thousands and flips the filter ON.
BLOWUP_CUTOFF = 100.0


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_filter: bool | str = "auto",
) -> DataFrame:
    """All pairs with shingle-Jaccard ≥ threshold via the relational
    set-similarity join (shingle equi-join prunes non-overlapping pairs; a
    size-ratio prefilter removes pairs that cannot reach the threshold).

    ``prefix_filter`` enables the PPJoin-style candidate pruning (EXACT — no
    false negatives): shingles get a global rarity order (document frequency
    asc, shingle asc); two sets with J ≥ τ must overlap within their first
    ``sz - ⌈τ·sz⌉ + 1`` rarest shingles (pigeonhole on the bound
    inter ≥ τ·max(sz_a, sz_b)). Candidate generation then joins only
    prefixes, and verification recomputes the true intersection on full
    shingle sets, so results are identical to the naive join.

    Measured tradeoff: on an open-vocabulary (Zipfian) web corpus, hot
    shingles sort to the END of the rarity order and drop out of every
    prefix, collapsing the quadratic blowup — that is the 100 TB setting
    and prefix filtering is the right call. On this repo's closed-31-word
    bench corpus every shingle is hot, prefixes still collide, and the
    extra df-count + window + verify stages make it 2× SLOWER (5.8 s →
    11.7 s at sf0.1, local[8]).

    Default ``"auto"``: decide from the :func:`naive_join_blowup` probe
    (blowup ≥ BLOWUP_CUTOFF → prefix filter; else naive), so the 100 TB-
    relevant regime gets the scalable plan without hand-tuning. Pass
    True/False to pin the plan (no probe job runs)."""
    sh = token_shingles(docs, n=n, id_col=id_col, text_col=text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    if prefix_filter == "auto":
        prefix_filter = naive_join_blowup(sh, id_col="doc_id") >= BLOWUP_CUTOFF
    elif not isinstance(prefix_filter, bool):
        raise ValueError(f"prefix_filter must be True/False/'auto', got {prefix_filter!r}")
    if prefix_filter:
        df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        ranked = (
            sh.join(df_counts, "shingle")
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("doc_id").orderBy("df", "shingle")
                ),
            )
        )
        prefix = (
            ranked.join(sizes, "doc_id")
            .filter(F.col("rk") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1)
            .select("doc_id", "shingle")
        )
        cand = (
            prefix.alias("a")
            .join(prefix.alias("b"), "shingle")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )
        a_full = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        b_full = sh.select(
            F.col("doc_id").alias("_doc_b"), F.col("shingle").alias("shingle_b")
        )
        inter = (
            cand.join(a_full, "doc_a")
            .join(
                b_full,
                (F.col("doc_b") == F.col("_doc_b"))
                & (F.col("shingle") == F.col("shingle_b")),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("inter"))
        )
    else:
        a = sh.alias("a")
        b = sh.alias("b")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count("*").alias("inter"))
        )
    joined = (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")),
            "doc_b",
        )
        # size prefilter: J ≤ min/max ⇒ require min/max ≥ τ
        .filter(
            F.least("sz_a", "sz_b") / F.greatest("sz_a", "sz_b") >= F.lit(threshold)
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return joined


def shingle_count_vectors(
    docs: DataFrame,
    n: int = 3,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bucket, cnt): hashed-feature embedding of each document —
    distinct n-token shingles hashed into ``dim`` buckets (portable
    polynomial hash, same arithmetic as the DuckDB oracle), stored sparse.

    This is the classic hashing-trick bag-of-shingles vector; at 100 TB use
    dim = 2**16..2**20 so bucket collisions stay rare and the inner-product
    join below stays selective."""
    sh = token_shingles(docs, n=n, id_col=id_col, text_col=text_col)
    return (
        sh.withColumn("bucket", poly_hash(F.col("shingle")) % dim)
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def embedding_cosine_dups(
    docs: DataFrame,
    n: int = 3,
    dim: int = 64,
    threshold_num: int = 289,
    threshold_den: int = 400,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, integer-exact.

    cosine(a,b) ≥ t  ⇔  den·dot(a,b)² ≥ num·‖a‖²·‖b‖² (dot > 0), with
    t² = num/den (default 289/400 = 0.85²) — no floats anywhere, so the
    DuckDB oracle matches bit-for-bit.

    Execution is the sparse inner-product join: explode vectors to
    (doc, bucket, cnt), equi-join on bucket, one groupBy(pair) sum — pairs
    sharing no bucket are never materialized. Shuffle is keyed by bucket
    then by (doc_a, doc_b); with web-scale dim (2**16+) bucket keys are
    plentiful so no single reducer is hot. For quadratic-heavy corpora, run
    :func:`~..operators.similarity.embedding_near_dup_pairs` (LSH) as a
    candidate prefilter and this join only on candidates.

    Density warning (measured): on the closed-vocabulary bench corpus every
    doc pair shares buckets, so the inner-product join is effectively
    all-pairs — ~80 s for 5000 docs at local[16]. That is the corpus, not
    the plan: exact all-pairs cosine is Ω(pairs-with-shared-features). On
    open-vocabulary web text the same join is sparse; below ~millions of
    candidate pairs use this exact form, above it the LSH prefilter.

    Returns (doc_a, doc_b, dot, na, nb) — all BIGINT.
    Reference analogue: near-dup detection is beyond the reference (per the
    training-data-pipeline brief); semantics mirror ``ngram_jaccard_pairs``.
    """
    vec = shingle_count_vectors(docs, n=n, dim=dim, id_col=id_col, text_col=text_col)
    # squared norm rides along each vector row via a window over the same
    # doc_id partitioning the groupBy just produced (no re-shuffle) — no
    # separate norms table, no post-join lookups, and the shingle
    # derivation is computed twice (the self-join sides), not four times
    vec = vec.withColumn(
        "n2", F.sum(F.col("cnt") * F.col("cnt")).over(Window.partitionBy("doc_id"))
    )
    a = vec.select(
        F.col("doc_id").alias("doc_a"), "bucket",
        F.col("cnt").alias("cnt_a"), F.col("n2").alias("na"),
    )
    b = vec.select(
        F.col("doc_id").alias("doc_b"), "bucket",
        F.col("cnt").alias("cnt_b"), F.col("n2").alias("nb"),
    )
    # the predicate products run in decimal(38,0) (128-bit), NOT bigint:
    # at book-length docs dot²·den can pass 2^63 and non-ANSI bigint
    # multiplication WRAPS silently — wrong verdicts exactly in the
    # large-doc regime. DuckDB's sum() already returns HUGEINT (int128),
    # so this also keeps the twin's arithmetic domain matched.
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # loud overflow guard (unreachable at realistic shingle counts): under
    # non-ANSI mode a product past decimal(38) yields NULL, so the filter
    # would silently DROP the pair — the opposite of loud-failure. na·nb
    # itself always fits (both are bigint, product < 8.6e37 < 1e38), and
    # dot² ≤ na·nb by Cauchy-Schwarz, so bounding na·nb·max(num,den) under
    # 1e38 bounds every product in the predicate; past the bound we
    # raise_error instead of comparing.
    _lim = (10**38 - 1) // max(threshold_num, threshold_den, 1)
    nanb = d38(F.col("na")) * d38(F.col("nb"))
    # the guard is the FIRST conjunct of the filter (AND evaluates left
    # first, and a NULLed-out right operand would short-circuit a
    # comparison before any raise inside it): nanb itself always fits
    # decimal(38), and once nanb ≤ _lim, dot² ≤ nanb (Cauchy-Schwarz)
    # bounds every product in the real predicate under 1e38.
    guard = F.when(
        nanb > F.lit(str(_lim)).cast("decimal(38,0)"),
        F.raise_error(
            "embedding_cosine_dups: na*nb exceeds the decimal(38) "
            "overflow-safe bound; rescale thresholds or shard the vectors"
        ).cast("boolean"),
    ).otherwise(F.lit(True))
    return (
        a.join(b, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("dot"))
        .filter(
            guard
            & (
                d38(F.col("dot")) * d38(F.col("dot"))
                * F.lit(str(threshold_den)).cast("decimal(38,0)")
                >= nanb * F.lit(str(threshold_num)).cast("decimal(38,0)")
            )
        )
        .select("doc_a", "doc_b", "dot", "na", "nb")
    )


def simhash_signatures(
    docs: DataFrame, bits: int = 64, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, simhash): sign-aggregated token-hash signature, JVM-side.

    Per token t with weight=count: for each bit j, add +w if bit j of
    hash(t) set else -w; signature bit j = (sum_j > 0). Implemented with
    explode + groupBy over (doc, bit) then bit-OR assembly — no UDF.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    counted = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("w"))
    counted = counted.withColumn("h", F.xxhash64("tok"))
    bit_rows = (
        counted.select(
            "doc_id",
            "w",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        )
        .withColumn(
            "delta",
            F.expr("case when (shiftright(h, bit) & 1L) = 1 then w else -w end"),
        )
    )
    bit_sums = bit_rows.groupBy("doc_id", "bit").agg(F.sum("delta").alias("v"))
    return bit_sums.groupBy("doc_id").agg(
        F.sum(F.expr("case when v > 0 then shiftleft(1L, bit) else 0L end")).alias(
            "simhash"
        )
    )


def simhash_signatures_portable(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, simhash): 60-bit simhash from the *portable* polynomial hash
    family — 4 seeded universal hashes contribute 15 bits each, so the exact
    signature is reproducible in any ANSI engine (DuckDB oracle verifies
    values, not just row counts). 60 bits keeps every ``1 << bit`` inside a
    signed BIGINT. Same sign-aggregation dataflow as
    :func:`simhash_signatures` (which stays the scale path: ``xxhash64`` is
    one JVM call vs this family's per-character fold)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    counted = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("w"))
    counted = counted.withColumn("h", poly_hash(F.col("tok")))
    bit_rows = (
        counted.select(
            "doc_id",
            "w",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(59))).alias("bit"),
        )
        .withColumn("chunk", (F.col("bit") / 15).cast("long"))
        .withColumn("b", F.col("bit") % 15)
        .withColumn(
            "ck",
            ((F.col("h") * (2 * F.col("chunk") + 3) + (7 * F.col("chunk") + 10))
             % POLY_MOD) % 32768,
        )
        .withColumn(
            "delta",
            F.expr("case when (shiftright(ck, CAST(b AS INT)) & 1L) = 1 then w else -w end"),
        )
    )
    bit_sums = bit_rows.groupBy("doc_id", "bit").agg(F.sum("delta").alias("v"))
    return bit_sums.groupBy("doc_id").agg(
        F.sum(
            F.expr("case when v > 0 then shiftleft(1L, CAST(bit AS INT)) else 0L end")
        ).alias("simhash")
    )


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_a, doc_b, hamming ≤ max_hamming) via 16-bit-chunk blocking:
    signatures within hamming k ≤ 3 share at least one of 4 chunks exactly."""
    sig = simhash_signatures(docs, id_col=id_col, text_col=text_col)
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("chunk"),
    ).withColumn("ck", F.expr("shiftright(simhash, chunk * 16) & 65535"))
    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"), ["chunk", "ck"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("sig_a"),
            F.col("y.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def repeated_window_flags(
    docs: DataFrame,
    window: int = 5,
    max_dup_num: int = 1,
    max_dup_den: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document repeated-window detection — the hash-anchor step of
    exact-substring training-data dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": repeated ≥k-token spans
    across documents are memorization fuel; the scalable detector hashes
    fixed-length token windows and looks for hashes seen in ≥2 docs).

    Returns ``(doc_id, n_windows, dup_windows, keep)``:

    - ``n_windows``: rolling ``window``-token windows in the doc
      (``len(toks) - window + 1``, 0 when shorter),
    - ``dup_windows``: windows whose portable hash also occurs in at least
      one OTHER document (intra-doc repeats alone do not count — those are
      ``repetition_signals``' job),
    - ``keep`` iff ``dup_windows * max_dup_den <= n_windows * max_dup_num``
      (default ≤ 25 % duplicated) — integer cross-multiplication, so the
      decision is bit-identical in the DuckDB twin; window-less docs keep
      vacuously (0 ≤ 0).

    Hashing: per-token portable poly hash (base 31) folded across the
    window with base 131, both mod 1e9+7 — identical arithmetic in DuckDB
    ``list_reduce``. Collisions conflate distinct windows symmetrically in
    both engines (an anchor heuristic, not an exact-match proof — real
    pipelines verify anchors before cutting, as ``verify_jaccard`` does
    for the shingle family).

    Scale shape: ONE corpus scan → explode windows (``explode_outer``
    null-sentinels window-less docs, no corpus⋈corpus join-back) → the
    cross-doc test is ``min(doc_id) != max(doc_id)`` over a hash-keyed
    window function (one shuffle on ``whash``, no self-join, no distinct-
    count state) → one map-side-combined ``groupBy(doc_id)`` rollup.
    Two shuffles total regardless of corpus size; the whash shuffle
    carries one row per window occurrence — the same cardinality bound as
    the MinHash band shuffle. Guard: ``sequence(0, n - window)`` is
    DESCENDING for short docs (see ``shingle_array``), hence the
    ``when(size >= window)`` gate before ``explode_outer``."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    thash = F.transform(F.col("_toks"), lambda t: poly_hash(t))
    base = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .select("doc_id", thash.alias("_th"), F.size("_toks").alias("_n"))
        .select(
            "doc_id",
            "_th",
            F.explode_outer(
                F.when(
                    F.col("_n") >= window,
                    F.sequence(F.lit(0), F.col("_n") - window),
                )
            ).alias("pos"),
        )
        .select(
            "doc_id",
            "pos",
            F.when(
                F.col("pos").isNotNull(),
                F.aggregate(
                    F.slice(F.col("_th"), F.col("pos") + 1, window),
                    F.lit(0).cast("long"),
                    lambda a, x: (a * 131 + x) % 1_000_000_007,
                ),
            ).alias("whash"),
        )
    )
    w = Window.partitionBy("whash")
    marked = base.select(
        "doc_id",
        "pos",
        (
            F.col("pos").isNotNull()
            & (F.min("doc_id").over(w) != F.max("doc_id").over(w))
        ).alias("_dup"),
    )
    out = marked.groupBy("doc_id").agg(
        F.count("pos").cast("long").alias("n_windows"),
        F.coalesce(F.sum(F.col("_dup").cast("long")), F.lit(0))
        .cast("long")
        .alias("dup_windows"),
    )
    return out.withColumn(
        "keep",
        F.col("dup_windows") * max_dup_den <= F.col("n_windows") * max_dup_num,
    )


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    bands: int = 4,
    params: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """(doc_a, doc_b, inter, sz_a, sz_b, containment_ppm): ASYMMETRIC
    containment dedup over the LSH candidate stream — ``|A∩B| /
    min(|A|, |B|)`` catches subset duplication (a page embedded inside a
    longer page) that symmetric Jaccard dilutes below threshold.  Pairs
    kept when the smaller side is ≥ half contained; the ratio ships as
    integer ppm (rule 11).  Candidates are the banded equi-join
    (``lsh_band_candidates``), never all-pairs — same 100 TB shape as
    the Jaccard path."""
    cand = lsh_band_candidates(docs, n=n, bands=bands, params=params)
    ov = candidate_overlap(cand, docs, n=n)
    return (
        ov.filter(2 * F.col("inter") >= F.least("sz_a", "sz_b"))
        .select(
            "doc_a",
            "doc_b",
            F.col("inter").cast("long").alias("inter"),
            F.col("sz_a").cast("long").alias("sz_a"),
            F.col("sz_b").cast("long").alias("sz_b"),
            F.expr(
                "CAST(1000000 AS BIGINT) * inter DIV least(sz_a, sz_b)"
            ).alias("containment_ppm"),
        )
    )
