"""Distributed BPE tokenizer training — the subword-vocabulary step of a
from-scratch LLM training-data pipeline, Spark-first.

Semantics (classic Sennrich-style BPE, kernels in ``oracle/bpe.py``):
tokenize the corpus to words, compress to a word-frequency table, then
``num_merges`` times (1) count adjacent symbol pairs weighted by word
frequency with within-word multiplicity, (2) pick the argmax by
(count desc, left asc, right asc) — a total order, deterministic at any
cluster size — and (3) merge that pair everywhere, greedy leftmost
non-overlapping. No end-of-word marker (words are rows; merges cannot
cross word boundaries).

Scale shape — why this survives 100 TB:

- **The corpus is touched once.** Tokens → ``groupBy(word)`` is the
  classic Zipf compression: 100 TB of text collapses to a word-frequency
  table of ~10⁸ rows. Every training iteration runs on that table, never
  on the corpus.
- **Each iteration is one map-side-combined aggregation plus a
  zero-shuffle map.** Pair counting explodes adjacent pairs from the
  symbol arrays and sums per (left, right) with partial aggregation; the
  argmax is an ``orderBy(...).limit(1)`` — an O(1) driver collect (same
  bounded-scalar class as the connected-components convergence check).
  The merge application is a JVM-side ``aggregate`` fold over each word's
  symbol array — pure per-row compute, no shuffle, no Python.
- **Per-iteration ``localCheckpoint``** (CLAUDE.md rule 23) truncates the
  lineage so iteration *t* never replays iterations 0..t-1 from the scan.
- **Encoding is a broadcast join.** The trained segmentation is a
  vocab-sized dim; applying it to the corpus is tokens ⋈ broadcast(seg) —
  the zero-shuffle-per-row tokenize pass a 100 TB corpus needs. Unseen
  words at inference time would take the same fold as a fallback column.

The greedy-leftmost fold is exact as a single pass: a merged symbol
``left+right`` can never equal ``left`` (right non-empty), so a freshly
created symbol cannot seed an overlapping match — see
``oracle/bpe.apply_merge`` and the hypothesis property test.

Reference parity: the reference loads a pre-trained WordPiece vocabulary
(`/root/reference/BERT/Model.py:36-60`); this operator trains that
artifact's BPE cousin from the raw corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def corpus_words(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(tok, c): the word-frequency table — whitespace tokens with corpus
    counts (same tokenization as ``corpus.oov_ratio`` and the SQL twins)."""
    return (
        docs.select(
            F.explode(
                F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
            ).alias("tok")
        )
        .filter(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("c"))
    )


def _init_symbols(words: DataFrame) -> DataFrame:
    """Add ``syms``: the word's characters (code points, UTF-8 aware —
    matches DuckDB ``substring``; avoids Java-regex split which cuts
    surrogate pairs)."""
    one = F.lit(1)
    syms = F.transform(
        F.sequence(one, F.length("tok")), lambda i: F.col("tok").substr(i, one)
    )
    return words.withColumn("syms", syms)


def _adjacent_pairs(words: DataFrame) -> DataFrame:
    """(l, r, c): one row per adjacent symbol pair occurrence (within-word
    multiplicity), carrying the word count."""
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at("syms", i).alias("l"),
                F.element_at("syms", i + 1).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    return words.select(F.explode(pairs).alias("p"), "c").select(
        F.col("p.l").alias("l"), F.col("p.r").alias("r"), "c"
    )


def _merge_fold(left: str, right: str):
    """JVM-side greedy leftmost merge of (left, right) over the ``syms``
    array: a single ``aggregate`` fold (see module docstring for why one
    pass is exact). ``F.get`` (0-based, NULL out of bounds) keeps the
    empty-accumulator probe safe under ANSI mode."""
    lw, rw = F.lit(left), F.lit(right)

    def step(acc, s):
        match = (
            (F.size(acc) > 0) & (F.get(acc, F.size(acc) - 1) == lw) & (s == rw)
        )
        merged = F.concat(
            F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(left + right))
        )
        return F.when(match, merged).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(
        F.col("syms"), F.array().cast("array<string>"), step
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Train ``num_merges`` BPE merges on the corpus.

    Returns ``(merges, segmented)``: the merge list as
    (left, right, pair_count) in training order, and the segmented
    word-frequency table (tok, c, syms) after all merges — each word's
    state is carried through the distributed folds, checkpointed per
    iteration. Stops early if no adjacent pair remains.
    """
    words = _init_symbols(corpus_words(docs, id_col=id_col, text_col=text_col))
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        top = (
            _adjacent_pairs(words)
            .groupBy("l", "r")
            .agg(F.sum("c").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], top[0]["cnt"]
        merges.append((left, right, int(cnt)))
        words = words.withColumn("syms", _merge_fold(left, right))
        words = words.localCheckpoint(eager=True)
    return merges, words


def segmented_vocab(
    docs: DataFrame,
    num_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(tok, c, n_pieces, pieces): the trained subword segmentation of the
    corpus vocabulary — ``pieces`` space-joined for a stable gate schema."""
    _, words = bpe_train(docs, num_merges, id_col=id_col, text_col=text_col)
    return words.select(
        "tok",
        "c",
        F.size("syms").cast("long").alias("n_pieces"),
        F.array_join("syms", " ").alias("pieces"),
    )


def merge_table(
    docs: DataFrame,
    num_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(step, left, right, pair_count): the trained merge list as a
    DataFrame — the tokenizer artifact a downstream encode job ships.

    Built by re-running the pair-count aggregation on each checkpointed
    iteration state and unioning the k one-row argmax plans, so every
    value is produced by the distributed plan (not a driver literal); the
    driver-side loop only steers which pair to fold next.
    """
    words = _init_symbols(corpus_words(docs, id_col=id_col, text_col=text_col))
    words = words.localCheckpoint(eager=True)
    steps: list[DataFrame] = []
    for step in range(num_merges):
        best = (
            _adjacent_pairs(words)
            .groupBy("l", "r")
            .agg(F.sum("c").cast("long").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
        )
        top = best.collect()
        if not top:
            break
        steps.append(
            best.select(
                F.lit(step).cast("long").alias("step"),
                F.col("l").alias("left"),
                F.col("r").alias("right"),
                "pair_count",
            )
        )
        words = words.withColumn(
            "syms", _merge_fold(top[0]["l"], top[0]["r"])
        ).localCheckpoint(eager=True)
    if not steps:
        spark = SparkSession.getActiveSession()
        return spark.createDataFrame(
            [], "step long, left string, right string, pair_count long"
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


def bpe_encode(
    docs: DataFrame,
    segmented: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, n_pieces): per-document subword counts — the
    corpus tokenize pass. The trained segmentation is vocab-sized, so it
    broadcasts; the corpus side is a zero-shuffle token stream aggregated
    once on doc_id. Words absent from the segmentation (impossible when
    trained on the same corpus) count their characters, the untrained
    fallback.

    ``explode_outer`` over the FILTERED token array keeps zero-token docs
    as one null-token row, so the whole pass is scan → broadcast join →
    one aggregation — no corpus⋈corpus join-back to restore empty docs
    (the first cut's join-back planned as a SortMergeJoin of two
    corpus-sized sides; null join keys don't match, so the sentinel rows
    pass through the broadcast join untouched)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(
            F.filter(
                F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok"),
    )
    seg = segmented.select("tok", F.col("n_pieces").alias("_np"))
    return (
        toks.join(F.broadcast(seg), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("tok").cast("long").alias("n_tokens"),
            F.coalesce(
                F.sum(F.coalesce(F.col("_np"), F.length("tok").cast("long"))),
                F.lit(0),
            )
            .cast("long")
            .alias("n_pieces"),
        )
    )


def _wp_scored_best(words: DataFrame) -> DataFrame:
    """One-row DataFrame of the WordPiece-best pair at the current state:
    likelihood score ``cnt/(sl·sr)`` (DOUBLE division of exact BIGINTs —
    correctly rounded, so Spark / Python / DuckDB order candidates
    identically), ties (l, r) ascending. Carries the integer witnesses
    (pair_count, left_count, right_count)."""
    pairs = _adjacent_pairs(words).groupBy("l", "r").agg(
        F.sum("c").cast("long").alias("cnt")
    )
    scnt = (
        words.select(F.explode("syms").alias("s"), "c")
        .groupBy("s")
        .agg(F.sum("c").cast("long").alias("sc"))
    )
    scored = (
        pairs.join(
            F.broadcast(scnt.select(F.col("s").alias("l"), F.col("sc").alias("sl"))),
            "l",
        )
        .join(
            F.broadcast(scnt.select(F.col("s").alias("r"), F.col("sc").alias("sr"))),
            "r",
        )
    )
    score = F.col("cnt").cast("double") / (F.col("sl") * F.col("sr")).cast("double")
    return scored.orderBy(
        score.desc(), F.col("l").asc(), F.col("r").asc()
    ).limit(1)


def wordpiece_merge_table(
    docs: DataFrame,
    num_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(step, left, right, pair_count, left_count, right_count): WordPiece
    likelihood-scored merge training — the Schuster-Nakajima criterion
    ``cnt/(sl·sr)`` (prefer pairs whose parts rarely appear apart) where
    BPE takes raw frequency; everything else (greedy leftmost fold,
    per-iteration checkpoint, one map-side-combined pair agg + one
    symbol-count agg per step, O(1) argmax collects) is the proven BPE
    machinery. Like ``merge_table``, every value comes from the
    distributed plan; the driver loop only steers.

    Ref: the reference consumes a pre-trained WordPiece vocabulary
    (``BERT/Model.py`` tokenizer); training it distributed is the SURVEY
    §2.12 tokenizer extension, next to BPE."""
    words = _init_symbols(corpus_words(docs, id_col=id_col, text_col=text_col))
    words = words.localCheckpoint(eager=True)
    steps: list[DataFrame] = []
    for step in range(num_merges):
        best = _wp_scored_best(words)
        top = best.collect()
        if not top:
            break
        steps.append(
            best.select(
                F.lit(step).cast("long").alias("step"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.col("cnt").alias("pair_count"),
                F.col("sl").alias("left_count"),
                F.col("sr").alias("right_count"),
            )
        )
        words = words.withColumn(
            "syms", _merge_fold(top[0]["l"], top[0]["r"])
        ).localCheckpoint(eager=True)
    if not steps:
        spark = SparkSession.getActiveSession()
        return spark.createDataFrame(
            [],
            "step long, left_sym string, right_sym string, pair_count long,"
            " left_count long, right_count long",
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


def wordpiece_segmented_vocab(
    docs: DataFrame,
    num_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(tok, c, n_pieces, pieces): corpus vocabulary segmented by the
    WordPiece-likelihood merges (the artifact an encode pass broadcasts)."""
    words = _init_symbols(corpus_words(docs, id_col=id_col, text_col=text_col))
    words = words.localCheckpoint(eager=True)
    for _ in range(num_merges):
        top = _wp_scored_best(words).collect()
        if not top:
            break
        words = words.withColumn(
            "syms", _merge_fold(top[0]["l"], top[0]["r"])
        ).localCheckpoint(eager=True)
    return words.select(
        "tok",
        "c",
        F.size("syms").cast("long").alias("n_pieces"),
        F.array_join("syms", " ").alias("pieces"),
    )
