"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk``      — brute-force baseline: broadcast the (small) query
  set, JVM-side dot product via ``zip_with`` + ``aggregate`` (no Python in
  the scan), window top-k. Exact; scan cost O(n·q·d) stays in codegen.
- ``lsh_cosine_topk``  — scale path: random-hyperplane (sign) LSH; vectors
  are bucketed by an m-bit signature, queries probe only their own bucket
  (optionally multi-probe by hamming-adjacent buckets). Approximate; at
  10^12 rows the probe touches |bucket| ≈ n / 2^m rows instead of n.

Hyperplanes are generated deterministically (seeded) on the driver and
broadcast as literal arrays — no data-dependent state, identical plans at
any cluster size.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_expr(a, b):
    """NULL for zero-norm inputs (ANSI mode would otherwise throw
    DIVIDE_BY_ZERO); NULL scores sort last under desc ordering and fail
    threshold filters, which is the wanted semantics for degenerate
    vectors."""
    den = _norm(a) * _norm(b)
    return F.when(den != 0, _dot(a, b) / den)


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, cosine, rank): exact top-k neighbors per query.

    ``queries``: (query_id, embedding). Broadcast-cross-join — correct shape
    when |queries| is small; the big side is scanned once, never shuffled
    before the window. The window partitions by query_id, which would put
    all n scored rows for a query on one reducer — the mitigation is
    Spark's WindowGroupLimit (visible in the physical plan): the
    ``rank <= k`` filter is pushed into a partial per-map-partition top-k,
    so only ~k rows per input partition reach the single reducer. This is
    the documented brute-force baseline; the scale paths are
    :func:`lsh_cosine_topk` / :func:`ivf_cosine_topk`.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    scored = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        cosine_expr(F.col("qvec"), F.col("vec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _require_dim(dim: int | None, vec_col: str) -> int:
    """ArrayType carries no static length, so the vector dimension cannot be
    read from the schema; probing it with ``.first()`` would run a driver
    action inside plan construction. Callers must pass it explicitly."""
    if dim is None:
        raise ValueError(
            f"pass dim= explicitly: the {vec_col!r} ArrayType schema has no "
            "static length and plan construction must not trigger a job"
        )
    return dim


def _hyperplanes(dim: int, m: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(m, dim).tolist()


def lsh_signature_expr(vec, planes: list[list[float]]):
    """m-bit sign signature as a long, JVM-side."""
    sig = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(vec, p) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig + F.shiftleft(bit, j)
    return sig


def lsh_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
    multi_probe: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates share the query's m-bit LSH bucket.

    ``multi_probe=h`` additionally probes every bucket within hamming
    distance ≤ h of the query's signature (the standard multi-probe LSH
    recall/cost dial): each query row explodes to ``Σ C(m,i)`` probe
    buckets JVM-side — still a broadcast of |queries|·probes rows against
    the bucketed big side, no extra pass over the vectors. h=1 roughly
    multiplies candidates by m+1 and recovers neighbors that differ on one
    marginal hyperplane sign."""
    dim = _require_dim(dim, vec_col)
    planes = _hyperplanes(dim, m_bits, seed)
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        lsh_signature_expr(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        lsh_signature_expr(F.col(vec_col), planes).alias("bucket"),
    )
    if multi_probe > 0:
        # xor masks for hamming balls of radius <= multi_probe (0 = own bucket)
        flips = [0] + hamming_ball_masks(m_bits, multi_probe)
        q = q.withColumn(
            "bucket",
            F.explode(
                F.array(
                    *[F.col("bucket").bitwiseXOR(F.lit(m)) for m in flips]
                )
            ),
        )
    scored = v.join(F.broadcast(q), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        cosine_expr(F.col("qvec"), F.col("vec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _dot64(a, b):
    """Sequential left-fold dot product with every element promoted to
    DOUBLE first — the arithmetic a SQL oracle can replay bit-for-bit."""
    return F.aggregate(
        F.zip_with(
            F.transform(a, lambda x: x.cast("double")),
            F.transform(b, lambda x: x.cast("double")),
            lambda x, y: x * y,
        ),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm64(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v * v,
        )
    )


def _seq_dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _seq_norm(a: list[float]) -> float:
    import math

    acc = 0.0
    for x in a:
        acc += x * x
    return math.sqrt(acc)


_IVF_MOD = 1_000_000_007


def ivf_train_hash_params(seed: int) -> tuple[int, int, int]:
    """(a, b, mod) of the portable seeded hash
    ``(((vec_id % p) * a + b) % p)`` used for training-sample selection.

    The multipliers are scaled by large odd constants so the mod-p
    wraparound engages even for small vec_ids. With the old small
    ``a = 2·seed+3`` the hash was exactly affine for ids below ~p/a, so
    ``h % train_mod`` was the CONSTANT ``b % train_mod`` whenever
    ``train_mod`` divided ``a`` — at seed 42 (a=87) a derived train_mod of
    3 selected an EMPTY training sample (caught by the tm>1 twin test).
    Max intermediate ``(p-1)·a + b < 2^63`` so both Spark longs and DuckDB
    BIGINTs evaluate it exactly."""
    a = (654435761 * (2 * seed + 3)) % _IVF_MOD
    b = (354850103 * (7 * seed + 10)) % _IVF_MOD
    return a, b, _IVF_MOD


def ivf_resolve_train_mod(
    n_vectors: int, n_centroids: int, max_train_sample: int | None = None
) -> int:
    """Derive the sampling modulus from a target training-sample size.

    ``max_train_sample`` defaults to ``256 * n_centroids`` (standard IVF
    practice: a few hundred training points per centroid). Pure integer
    arithmetic — ``ceil(n / target)`` — so a SQL oracle can compute the
    identical value from ``count(*)`` and the two sides stay bit-identical.
    """
    target = max_train_sample if max_train_sample is not None else 256 * n_centroids
    if target < 1:
        raise ValueError(f"max_train_sample must be >= 1, got {target}")
    return max(1, (n_vectors + target - 1) // target)


def ivf_training_sample(
    vectors: DataFrame,
    train_mod: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Collect the portable-hash training sample, sorted by vec_id.

    The filter ``(((vec_id % p)·a + b) % p) % train_mod == 0`` keeps ~n/train_mod
    rows (universal hash family → near-uniform over residues), so the
    driver-side collect is bounded by the caller's sample target, not by n.
    Exposed separately so tests can assert the bound directly.
    """
    a, b, mod = ivf_train_hash_params(seed)
    rows = (
        vectors.filter(
            (((F.col(id_col).cast("long") % mod) * a + b) % mod) % train_mod == 0
        )
        .select(F.col(id_col).cast("long").alias("vid"), F.col(vec_col).alias("vec"))
        .collect()
    )
    return sorted((int(r.vid), [float(x) for x in r.vec]) for r in rows)


def ivf_train(
    vectors: DataFrame,
    n_centroids: int = 16,
    lloyd_iterations: int = 2,
    seed: int = 42,
    train_mod: int | None = None,
    max_train_sample: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Driver-side IVF training (k-means) over a portable-hash sample.

    Standard IVF practice at scale: train on a bounded sample, then assign
    ALL vectors JVM-side against literal centroids. By default the sampling
    modulus is DERIVED from a sample-size target (``max_train_sample``,
    default ``256 * n_centroids``) via one ``count()``:
    ``train_mod = ceil(n / target)`` — so the driver collect stays
    ~``max_train_sample`` rows at ANY corpus size (10^9 vectors with 16
    centroids still collects ~4096 rows, not n/2). Passing ``train_mod``
    explicitly skips the count. The sample filter
    ``((a·vec_id + b) % p) % train_mod == 0`` is integer arithmetic, so the
    exact same training replays in the driver's DuckDB oracle (which derives
    the same train_mod from ``count(*)`` with the same integer ceil); every
    float op here is a sequential double fold (plain Python loops, NOT
    numpy's pairwise sums) for the same reason.

    Deterministic: seeding = first ``n_centroids`` sample vectors ordered by
    (hash, vec_id); Lloyd assignment = first-argmax cosine; means accumulate
    in vec_id order; empty lists keep their previous centroid.
    """
    a, b, mod = ivf_train_hash_params(seed)
    if train_mod is None:
        n = vectors.count()
        train_mod = ivf_resolve_train_mod(n, n_centroids, max_train_sample)
    sample = ivf_training_sample(
        vectors, train_mod, seed=seed, id_col=id_col, vec_col=vec_col
    )
    if len(sample) < n_centroids:
        raise ValueError(
            f"training sample ({len(sample)}) smaller than n_centroids "
            f"({n_centroids}); raise max_train_sample (or lower an explicit "
            "train_mod), or reduce n_centroids for this corpus size"
        )
    order = sorted(sample, key=lambda t: (((t[0] % mod) * a + b) % mod, t[0]))
    cents = [list(v) for _, v in order[:n_centroids]]
    dim = len(cents[0])
    for _ in range(lloyd_iterations):
        sums = [[0.0] * dim for _ in cents]
        counts = [0] * len(cents)
        for _vid, v in sample:  # vec_id ascending → replayable fold order
            nv = _seq_norm(v)
            best, best_s = 0, float("-inf")
            for i, c in enumerate(cents):
                denom = nv * _seq_norm(c)
                s = _seq_dot(v, c) / denom if denom else -1.0
                if s > best_s:
                    best_s, best = s, i
            acc = sums[best]
            for j in range(dim):
                acc[j] += v[j]
            counts[best] += 1
        cents = [
            [sums[i][j] / counts[i] for j in range(dim)] if counts[i] else cents[i]
            for i in range(len(cents))
        ]
    return cents


def _centroid_scores(vec_col_name: str, cents: list[list[float]]):
    """Array of cosine scores vs literal centroids, all-double arithmetic
    (norm of each centroid precomputed driver-side with the same sequential
    fold the SQL oracle uses). Zero-norm vectors (or centroids) score -1.0
    instead of dividing by zero — rule 24: the SQL twin carries the SAME
    guard, so degenerate rows assign identically (first list wins the
    all--1 tie) rather than diverging or failing the stage under ANSI."""

    def score(i, c):
        cn = _seq_norm(c)
        if cn == 0.0:
            return F.lit(-1.0).alias(f"s{i}")
        dot = _dot64(F.col(vec_col_name), F.array(*[F.lit(float(x)) for x in c]))
        denom = _norm64(F.col(vec_col_name)) * F.lit(cn)
        return F.when(denom > 0, dot / denom).otherwise(F.lit(-1.0)).alias(f"s{i}")

    return F.array(*[score(i, c) for i, c in enumerate(cents)])


def ivf_build(
    vectors: DataFrame,
    n_centroids: int = 16,
    lloyd_iterations: int = 2,
    seed: int = 42,
    train_mod: int | None = None,
    max_train_sample: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: list[list[float]] | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF index: driver-trained centroids (see :func:`ivf_train`), then
    every vector assigned JVM-side to its nearest centroid's inverted list
    (argmax = first index of the max score, ties to the smallest list).

    Returns (assigned_vectors_with_list_id, centroids). At scale the
    assigned table is persisted with :func:`ivf_write_index`
    (``partitionBy(list_id)`` + centroid sidecar) so probes read only their
    lists' directories; training cost is one bounded sample collect.
    """
    if cents is None:
        cents = ivf_train(
            vectors,
            n_centroids=n_centroids,
            lloyd_iterations=lloyd_iterations,
            seed=seed,
            train_mod=train_mod,
            max_train_sample=max_train_sample,
            id_col=id_col,
            vec_col=vec_col,
        )
    scored = vectors.select(
        id_col, vec_col, _centroid_scores(vec_col, cents).alias("scores")
    )
    assigned = scored.withColumn(
        "list_id",
        (F.array_position(F.col("scores"), F.array_max("scores")) - 1).cast("int"),
    ).drop("scores")
    return assigned, cents


def _query_probe_lists(
    queries: DataFrame,
    cents: list[list[float]],
    n_probe: int,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """(query_id, qvec, list_id): each query exploded to its ``n_probe``
    nearest inverted lists (sort (score, idx) structs descending — ties to
    the larger idx, mirrored exactly by the SQL oracle's prn window)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _centroid_scores(vec_col, cents).alias("scores"),
    )
    idxs = F.sequence(F.lit(0), F.lit(len(cents) - 1))
    pairs = F.arrays_zip(F.col("scores"), idxs.alias("idx"))
    top_lists = F.slice(F.reverse(F.array_sort(pairs)), 1, n_probe)
    return q.select(
        "query_id",
        "qvec",
        F.explode(F.transform(top_lists, lambda s: s["idx"])).alias("list_id"),
    )


def ivf_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    train_mod: int | None = None,
    max_train_sample: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: each query probes its ``n_probe`` nearest
    inverted lists only (scan cost n·n_probe/n_centroids instead of n)."""
    assigned, cents = ivf_build(
        vectors,
        n_centroids=n_centroids,
        seed=seed,
        train_mod=train_mod,
        max_train_sample=max_train_sample,
        id_col=id_col,
        vec_col=vec_col,
    )
    q = _query_probe_lists(queries, cents, n_probe, vec_col, query_id_col)
    scored = assigned.join(F.broadcast(q), "list_id").filter(
        F.col(id_col) != F.col("query_id")
    ).select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine_expr(F.col("qvec"), F.col(vec_col)).alias("cosine"),
    ).dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_write_index(
    vectors: DataFrame,
    path: str,
    n_centroids: int = 16,
    lloyd_iterations: int = 2,
    seed: int = 42,
    train_mod: int | None = None,
    max_train_sample: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Materialize the IVF index: the assigned table written
    ``partitionBy(list_id)`` (one directory per inverted list) plus the
    trained centroids as a ``_ivf_centroids.json`` sidecar (underscore
    prefix → invisible to Spark's file listing). This is the persisted form
    the scale story promises: a probe reads ``n_probe`` of ``n_centroids``
    DIRECTORIES — partition pruning, not a post-scan filter — so scan cost
    is n·n_probe/n_centroids at any corpus size. Returns the centroids."""
    import json
    import os

    assigned, cents = ivf_build(
        vectors,
        n_centroids=n_centroids,
        lloyd_iterations=lloyd_iterations,
        seed=seed,
        train_mod=train_mod,
        max_train_sample=max_train_sample,
        id_col=id_col,
        vec_col=vec_col,
    )
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(path)
    with open(os.path.join(path, "_ivf_centroids.json"), "w") as fh:
        json.dump({"centroids": cents, "seed": seed}, fh)
    return cents


def ivf_probe_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k over a persisted IVF index (:func:`ivf_write_index`) with
    STATIC partition pruning: the probe lists of the (small, broadcastable
    by design) query set are collected — a bounded |queries|·n_probe-int
    action — and applied as a ``list_id IN (...)`` filter BEFORE the join,
    so the parquet scan lists only the probed directories
    (``PartitionFilters`` in the plan, asserted in tests). Results are
    identical to :func:`ivf_cosine_topk` run with the same centroids."""
    import json
    import os

    with open(os.path.join(path, "_ivf_centroids.json")) as fh:
        cents = json.load(fh)["centroids"]
    q = _query_probe_lists(queries, cents, n_probe, vec_col, query_id_col)
    probe_ids = sorted({r.list_id for r in q.select("list_id").distinct().collect()})
    assigned = spark.read.parquet(path).filter(F.col("list_id").isin(probe_ids))
    scored = (
        assigned.join(F.broadcast(q), "list_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("vec_id"),
            cosine_expr(F.col("qvec"), F.col(vec_col)).alias("cosine"),
        )
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _sq64(a):
    """Σx² as a sequential double fold (no sqrt) — oracle-replayable."""
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v * v,
    )


def _near_dup_keyed(
    vectors: DataFrame,
    m_bits: int,
    seed: int,
    id_col: str,
    vec_col: str,
    dim: int,
    bucket_cap: int,
    rehash_levels: int,
    rehash_bits: int,
    materialize: bool = True,
) -> DataFrame:
    """(vec_id, vec, key, _hot): LSH bucket keys with oversized buckets
    split by recursive re-hash. Level ℓ appends an independent
    ``rehash_bits``-bit signature (seed+1+ℓ) to the keys of buckets larger
    than ``bucket_cap``; keys are '/'-joined strings so split children can
    never collide with an unsplit bucket. ``_hot`` marks rows whose FINAL
    key is still oversized (the neighbor-window fallback set).

    Shuffle/scan budget: the vector table itself is NEVER shuffled by the
    guard. Each level aggregates per-key counts (map-side partial combine —
    only compact (key, count) pairs cross the wire), filters to the
    oversized keys, and broadcast-joins that set back — the oversized-key
    set is small by construction (≤ n/bucket_cap keys), which is what makes
    the broadcast safe where broadcasting the full size table would not be.
    Because the levels are inherently iterative (level ℓ+1's counts depend
    on level ℓ's keys), the keyed table is ``localCheckpoint``-materialized
    per level (the repo's iterative-operator pattern, see
    ``canonicalize.py``) — without it each level's count pass AND both
    sides of the downstream self-join re-derive the whole lineage, which
    measured 32 parquet scans for one query; with it the source is scanned
    once and signatures are computed once. ``materialize=False`` keeps the
    pure-plan form for callers that must not run jobs at build time.
    """
    planes = _hyperplanes(dim, m_bits, seed)
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        lsh_signature_expr(F.col(vec_col), planes).cast("string").alias("key"),
    )
    if materialize:
        v = v.localCheckpoint(eager=True)

    def hot_keys(df):
        return F.broadcast(
            df.groupBy("key")
            .agg(F.count("*").alias("_sz"))
            .filter(F.col("_sz") > bucket_cap)
            .select("key", F.lit(1).alias("_hot"))
        )

    for lvl in range(rehash_levels):
        extra = _hyperplanes(dim, rehash_bits, seed + 1 + lvl)
        v = (
            v.join(hot_keys(v), "key", "left")
            .withColumn(
                "key",
                F.when(
                    F.col("_hot").isNotNull(),
                    F.concat_ws(
                        "/",
                        F.col("key"),
                        lsh_signature_expr(F.col("vec"), extra).cast("string"),
                    ),
                ).otherwise(F.col("key")),
            )
            .drop("_hot")
        )
        if materialize:
            v = v.localCheckpoint(eager=True)
    return v.join(hot_keys(v), "key", "left")


def hamming_ball_masks(m_bits: int, radius: int) -> list[int]:
    """Nonzero XOR masks of hamming weight 1..radius over ``m_bits`` bits —
    the probe set of a hamming-ball expansion (shared by the ANN multi-probe
    and the near-dup multi-probe dials)."""
    from itertools import combinations

    masks: list[int] = []
    for r in range(1, radius + 1):
        for bits in combinations(range(m_bits), r):
            m = 0
            for j in bits:
                m |= 1 << j
            masks.append(m)
    return masks


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    m_bits: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    bucket_cap: int = 1024,
    rehash_levels: int = 2,
    rehash_bits: int = 8,
    neighbor_window: int = 64,
    portable: bool = False,
    materialize: bool = True,
    multi_probe: int = 0,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join with a
    hot-bucket guard: only pairs in the same bucket are scored; cosine ≥
    threshold kept.

    Without a guard, one bucket holding k vectors costs k²/2 comparisons —
    and a near-duplicate-heavy corpus (exactly where this operator is
    pointed) concentrates mass in few buckets. Guard, all JVM-side:

    1. buckets larger than ``bucket_cap`` are recursively split by appending
       ``rehash_bits`` fresh hyperplane bits (up to ``rehash_levels`` times)
       — separates *distinct* vectors that happened to collide. **Honest
       recall note**: the split is a RECALL TRADE, not free — a true pair
       inside a mixed hot bucket survives the split only if all
       ``rehash_bits`` fresh hyperplanes agree on both vectors
       (probability ≈ (1−θ/π)^bits for angle θ), and neither ``cand_small``
       (equal full keys) nor ``multi_probe`` (flips BASE-signature bits
       only, never the re-hash suffix) recovers a split-separated pair.
       Measured on the clustered sf0.001 fixture at the LOOSE t=0.4
       (θ≈66°, per-bit survive ≈0.63 — near worst case): forcing a split
       on every bucket retains 0.29 of the unguarded pairs at
       rehash_bits=2 and 0.05 at rehash_bits=4, matching the formula
       (tests/test_round4_fixes.py::test_guard_split_recall_measured). At
       the tight thresholds the guard targets (t=0.95, θ≈18°, per-bit
       ≈0.90) the same split retains ~0.8 at 2 bits / ~0.43 at 8. Size
       ``bucket_cap`` so the guard fires only on pathological blobs, not
       on working buckets, and keep ``rehash_bits`` small at loose
       thresholds;
    2. buckets STILL oversized after splitting (≈ all-near-identical mass,
       which no re-hash can separate) switch from all-pairs to sorted
       neighbor-window candidates: each vector pairs with the next
       ``neighbor_window`` vec_ids in its bucket via an explode+equi-join
       (k·W rows, never k²). For exact/near-exact duplicate groups the
       adjacent pairs all pass the threshold, so transitive connectivity is
       preserved — feed the pairs to
       :func:`~.canonicalize.connected_components` as usual. Use
       :func:`embedding_near_dup_bucket_stats` to see which buckets were
       truncated and how many candidate pairs were skipped.

    ``portable=True`` evaluates the threshold with oracle-replayable
    arithmetic instead of a float cosine compare: keep ⇔ ``dot ≥ 0 AND
    dot² ≥ t²·Σa²·Σb²`` with every sum a sequential double fold — the exact
    boundary a DuckDB twin reproduces bit-for-bit (CLAUDE.md rule 11).

    ``multi_probe=h`` (recall dial, same hamming-ball idea as
    :func:`lsh_cosine_topk`'s): ADDITIONALLY pairs vectors whose BASE
    m-bit signatures differ in 1..h bits — near-threshold pairs that land
    one sign-flip apart are the dominant LSH miss mode, and probing
    adjacent buckets recovers them at the same m (measured on the sf0.001
    embeddings fixture at t=0.4, m=2: pair recall vs brute force
    0.318 → 0.773 at h=1 → 1.000 at h=2; tests/test_round4_fixes.py). Cost/scale contract:
    candidates grow by ≤ Σ_{{r≤h}} C(m,r) × mean bucket size per row, and
    rows in buckets the guard marked hot are EXCLUDED from cross-bucket
    expansion (a hot bucket is an all-near-identical blob, densely
    connected by its own window pairs; probing it from outside would
    reintroduce the k·|neighbor| blowup the guard exists to stop).
    Same-final-key candidates keep their guard treatment unchanged, and the
    mask set never contains 0, so the branches are disjoint — no pair
    dedup pass is needed.
    """
    dim = _require_dim(dim, vec_col)
    v = _near_dup_keyed(
        vectors, m_bits, seed, id_col, vec_col, dim,
        bucket_cap, rehash_levels, rehash_bits, materialize=materialize,
    )
    small = v.filter(F.col("_hot").isNull()).drop("_hot")
    cand_small = (
        small.alias("x")
        .join(small.alias("y"), "key")
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            F.col("x.vec").alias("va"),
            F.col("y.vec").alias("vb"),
        )
    )
    big = v.filter(F.col("_hot").isNotNull()).drop("_hot")
    w = Window.partitionBy("key").orderBy("vec_id")
    big_rn = big.withColumn("rn", F.row_number().over(w))
    probes = big_rn.select(
        "key",
        F.col("vec_id").alias("vec_a"),
        F.col("vec").alias("va"),
        F.explode(
            F.sequence(F.col("rn") + 1, F.col("rn") + neighbor_window)
        ).alias("rn"),
    )
    cand_big = probes.join(
        big_rn.select(
            "key", "rn", F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb")
        ),
        ["key", "rn"],
    ).select("vec_a", "vec_b", "va", "vb")
    cand = cand_small.unionByName(cand_big)
    if multi_probe > 0:
        masks = hamming_ball_masks(m_bits, multi_probe)
        nh = (
            v.filter(F.col("_hot").isNull())
            .withColumn("bsig", F.split(F.col("key"), "/")[0].cast("long"))
            .select("vec_id", "vec", "bsig")
        )
        probes = nh.select(
            "vec_id",
            "vec",
            F.col("bsig"),
            F.explode(F.array(*[F.lit(m).cast("long") for m in masks])).alias(
                "mask"
            ),
        ).withColumn("pkey", F.col("bsig").bitwiseXOR(F.col("mask")))
        cand_probe = (
            probes.alias("x")
            .join(nh.alias("y"), F.col("x.pkey") == F.col("y.bsig"))
            .filter(F.col("x.vec_id") < F.col("y.vec_id"))
            .select(
                F.col("x.vec_id").alias("vec_a"),
                F.col("y.vec_id").alias("vec_b"),
                F.col("x.vec").alias("va"),
                F.col("y.vec").alias("vb"),
            )
        )
        cand = cand.unionByName(cand_probe)
    if portable:
        t2 = float(threshold) * float(threshold)
        dot = _dot64(F.col("va"), F.col("vb"))
        sa, sb = _sq64(F.col("va")), _sq64(F.col("vb"))
        # norm-positivity guards: a zero vector has undefined cosine and must
        # not match (without them 0 ≥ t²·0·sb would pass vacuously)
        keep = (
            (sa > 0) & (sb > 0) & (dot >= 0) & (dot * dot >= F.lit(t2) * sa * sb)
        )
    else:
        keep = cosine_expr(F.col("va"), F.col("vb")) >= threshold
    return (
        cand.filter(keep)
        .select(
            "vec_a",
            "vec_b",
            cosine_expr(F.col("va"), F.col("vb")).alias("cosine"),
        )
    )


def embedding_near_dup_bucket_stats(
    vectors: DataFrame,
    m_bits: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    bucket_cap: int = 1024,
    rehash_levels: int = 2,
    rehash_bits: int = 8,
    neighbor_window: int = 64,
    materialize: bool = True,
) -> DataFrame:
    """(key, size, truncated, pairs_skipped): per final bucket, whether the
    neighbor-window fallback fired and how many candidate pairs it skipped.
    The window emits ``C(size,2)`` pairs when ``size ≤ W+1`` (every pair is
    within the window — nothing skipped) and ``size·W − W·(W+1)/2``
    otherwise; the unconditional second form would over-report skips for
    small hot buckets under a window wider than the bucket. The drop count
    the guard owes its users — aggregate and log it next to the pairs job."""
    dim = _require_dim(dim, vec_col)
    v = _near_dup_keyed(
        vectors, m_bits, seed, id_col, vec_col, dim,
        bucket_cap, rehash_levels, rehash_bits, materialize=materialize,
    )
    sz = F.col("size").cast("long")
    wlit = F.lit(neighbor_window).cast("long")
    all_pairs = sz * (sz - 1) / 2
    kept = F.when(sz <= wlit + 1, all_pairs).otherwise(
        sz * wlit - wlit * (wlit + 1) / 2
    )
    return (
        v.groupBy("key")
        .agg(F.count("*").alias("size"), F.max("_hot").alias("_h"))
        .select(
            "key",
            "size",
            F.col("_h").isNotNull().alias("truncated"),
            F.when(
                F.col("_h").isNotNull(),
                F.greatest(F.lit(0.0), all_pairs - kept).cast("long"),
            )
            .otherwise(F.lit(0))
            .alias("pairs_skipped"),
        )
    )


def _sqdist64(a, b):
    """Sequential left-fold squared-L2 distance with every element promoted
    to DOUBLE first — per-element ``(x−y)·(x−y)`` then an ordered add fold,
    the arithmetic the SQL oracle replays bit-for-bit."""
    return F.aggregate(
        F.zip_with(
            F.transform(a, lambda x: x.cast("double")),
            F.transform(b, lambda x: x.cast("double")),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _seq_sqdist(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        d = x - y
        acc += d * d
    return acc


def semdedup_flags(
    vectors: DataFrame,
    n_centroids: int = 16,
    threshold: float = 0.8,
    lloyd_iterations: int = 2,
    seed: int = 42,
    train_mod: int | None = None,
    max_train_sample: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): semantic deduplication by k-means
    clustering the embedding space and comparing pairs ONLY within a
    cluster. A row is a semantic duplicate when some lower-id member of
    its cluster clears the cosine threshold; ``dup_of`` is the smallest
    such partner (deterministic keeper = min id, the convention shared by
    the whole dedup family).

    Returns (id, list_id, dup_of, is_dup) for every input row.

    Scale shape: clustering reuses the IVF machinery — driver-side Lloyd
    on a bounded portable-hash sample (collect stays ~256·k rows at ANY
    corpus size), JVM-side assignment against literal centroids — so the
    all-pairs stage is confined to n²/k per cluster instead of n² global;
    ``n_centroids`` is the blow-up dial (SemDeDup runs ~100k clusters at
    web scale). For a cluster that still explodes (a near-identical blob),
    compose with :func:`embedding_near_dup_pairs`'s hot-bucket guard as a
    prefilter; this operator keeps the exact form because the gate needs
    bit-replayable semantics. The threshold predicate is the
    oracle-portable one (``dot ≥ 0 AND dot² ≥ t²·Σa²·Σb²`` with
    norm-positivity guards, identical operand order in both engines).

    Assignment is localCheckpoint-materialized once (CLAUDE.md rule 23:
    it feeds both join sides AND the final left join — without it Spark
    re-derives the scan + centroid scores three times).
    """
    assigned, _cents = ivf_build(
        vectors,
        n_centroids=n_centroids,
        lloyd_iterations=lloyd_iterations,
        seed=seed,
        train_mod=train_mod,
        max_train_sample=max_train_sample,
        id_col=id_col,
        vec_col=vec_col,
    )
    # per-VECTOR Σv² is computed once here, not once per pair — at n²/c
    # pairs that saves two 64-element folds per candidate; the fold over
    # the same array yields the same double, so the SQL twin is unchanged
    assigned = assigned.withColumn("sq", _sq64(F.col(vec_col))).localCheckpoint(
        eager=True
    )
    a = assigned.select(
        "list_id",
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("va"),
        F.col("sq").alias("sqa"),
    )
    b = assigned.select(
        "list_id",
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("vb"),
        F.col("sq").alias("sqb"),
    )
    t2 = float(threshold) * float(threshold)
    dot = _dot64(F.col("va"), F.col("vb"))
    sa, sb = F.col("sqa"), F.col("sqb")
    keep = (sa > 0) & (sb > 0) & (dot >= 0) & (dot * dot >= F.lit(t2) * sa * sb)
    dups = (
        a.join(b, "list_id")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(keep)
        .groupBy("vec_b")
        .agg(F.min("vec_a").alias("dup_of"))
    )
    return (
        assigned.select(id_col, "list_id")
        .join(dups, F.col(id_col) == F.col("vec_b"), "left")
        .select(
            id_col,
            "list_id",
            "dup_of",
            F.col("dup_of").isNotNull().alias("is_dup"),
        )
    )


def knn_within_clusters(
    vectors: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    lloyd_iterations: int = 2,
    seed: int = 42,
    train_mod: int | None = None,
    max_train_sample: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-NN graph construction with a mutual-edge flag — the building block
    for graph-based curation (kNN-graph dedup/quality propagation, SemDeDup
    follow-ups, local-density filtering). Exact cosine top-k per vector,
    confined to its IVF cell (the same driver-side Lloyd + JVM assignment
    the ANN/SemDeDup family shares), so candidate work is n²/c per cell
    instead of n² global; ``mutual`` marks edges whose reverse edge is also
    in the destination's top-k (mutual-kNN is the usual graph sparsifier).

    Returns (src_id, rank, dst_id, mutual) — ranks 1..k by cosine DESC with
    dst_id ASC ties; zero-norm vectors score -1.0 (norm guard shared with
    :func:`_centroid_scores`). Cells with a single member emit no edges.

    Scale shape: assignment is one map over literal centroids; the within-
    cell pairing shuffles on list_id; the mutual check is a self-join of the
    (n·k)-row edge list on the reversed pair key — never touches the full
    n²/c candidate stream. The assignment is localCheckpoint-materialized
    once (CLAUDE.md rule 23: it feeds both pairing sides).
    """
    assigned, _cents = ivf_build(
        vectors,
        n_centroids=n_centroids,
        lloyd_iterations=lloyd_iterations,
        seed=seed,
        train_mod=train_mod,
        max_train_sample=max_train_sample,
        id_col=id_col,
        vec_col=vec_col,
    )
    # per-VECTOR norm computed once, not once per pair (two 64-element
    # folds saved per candidate at n²/c pairs); sqrt of the same fold is
    # the same double, so rank order and the SQL twin are unchanged
    assigned = assigned.withColumn(
        "nrm", _norm64(F.col(vec_col))
    ).localCheckpoint(eager=True)
    a = assigned.select(
        "list_id",
        F.col(id_col).alias("src_id"),
        F.col(vec_col).alias("va"),
        F.col("nrm").alias("na"),
    )
    b = assigned.select(
        "list_id",
        F.col(id_col).alias("dst_id"),
        F.col(vec_col).alias("vb"),
        F.col("nrm").alias("nb"),
    )
    denom = F.col("na") * F.col("nb")
    score = F.when(denom > 0, _dot64(F.col("va"), F.col("vb")) / denom).otherwise(
        F.lit(-1.0)
    )
    w = Window.partitionBy("src_id").orderBy(
        F.col("score").desc(), F.col("dst_id").asc()
    )
    edges = (
        a.join(b, "list_id")
        .filter(F.col("src_id") != F.col("dst_id"))
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src_id", F.col("rank").cast("long").alias("rank"), "dst_id")
    )
    back = edges.select(
        F.col("src_id").alias("b_src"), F.col("dst_id").alias("b_dst")
    )
    return edges.join(
        back,
        (F.col("src_id") == F.col("b_dst")) & (F.col("dst_id") == F.col("b_src")),
        "left",
    ).select(
        "src_id", "rank", "dst_id", F.col("b_src").isNotNull().alias("mutual")
    )


def pq_train(
    vectors: DataFrame,
    m_subspaces: int = 4,
    k_codes: int = 16,
    lloyd_iterations: int = 2,
    seed: int = 42,
    train_mod: int | None = None,
    max_train_sample: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Product-quantization codebooks: the vector space is split into
    ``m_subspaces`` contiguous subspaces and an independent k-means
    (squared-L2, ``k_codes`` centroids) is trained per subspace on the SAME
    bounded portable-hash sample as :func:`ivf_train` — driver-side, every
    float op a sequential double fold in vec_id order, so the DuckDB twin
    replays the training exactly (rule 20). Returns
    ``books[m][code] = centroid`` (subdim-length lists of doubles).

    Seeding per subspace = the first ``k_codes`` sample subvectors in
    (hash, vec_id) order; assignment = first-argmin squared-L2; empty
    clusters keep their previous centroid — the IVF conventions."""
    a, b, mod = ivf_train_hash_params(seed)
    if train_mod is None:
        n = vectors.count()
        train_mod = ivf_resolve_train_mod(n, k_codes, max_train_sample)
    sample = ivf_training_sample(
        vectors, train_mod, seed=seed, id_col=id_col, vec_col=vec_col
    )
    if len(sample) < k_codes:
        raise ValueError(
            f"training sample ({len(sample)}) smaller than k_codes "
            f"({k_codes}); raise max_train_sample or reduce k_codes"
        )
    dim = len(sample[0][1])
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    sub = dim // m_subspaces
    order = sorted(sample, key=lambda t: (((t[0] % mod) * a + b) % mod, t[0]))
    books: list[list[list[float]]] = []
    for m in range(m_subspaces):
        lo = m * sub
        cents = [list(v[lo : lo + sub]) for _, v in order[:k_codes]]
        for _ in range(lloyd_iterations):
            sums = [[0.0] * sub for _ in cents]
            counts = [0] * len(cents)
            for _vid, v in sample:  # vec_id ascending → replayable fold order
                sv = v[lo : lo + sub]
                best, best_d = 0, float("inf")
                for i, c in enumerate(cents):
                    d = _seq_sqdist(sv, c)
                    if d < best_d:
                        best_d, best = d, i
                acc = sums[best]
                for j in range(sub):
                    acc[j] += sv[j]
                counts[best] += 1
            cents = [
                [sums[i][j] / counts[i] for j in range(sub)] if counts[i] else cents[i]
                for i in range(len(cents))
            ]
        books.append(cents)
    return books


def _pq_code_expr(vec_col_name: str, book: list[list[float]], lo: int, sub: int):
    """First-argmin code of one subspace against literal centroids —
    mirrors ivf_build's array_position(array_min) convention (ties to the
    smallest code, matching the twin's ORDER BY d ASC, code ASC)."""
    subv = F.slice(F.col(vec_col_name), lo + 1, sub)
    dists = F.array(
        *[
            _sqdist64(subv, F.array(*[F.lit(float(x)) for x in c]))
            for c in book
        ]
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m_subspaces: int = 4,
    k_codes: int = 16,
    lloyd_iterations: int = 2,
    seed: int = 42,
    train_mod: int | None = None,
    max_train_sample: int | None = None,
    rerank: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Product-quantization approximate top-k (asymmetric distance): every
    vector is compressed to ``m_subspaces`` small codes (here 4×4 bits —
    a 64-dim float vector becomes 2 bytes, the memory shape that lets a
    100 TB embedding store fit a serving tier), queries score candidates
    by summing exact query-subvector→centroid distances (ADC). Encoding is
    a zero-shuffle map stage against literal codebooks; scoring is a
    broadcast cross join + one window top-k — no full-precision vector
    ever moves after encoding.

    ``rerank=C`` adds the standard second stage: ADC selects C candidates
    from codes alone, then ONLY |queries|·C full vectors are fetched and
    re-ranked by exact squared-L2 — the dial that recovers exact-search
    quality while the corpus-wide scan stays compressed (measured on the
    clustered 2000-vector fixture: recall@10 0.105 code-only at 16 codes
    — code cells are cluster-grained so within-cluster rank collapses to
    ties — vs 0.515 with rerank=50 and 1.0 with rerank=100, the cluster
    size).

    Exactness: training is the driver-side replayable fold of
    :func:`pq_train`; encoding/ADC arithmetic is the same promoted-double
    sequential fold on both engines; ADC sums the ``m`` terms in fixed
    subspace order, so ranks (ADC ASC, vec_id ASC) are bit-identical."""
    books = pq_train(
        vectors,
        m_subspaces=m_subspaces,
        k_codes=k_codes,
        lloyd_iterations=lloyd_iterations,
        seed=seed,
        train_mod=train_mod,
        max_train_sample=max_train_sample,
        id_col=id_col,
        vec_col=vec_col,
    )
    sub = len(books[0][0])
    enc = vectors.select(
        F.col(id_col).alias("vec_id"),
        *[
            _pq_code_expr(vec_col, books[m], m * sub, sub).alias(f"c{m}")
            for m in range(m_subspaces)
        ],
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    joined = enc.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    adc = None
    for m in range(m_subspaces):
        book_lit = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in books[m]]
        )
        term = _sqdist64(
            F.slice(F.col("qvec"), m * sub + 1, sub),
            F.element_at(book_lit, F.col(f"c{m}") + 1),
        )
        adc = term if adc is None else adc + term  # fixed left-to-right order
    scored = joined.select("query_id", "qvec", "vec_id", adc.alias("adc"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    if not rerank:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id")
        )
    # standard PQ serving shape: ADC generates a candidate set from codes
    # alone, then only |queries|·rerank full vectors are fetched for the
    # exact re-rank — the expensive store is still never scanned at full
    # precision
    cand = (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= rerank)
        .select("query_id", "qvec", "vec_id")
    )
    full = F.broadcast(cand).join(
        vectors.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec")
        ),
        "vec_id",
    )
    d = _sqdist64(F.col("qvec"), F.col("cvec"))
    rer = full.select("query_id", "vec_id", d.alias("d"))
    w2 = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("vec_id"))
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id")
    )
