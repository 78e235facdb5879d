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
    return _dot(a, b) / (_norm(a) * _norm(b))


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
    (the window partitions by query_id over q·n rows; with AQE the
    rank-filter is a partial top-k per partition).
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
) -> DataFrame:
    """Approximate top-k: candidates share the query's m-bit LSH bucket."""
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


def _seeded_centroids(vectors: DataFrame, n_centroids: int, vec_col: str, seed: int):
    """Deterministic centroid init: the k vectors with the smallest
    xxhash64(id) — a seeded uniform sample that is stable across cluster
    sizes (no Date/random at plan time)."""
    import numpy as np

    rows = (
        vectors.select(vec_col)
        .orderBy(F.xxhash64(F.concat_ws(",", F.lit(seed), F.col(vec_col).cast("string"))))
        .limit(n_centroids)
        .collect()
    )
    return [list(map(float, r[0])) for r in rows]


def ivf_build(
    vectors: DataFrame,
    n_centroids: int = 16,
    lloyd_iterations: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """IVF index: k seeded centroids refined by a few Lloyd iterations (all
    DataFrame ops: broadcast centroids → argmin assign → groupBy mean), then
    every vector assigned to its nearest centroid's inverted list.

    Returns (assigned_vectors_with_list_id, centroids). At scale the
    assigned table is written bucketed by ``list_id`` so probes read only
    their lists' buckets.
    """
    import numpy as np

    cents = _seeded_centroids(vectors, n_centroids, vec_col, seed)

    for _ in range(lloyd_iterations):
        # argmax cosine over broadcast centroid literals, JVM-side
        scored = vectors.select(
            id_col,
            vec_col,
            F.array(
                *[
                    (
                        _dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))
                        / (_norm(F.col(vec_col)) * float(np.linalg.norm(c)))
                    ).alias(f"s{i}")
                    for i, c in enumerate(cents)
                ]
            ).alias("scores"),
        )
        assigned = scored.withColumn(
            "list_id",
            (F.array_position(F.col("scores"), F.array_max("scores")) - 1).cast("int"),
        ).drop("scores")
        means = (
            assigned.groupBy("list_id")
            .agg(
                *[
                    F.avg(F.col(vec_col).getItem(j)).alias(f"d{j}")
                    for j in range(len(cents[0]))
                ]
            )
            .collect()
        )
        new_cents = list(cents)
        for r in means:
            new_cents[r["list_id"]] = [float(r[f"d{j}"]) for j in range(len(cents[0]))]
        cents = new_cents

    scored = vectors.select(
        id_col,
        vec_col,
        F.array(
            *[
                (
                    _dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))
                    / (_norm(F.col(vec_col)) * float(np.linalg.norm(c)))
                ).alias(f"s{i}")
                for i, c in enumerate(cents)
            ]
        ).alias("scores"),
    )
    assigned = scored.withColumn(
        "list_id",
        (F.array_position(F.col("scores"), F.array_max("scores")) - 1).cast("int"),
    ).drop("scores")
    return assigned, cents


def ivf_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: each query probes its ``n_probe`` nearest
    inverted lists only (scan cost n·n_probe/n_centroids instead of n)."""
    import numpy as np

    assigned, cents = ivf_build(
        vectors, n_centroids=n_centroids, seed=seed, id_col=id_col, vec_col=vec_col
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.array(
            *[
                (
                    _dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))
                    / (_norm(F.col(vec_col)) * float(np.linalg.norm(c)))
                ).alias(f"s{i}")
                for i, c in enumerate(cents)
            ]
        ).alias("scores"),
    )
    # n_probe nearest lists per query: sort (score, idx) structs descending
    idxs = F.sequence(F.lit(0), F.lit(len(cents) - 1))
    pairs = F.arrays_zip(F.col("scores"), idxs.alias("idx"))
    top_lists = F.slice(
        F.reverse(F.array_sort(pairs)), 1, n_probe
    )
    q = q.select(
        "query_id",
        "qvec",
        F.explode(F.transform(top_lists, lambda s: s["idx"])).alias("list_id"),
    )
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


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    m_bits: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join: only pairs in
    the same bucket are scored; cosine ≥ threshold kept."""
    dim = _require_dim(dim, vec_col)
    planes = _hyperplanes(dim, m_bits, seed)
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        lsh_signature_expr(F.col(vec_col), planes).alias("bucket"),
    )
    pairs = (
        v.alias("x")
        .join(v.alias("y"), "bucket")
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            cosine_expr(F.col("x.vec"), F.col("y.vec")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return pairs
