"""Distributed spherical k-means over embedding columns.

The corpus-scale Lloyd's loop that upgrades the two places the engine
previously trained its coarse quantizer on a bounded driver sample
(``similarity.ivf_topk``'s ≤50k-row ``toPandas`` and
``semantic_dedup``'s sign-bit cells):

* **fit** — each iteration is ONE pass over the corpus: an Arrow
  ``mapInPandas`` stage assigns every vector to its nearest (cosine)
  centroid and folds the per-cell running sums *inside the partition*
  (classic map-side combine — the task emits at most ``n_cells`` rows
  no matter how many vectors it scanned), then a single ``posexplode``
  + hash aggregation combines partials across partitions. Driver
  traffic per iteration is exactly the model: ``n_cells × (dim + 2)``
  doubles (sum vector ⊕ member count ⊕ similarity sum packed into one
  array so ONE aggregation pass covers all three). Nothing about the
  plan changes between 5k and 5B vectors — only the scan width.
* **assign** — a broadcast-centroid vectorized ``pandas_udf`` (one
  BLAS matmul per Arrow batch), partition-preserving, no shuffle.

Determinism: initial centroids are the ``n_cells`` rows with the
smallest portable ``md5(id)`` (a distributed TakeOrderedAndProject —
order-independent, rerun-stable, no RNG), and every subsequent update
is a sum whose cross-partition combine order only perturbs centroids
at float-addition noise (~1e-15 relative), far below the movement
tolerance. Empty cells keep their previous centroid (they can be
re-captured later), mirroring the reference's "bad fits die by cost,
not exception" policy (GraphRole ``roles/factor.py:20-23``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["SphericalKMeans", "kmeans_fit", "kmeans_assign"]


@dataclass
class SphericalKMeans:
    """Fitted model: L2-normalized centroids plus fit diagnostics."""

    centroids: np.ndarray  # (n_cells, dim), rows L2-normalized
    iters_run: int
    mean_sim: float  # mean cosine(vector, assigned centroid) at the last pass
    n_vectors: int

    @property
    def n_cells(self) -> int:
        return len(self.centroids)


def _normalize_rows(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1)
    return M / np.where(n > 0, n, 1.0)[:, None]


def _init_centroids(
    embeddings: DataFrame, n_cells: int, id_col: str, vec_col: str
) -> np.ndarray:
    """The ``n_cells`` vectors with the smallest md5(id) — deterministic,
    order-independent, and a distributed top-k (no full collect)."""
    rows = (
        embeddings.select(
            F.md5(F.col(id_col).cast("string")).alias("__h"),
            F.col(vec_col).alias("__v"),
        )
        .orderBy("__h")
        .limit(n_cells)
        .collect()
    )
    if not rows:
        raise ValueError("kmeans_fit: empty input")
    return _normalize_rows(
        np.stack([np.asarray(r[1], dtype=float) for r in rows])
    )


def kmeans_fit(
    embeddings: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iters: int = 12,
    tol: float = 1e-6,
) -> SphericalKMeans:
    """Fit spherical k-means with a fully distributed Lloyd's loop.

    Per iteration: one corpus scan (mapInPandas partial sums, ≤
    ``n_cells`` rows emitted per task), one bounded hash aggregation
    (``n_cells × (dim+2)`` rows reach the driver), one centroid update
    on the driver. Early-stops when the max centroid movement (L2)
    drops below ``tol``.
    """
    spark = embeddings.sparkSession
    first = embeddings.select(vec_col).first()
    if first is None:
        raise ValueError("kmeans_fit: empty input")
    dim = len(first[0])
    centroids = _init_centroids(embeddings, n_cells, id_col, vec_col)
    k = len(centroids)  # clamped to the row count by the top-k init
    vecs = embeddings.select(F.col(vec_col).alias("__v"))

    iters_run = 0
    mean_sim = 0.0
    n_vectors = 0
    for _ in range(max_iters):
        b_cent = spark.sparkContext.broadcast(centroids)

        def partials(batches, _k=k, _dim=dim):
            # acc[c] = [Σ members, count, Σ cosine] packed in one row so a
            # single posexplode aggregation combines all three downstream.
            acc = np.zeros((_k, _dim + 2), dtype=np.float64)
            seen = False
            for pdf in batches:
                if pdf.empty:
                    continue
                V = np.stack([np.asarray(v, dtype=float) for v in pdf["__v"]])
                Vn = _normalize_rows(V)
                sims = Vn @ b_cent.value.T
                cell = np.argmax(sims, axis=1)
                best = sims[np.arange(len(V)), cell]
                np.add.at(acc[:, :_dim], cell, Vn)
                np.add.at(acc[:, _dim], cell, 1.0)
                np.add.at(acc[:, _dim + 1], cell, best)
                seen = True
            if seen:
                yield pd.DataFrame(
                    {"cell": np.arange(_k, dtype="int32"), "stats": list(acc)}
                )

        part = vecs.mapInPandas(partials, schema="cell int, stats array<double>")
        combined = (
            part.select("cell", F.posexplode("stats").alias("dim", "val"))
            .groupBy("cell", "dim")
            .agg(F.sum("val").alias("s"))
            .collect()
        )
        stats = np.zeros((k, dim + 2), dtype=np.float64)
        for r in combined:
            stats[r.cell, r.dim] = r.s
        counts = stats[:, dim]
        n_vectors = int(counts.sum())
        mean_sim = float(stats[:, dim + 1].sum() / max(n_vectors, 1))
        new_cent = centroids.copy()
        nonempty = counts > 0
        new_cent[nonempty] = _normalize_rows(
            stats[nonempty, :dim] / counts[nonempty, None]
        )
        iters_run += 1
        shift = float(np.max(np.linalg.norm(new_cent - centroids, axis=1)))
        centroids = new_cent
        b_cent.unpersist()
        if shift < tol:
            break
    return SphericalKMeans(
        centroids=centroids,
        iters_run=iters_run,
        mean_sim=mean_sim,
        n_vectors=n_vectors,
    )


def nearest_cell_udf(spark, centroids: np.ndarray):
    """Vectorized cell assignment against broadcast centroids —
    reusable by any caller that already holds a fitted model (the IVF
    index and kmeans_assign share this kernel, so tie-breaking and
    zero-norm handling stay bit-identical). The broadcast's lifetime is
    tied to the returned UDF: Spark's ContextCleaner reclaims it when
    the plan holding the UDF is garbage-collected driver-side."""
    from pyspark.sql.functions import pandas_udf

    b_cent = spark.sparkContext.broadcast(np.asarray(centroids, dtype=float))

    @pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        if vecs.empty:
            return pd.Series([], dtype="int32")
        V = np.stack([np.asarray(v, dtype=float) for v in vecs])
        Vn = _normalize_rows(V)
        return pd.Series(np.argmax(Vn @ b_cent.value.T, axis=1).astype("int32"))

    return nearest


def kmeans_assign(
    embeddings: DataFrame,
    model: SphericalKMeans,
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Append the nearest-centroid cell id — one broadcast, no shuffle."""
    nearest = nearest_cell_udf(embeddings.sparkSession, model.centroids)
    return embeddings.withColumn(cell_col, nearest(F.col(vec_col)))
