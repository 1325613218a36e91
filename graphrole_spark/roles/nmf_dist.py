"""Distributed NMF: block-partitioned multiplicative updates.

The factorization V ≈ G·F splits naturally for tall-skinny V
(n_entities huge, n_features tens):

* G rows live WITH the matching V rows — the G update
  ``G ← G * (V Fᵀ) / (G F Fᵀ)`` is row-local given F, so it runs as an
  Arrow-batched ``mapInPandas`` with F broadcast (no shuffle at all);
* the F update needs only ``GᵀV`` (k×m) and ``GᵀG`` (k×k) — each
  partition emits its partial products (a few KB) and the driver
  reduces + applies ``F ← F * GᵀV / (GᵀG F)``.

One Spark job per iteration, shuffle-free except the initial salted
repartition that breaks up conversation-length skew (BASELINE.json
north_star: "block-partitioned alternating least squares with explicit
salted repartitioning"). Initialization: F from NNDSVDa of a
deterministic row sample (features are tens-dimensional, so the sample
Gram captures the column space); G seeded row-locally by a deterministic
hash so results are reproducible run to run.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F_sql

from graphrole_spark.oracle.nmf import _EPS, nndsvda_init


def _initial_g(V: np.ndarray, F_mat: np.ndarray, floor: float) -> np.ndarray:
    """Row-local warm start: non-negative projection of the least-squares
    solution ``G0 = clip(V Fᵀ (F Fᵀ + λI)⁻¹, floor)``. Deterministic (pure
    function of V and the broadcast F) and much closer to the optimum than
    a random init, so the global MU iteration count stays small."""
    k = F_mat.shape[0]
    FFt = F_mat @ F_mat.T
    ridge = 1e-6 * max(float(np.trace(FFt)) / max(k, 1), 1.0)
    inv = np.linalg.inv(FFt + ridge * np.eye(k))
    G0 = V @ F_mat.T @ inv
    return np.maximum(G0, floor)


def nmf_distributed(
    features: DataFrame,
    value_cols: List[str],
    n_roles: int,
    max_iter: int = 40,
    inner_steps: int = 8,
    sample_rows: int = 10_000,
    salt_partitions: int | None = None,
) -> Tuple[DataFrame, np.ndarray]:
    """Factor the (node, value_cols) frame into (G DataFrame, F ndarray).

    :returns: (DataFrame (node, role_0..role_{k-1}), F k×m ndarray)
    """
    spark = features.sparkSession
    m = len(value_cols)
    k = int(n_roles)
    if k < 1 or k > m:
        raise ValueError(f"n_roles must be in [1, {m}]")

    # --- init F from a deterministic sample's NNDSVDa ---------------------
    sample = (
        features.select(*value_cols)
        .orderBy(F_sql.xxhash64(*[F_sql.col(c) for c in value_cols]))
        .limit(sample_rows)
        .toPandas()
        .to_numpy(dtype=np.float64)
    )
    if sample.shape[0] < k:
        raise ValueError("not enough rows to initialize NMF")
    _, F_mat = nndsvda_init(sample, k)
    g_scale = float(max(sample.mean(), _EPS))

    # --- iterate: one pass per iteration -----------------------------------
    # salt the partitioning so a single huge conversation's rows spread out
    n_parts = salt_partitions or features.sparkSession.sparkContext.defaultParallelism
    work = features.select("node", *value_cols).repartition(
        n_parts, F_sql.pmod(F_sql.xxhash64("node"), F_sql.lit(n_parts))
    )
    work = work.persist()
    work.count()

    g_cols = [f"role_{i}" for i in range(k)]
    out_schema = "node string, " + ", ".join(f"`{c}` double" for c in g_cols)
    partial_schema = "kind string, i int, j int, v double"

    current = None  # DataFrame (node, v..., g...)
    for it in range(max_iter):
        F_bc = spark.sparkContext.broadcast(F_mat)
        first_iter = current is None
        src = work if first_iter else current

        def update_and_partials(
            batches: Iterator[pd.DataFrame], _first=first_iter, _F=F_bc, _k=k,
            _vcols=tuple(value_cols), _gcols=tuple(g_cols), _scale=g_scale,
        ) -> Iterator[pd.DataFrame]:
            Fm = _F.value
            FFt = Fm @ Fm.T
            for pdf in batches:
                V = pdf[list(_vcols)].to_numpy(dtype=np.float64)
                if _first:
                    G = _initial_g(V, Fm, _scale * 1e-4)
                else:
                    G = pdf[list(_gcols)].to_numpy(dtype=np.float64)
                VFt = V @ Fm.T
                for _ in range(inner_steps):  # row-local: extra steps are free
                    G = G * (VFt / (G @ FFt + _EPS))
                out = pdf[["node"] + list(_vcols)].copy()
                for j, c in enumerate(_gcols):
                    out[c] = G[:, j]
                yield out

        schema = "node string, " + ", ".join(
            f"`{c}` double" for c in list(value_cols) + g_cols
        )
        updated = src.mapInPandas(update_and_partials, schema=schema).persist()

        # partial products for the F update
        def partials(
            batches: Iterator[pd.DataFrame], _vcols=tuple(value_cols),
            _gcols=tuple(g_cols),
        ) -> Iterator[pd.DataFrame]:
            gtv = None
            gtg = None
            for pdf in batches:
                V = pdf[list(_vcols)].to_numpy(dtype=np.float64)
                G = pdf[list(_gcols)].to_numpy(dtype=np.float64)
                gtv = G.T @ V if gtv is None else gtv + G.T @ V
                gtg = G.T @ G if gtg is None else gtg + G.T @ G
            rows = []
            if gtv is not None:
                for i in range(gtv.shape[0]):
                    for j in range(gtv.shape[1]):
                        rows.append(("gtv", i, j, float(gtv[i, j])))
                for i in range(gtg.shape[0]):
                    for j in range(gtg.shape[1]):
                        rows.append(("gtg", i, j, float(gtg[i, j])))
            yield pd.DataFrame(rows, columns=["kind", "i", "j", "v"])

        sums = (
            updated.mapInPandas(partials, schema=partial_schema)
            .groupBy("kind", "i", "j")
            .agg(F_sql.sum("v").alias("v"))
            .collect()
        )
        GtV = np.zeros((k, m))
        GtG = np.zeros((k, k))
        for row in sums:
            if row["kind"] == "gtv":
                GtV[row["i"], row["j"]] = row["v"]
            else:
                GtG[row["i"], row["j"]] = row["v"]
        # GtV/GtG are exact for the current G, so several inner F steps
        # cost nothing extra (no cluster round-trip)
        for _ in range(inner_steps):
            F_mat = F_mat * (GtV / (GtG @ F_mat + _EPS))

        if current is not None:
            current.unpersist()
        current = updated
        # NOTE: F broadcasts (k×m doubles) are left to GC — the cached
        # `updated` frame's lineage still references the latest one, so an
        # eager destroy() poisons recomputation after cache eviction.
        if (it + 1) % 5 == 0:
            # truncate the mapInPandas lineage chain so a cache eviction
            # never replays the whole iteration history
            current = current.localCheckpoint(eager=True)

    G_df = current.select("node", *g_cols)
    work.unpersist()
    return G_df, F_mat
