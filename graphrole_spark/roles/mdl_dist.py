"""Distributed MDL costs (encoding + KL error) for RolX model selection.

Reference semantics (graphrole/roles/description_length.py:32-61)
expressed as Spark aggregations so the costs of a distributed
factorization never require collecting G:

* encoding cost — exact distinct count over the (already quantized)
  G cells: after Lloyd-Max there are at most 2^bits distinct values, so
  ``countDistinct`` over the stacked role columns is a tiny aggregate;
* error cost — KL divergence summed cell-wise between V and Ĝ·F̂:
  row-local given broadcast F̂ (Arrow-batched partial sums, one driver
  reduce), zero-valued V cells contributing exactly 0.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def encoding_cost_distributed(
    G_df: DataFrame, role_cols: List[str], F_encoded: np.ndarray
) -> float:
    melt = "stack({}, {}) as (v)".format(
        len(role_cols), ", ".join(f"`{c}`" for c in role_cols)
    )
    g_vals = G_df.selectExpr(melt).agg(
        F.countDistinct("v").alias("n")
    ).collect()[0]["n"]
    g_size = G_df.count() * len(role_cols)
    f_vals = len(np.unique(F_encoded))
    n_bins = max(int(g_vals), f_vals)
    bits = float(np.ceil(np.log2(n_bins))) if n_bins > 1 else 0.0
    return bits * (g_size + F_encoded.size)


def error_cost_distributed(
    joined: DataFrame,
    value_cols: List[str],
    role_cols: List[str],
    F_encoded: np.ndarray,
) -> float:
    """KL error over a frame holding both V (value_cols) and Ĝ (role_cols)."""
    spark = joined.sparkSession
    F_bc = spark.sparkContext.broadcast(F_encoded)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Fm = F_bc.value
        total = 0.0
        for pdf in batches:
            V = pdf[value_cols].to_numpy(dtype=np.float64)
            G = pdf[role_cols].to_numpy(dtype=np.float64)
            Vhat = G @ Fm
            nz = V != 0
            logs = np.zeros_like(V)
            np.log(np.divide(V, Vhat, where=nz, out=np.ones_like(V)), where=nz, out=logs)
            total += float(np.sum(np.where(nz, V * logs - V + Vhat, 0.0)))
        yield pd.DataFrame({"kl": [total]})

    parts = joined.select(*value_cols, *role_cols).mapInPandas(
        partial, schema="kl double"
    )
    return float(parts.agg(F.sum("kl")).collect()[0][0] or 0.0)


def description_length_distributed(
    features: DataFrame,
    value_cols: List[str],
    G_df: DataFrame,
    role_cols: List[str],
    F_encoded: np.ndarray,
) -> Tuple[float, float]:
    joined = features.join(G_df, "node")
    return (
        encoding_cost_distributed(G_df, role_cols, F_encoded),
        error_cost_distributed(joined, value_cols, role_cols, F_encoded),
    )
