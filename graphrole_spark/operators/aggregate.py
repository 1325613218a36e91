"""Neighbor feature aggregation — the ReFeX core operator (R1).

For every node, aggregate its neighbors' feature columns with each
named aggregation, producing columns ``f"{feature}({agg})"``
(reference: graphrole/features/extract.py:98-119,144-163).

Plan shape: one equi-join (neighbor relation × feature frame, both
hash-partitioned on the node key) + one hash aggregation with all
agg expressions fused — Catalyst inserts map-side partial aggregation,
so the shuffle carries partially-reduced rows. Only nodes with at least
one neighbor appear in the output (reference gen>=1 semantics).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AGG_FUNCS = {
    "sum": F.sum,
    "mean": F.avg,
    "avg": F.avg,
    "max": F.max,
    "min": F.min,
    "stddev": F.stddev,
    "count": F.count,
}


def normalize_aggs(aggs):
    """Accept the reference's pluggable agg surface
    (reference: graphrole/features/extract.py:26 — callables like
    ``[np.sum, np.mean]``) as (name, fn) pairs:

    * a string — looked up in :data:`AGG_FUNCS`;
    * a ``(name, fn)`` tuple — fn maps a Column to an aggregate Column;
    * a callable — its ``__name__`` becomes the feature-name suffix
      (``F.sum`` → ``feat(sum)``, matching pandas' display names).
    """
    pairs = []
    for a in aggs:
        if isinstance(a, str):
            if a not in AGG_FUNCS:
                raise ValueError(f"unsupported agg '{a}'; use {sorted(AGG_FUNCS)}")
            pairs.append((a, AGG_FUNCS[a]))
        elif isinstance(a, tuple) and len(a) == 2 and callable(a[1]):
            pairs.append((str(a[0]), a[1]))
        elif callable(a):
            pairs.append((a.__name__, a))
        else:
            raise ValueError(f"agg must be a name, (name, fn) or callable: {a!r}")
    return pairs


def neighbor_aggregate(
    neighbor_rel: DataFrame,
    features: DataFrame,
    feature_cols: Sequence[str],
    aggs: Sequence[str] = ("sum", "mean"),
) -> DataFrame:
    """Aggregate neighbors' features.

    :param neighbor_rel: (src, dst) pairs — dst is the neighbor whose
        features are aggregated onto src; pass a symmetrized relation
        for undirected graphs
    :param features: (node, <feature cols>) wide frame
    :returns: (node, ``feat(agg)``...) for nodes with ≥ 1 neighbor
    """
    feats = features.select(
        F.col("node").alias("dst"), *[F.col(c) for c in feature_cols]
    )
    # feature matrices are all-float64 (reference invariant, SURVEY §1.2)
    agg_exprs = [
        fn(F.col(c)).cast("double").alias(f"{c}({name})")
        for name, fn in normalize_aggs(aggs)
        for c in feature_cols
    ]
    return (
        neighbor_rel.join(feats, "dst")
        .groupBy(F.col("src").alias("node"))
        .agg(*agg_exprs)
        .na.fill(0.0)
    )
