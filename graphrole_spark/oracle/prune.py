"""Feature pruning: binned-Chebyshev grouping + oldest-feature selection.

Reproduces the reference pruner's semantics
(reference: graphrole/features/prune.py:59-139):

* bin every feature column with vertical log binning;
* connect two features when the Chebyshev (max-abs) distance between
  their binned columns is <= the generation threshold;
* within each connected component keep only the feature from the
  earliest generation, ties broken by lexicographically smallest name;
* isolated features are never pruned.

``group_feature_names`` is shared with the Spark pruner: the distributed
path computes the same pairwise Chebyshev distances with one aggregation
pass and hands the tiny (n_features²) distance table to this module.
"""

from __future__ import annotations

import itertools as it
from typing import Dict, Iterable, List, Mapping, Sequence, Set

import numpy as np
import pandas as pd

from graphrole_spark.oracle.binning import vertical_log_binning
from graphrole_spark.oracle.components import connected_components


def chebyshev_pairs(binned: pd.DataFrame) -> Dict[tuple, float]:
    """Pairwise max-abs distance between binned feature columns."""
    cols = list(binned.columns)
    out: Dict[tuple, float] = {}
    mat = binned.to_numpy()
    for i, j in it.combinations(range(len(cols)), 2):
        out[(cols[i], cols[j])] = float(np.max(np.abs(mat[:, i] - mat[:, j]))) if len(mat) else 0.0
    return out


def group_feature_names(
    feature_names: Sequence[str],
    distances: Mapping[tuple, float],
    thresh: float,
) -> List[Set[str]]:
    """Connected components of the thresholded feature graph.

    ``distances`` holds one entry per unordered feature pair. Features
    touching no edge are isolated and simply do not appear in any group.
    """
    edges = [
        pair
        for pair in it.combinations(feature_names, 2)
        if distances.get(pair, distances.get((pair[1], pair[0]), np.inf)) <= thresh
    ]
    return connected_components(edges)


def oldest_feature(
    names: Set[str], generation_dict: Mapping[int, Mapping[str, object]]
) -> str:
    """Earliest-generation member of ``names``; sorted-name tie-break."""
    for gen in sorted(generation_dict):
        hit = names.intersection(generation_dict[gen].keys())
        if hit:
            return min(hit)
    return min(names)


def select_features_to_drop(
    groups: Iterable[Set[str]],
    generation_dict: Mapping[int, Mapping[str, object]],
) -> List[str]:
    drop: List[str] = []
    for group in groups:
        if len(group) <= 1:
            continue  # isolated features survive
        keep = oldest_feature(group, generation_dict)
        drop.extend(group - {keep})
    return drop


class FeaturePruner:
    """Driver-side pruner used by the numpy oracle (pandas in, names out)."""

    def __init__(
        self,
        generation_dict: Mapping[int, Mapping[str, object]],
        feature_group_thresh: float,
    ) -> None:
        self._generation_dict = generation_dict
        self._feature_group_thresh = feature_group_thresh

    def prune_features(self, features: pd.DataFrame) -> List[str]:
        groups = self._group_features(features)
        return select_features_to_drop(groups, self._generation_dict)

    def _group_features(self, features: pd.DataFrame) -> List[Set[str]]:
        binned = features.apply(lambda col: vertical_log_binning(col.to_numpy()))
        dists = chebyshev_pairs(binned)
        return group_feature_names(list(features.columns), dists, self._feature_group_thresh)

    def _get_oldest_feature(self, names: Set[str]) -> str:
        return oldest_feature(names, self._generation_dict)
