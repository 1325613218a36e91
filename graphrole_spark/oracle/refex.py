"""Numpy/pandas oracle for ReFeX recursive feature extraction.

Single-process re-implementation of the reference semantics
(reference: graphrole/features/extract.py:11-163 and
graphrole/graph/interface/networkx.py:48-123), operating directly on an
edge list instead of a networkx/igraph object. Validated against the
reference test goldens (reference: tests/test_features/test_extract.py:104-122,
tests/test_graph/test_interface.py:124-186).

This is the ``numpy.allclose`` target for the distributed engine and the
executable specification of:

* seed features: (weighted) degree / in/out/total degree, egonet
  internal & external edge sums, optional numeric node attributes;
* the recursion: per generation, aggregate each node's neighbors'
  previous-generation features with every agg in ``aggs`` and name the
  results ``f"{feature}({agg})"``;
* pruning: vertical log binning + Chebyshev feature grouping + keep the
  oldest (earliest-generation, then lexicographically smallest) feature
  per group;
* bookkeeping invariants: NaN→0 after every concat, gen>=1 rows exist
  only for nodes with at least one (out-)neighbor, retained names are
  recorded in sorted order, recursion stops when a generation retains
  nothing.
"""

from __future__ import annotations

from numbers import Number
from typing import Dict, Hashable, Iterable, List, Mapping, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from graphrole_spark.oracle.prune import FeaturePruner

Edge = Tuple[Hashable, Hashable]


class EdgeListGraph:
    """Minimal weighted graph over an explicit edge list.

    Mirrors the degree / egonet / neighbor semantics of the reference's
    graph adapters: undirected degree counts self-loops twice, directed
    egonets are built over out-neighbors, external (boundary) edges are
    counted in the interior→exterior direction only
    (reference: graphrole/graph/interface/igraph.py:84-205).
    """

    def __init__(
        self,
        edges: Sequence[Edge],
        weights: Optional[Sequence[float]] = None,
        directed: bool = False,
        nodes: Optional[Sequence[Hashable]] = None,
        node_attributes: Optional[Mapping[Hashable, Mapping[str, object]]] = None,
    ) -> None:
        self.directed = directed
        self.edge_weights: List[Tuple[Hashable, Hashable, float]] = []
        w = list(weights) if weights is not None else [1.0] * len(edges)
        if len(w) != len(edges):
            raise ValueError("weights length must match edges length")
        node_set: dict = {}
        for (u, v), wt in zip(edges, w):
            self.edge_weights.append((u, v, float(wt)))
            node_set.setdefault(u, None)
            node_set.setdefault(v, None)
        for n in nodes or []:
            node_set.setdefault(n, None)
        self.nodes: List[Hashable] = list(node_set.keys())
        self.attrs = dict(node_attributes or {})

        self._succ: Dict[Hashable, Dict[Hashable, float]] = {n: {} for n in self.nodes}
        self._pred: Dict[Hashable, Dict[Hashable, float]] = {n: {} for n in self.nodes}
        for u, v, wt in self.edge_weights:
            self._succ[u][v] = self._succ[u].get(v, 0.0) + wt
            self._pred[v][u] = self._pred[v].get(u, 0.0) + wt
            if not directed:
                self._succ[v][u] = self._succ[v].get(u, 0.0) + wt
                self._pred[u][v] = self._pred[u].get(v, 0.0) + wt

    def num_edges(self) -> int:
        return len(self.edge_weights)

    def neighbors(self, node: Hashable) -> List[Hashable]:
        # out-neighbors for directed graphs (reference: igraph.py:55-59)
        return list(self._succ.get(node, {}))

    # --- seed features -------------------------------------------------

    def local_features(self) -> pd.DataFrame:
        if self.directed:
            rows = {
                n: {
                    "in_degree": sum(self._pred[n].values()),
                    "out_degree": sum(self._succ[n].values()),
                }
                for n in self.nodes
            }
            df = pd.DataFrame.from_dict(rows, orient="index")
            df["total_degree"] = df["in_degree"] + df["out_degree"]
        else:
            deg = {n: 0.0 for n in self.nodes}
            for u, v, wt in self.edge_weights:
                deg[u] += wt
                deg[v] += wt  # a self-loop (u == v) adds 2*wt, like networkx
            df = pd.DataFrame.from_dict(
                {n: {"degree": d} for n, d in deg.items()}, orient="index"
            )
        return df.astype(float)

    def egonet_features(self) -> pd.DataFrame:
        rows = {}
        for n in self.nodes:
            ego = set(self.neighbors(n)) | {n}
            internal = 0.0
            external = 0.0
            for u, v, wt in self.edge_weights:
                u_in, v_in = u in ego, v in ego
                if u_in and v_in:
                    internal += wt
                elif self.directed:
                    if u_in and not v_in:  # interior → exterior only
                        external += wt
                elif u_in != v_in:
                    external += wt
            rows[n] = {"internal_edges": internal, "external_edges": external}
        return pd.DataFrame.from_dict(rows, orient="index").astype(float)

    def attribute_features(
        self,
        include: Optional[Sequence[str]] = None,
        exclude: Optional[Sequence[str]] = None,
    ) -> pd.DataFrame:
        """Numeric node attributes as ``attribute_<name>`` columns.

        ``exclude`` beats ``include``; non-numeric values are skipped;
        missing values become 0 (reference: networkx.py:87-113).
        """
        excluded = set(exclude or [])
        if include:
            names = [a for a in include if a not in excluded]
        else:
            seen: dict = {}
            for n in self.nodes:
                for a, val in (self.attrs.get(n) or {}).items():
                    if a not in excluded and isinstance(val, Number):
                        seen.setdefault(a, None)
            names = list(seen.keys())
        data = {}
        for a in names:
            col = {}
            for n in self.nodes:
                val = (self.attrs.get(n) or {}).get(a, 0)
                col[n] = float(val) if isinstance(val, Number) else np.nan
            data[f"attribute_{a}"] = col
        df = pd.DataFrame(data, index=self.nodes)
        return df.fillna(0.0)

    def neighborhood_features(
        self,
        attributes: bool = False,
        attributes_include: Optional[Sequence[str]] = None,
        attributes_exclude: Optional[Sequence[str]] = None,
    ) -> pd.DataFrame:
        parts = [self.local_features()]
        if attributes:
            parts.append(self.attribute_features(attributes_include, attributes_exclude))
        parts.append(self.egonet_features())
        return pd.concat(parts, axis=1).sort_index().fillna(0.0)


class RefexOracle:
    """Recursive feature extraction with reference-equivalent semantics."""

    def __init__(
        self,
        edges: Sequence[Edge],
        weights: Optional[Sequence[float]] = None,
        directed: bool = False,
        nodes: Optional[Sequence[Hashable]] = None,
        node_attributes: Optional[Mapping[Hashable, Mapping[str, object]]] = None,
        max_generations: int = 10,
        aggs: Sequence[str] = ("sum", "mean"),
        attributes: bool = False,
        attributes_include: Optional[Sequence[str]] = None,
        attributes_exclude: Optional[Sequence[str]] = None,
    ) -> None:
        self.graph = EdgeListGraph(
            edges, weights=weights, directed=directed, nodes=nodes,
            node_attributes=node_attributes,
        )
        if self.graph.num_edges() == 0:
            raise ValueError("input graph must contain at least one edge")
        self.max_generations = max_generations
        self.aggs = list(aggs)
        self._attr_kwargs = dict(
            attributes=attributes,
            attributes_include=attributes_include,
            attributes_exclude=attributes_exclude,
        )
        self.generation_count = 0
        # grouping threshold tracks the generation in the driver loop but is
        # maintained independently (reference: extract.py:52-56)
        self._feature_group_thresh = 0
        self._features = pd.DataFrame()
        self._final_features: Dict[int, Dict[str, Dict[Hashable, float]]] = {}

    # -- public ----------------------------------------------------------

    def extract_features(self) -> pd.DataFrame:
        if self._final_features:
            return self._finalize()
        self._update(self.graph.neighborhood_features(**self._attr_kwargs))
        for gen in range(1, self.max_generations):
            self.generation_count = gen
            self._feature_group_thresh = gen
            self._update(self._next_features())
            if not self._final_features[gen]:
                break
        return self._finalize()

    def retained_by_generation(self) -> Dict[int, List[str]]:
        return {g: list(d.keys()) for g, d in self._final_features.items()}

    # -- internals ---------------------------------------------------------

    def _next_features(self) -> pd.DataFrame:
        prev_cols = list(self._final_features[self.generation_count - 1].keys())
        rows = {}
        for node in self.graph.nodes:
            nbrs = self.graph.neighbors(node)
            if not nbrs:
                # neighborless nodes emit no row in gen>=1; they re-enter the
                # combined frame as zeros via the outer concat + fillna
                continue
            block = self._features.reindex(index=nbrs, columns=prev_cols)
            row = {}
            for agg in self.aggs:
                agg_vals = getattr(block, agg)()
                for col in prev_cols:
                    v = agg_vals[col]
                    row[f"{col}({agg})"] = 0.0 if pd.isna(v) else float(v)
            rows[node] = row
        return pd.DataFrame.from_dict(rows, orient="index")

    def _update(self, new_features: pd.DataFrame) -> None:
        self._features = pd.concat(
            [self._features, new_features], axis=1, sort=True
        ).fillna(0.0)
        pruner = FeaturePruner(self._final_features, self._feature_group_thresh)
        to_drop = pruner.prune_features(self._features)
        self._features = self._features.drop(columns=to_drop)
        # reference extract.py:140 relies on Index.difference returning a
        # SORTED index; pandas 2.x (this env) skips the sort when to_drop
        # is empty, so sort explicitly to keep the pinned-pandas behavior
        retained = sorted(set(new_features.columns) - set(to_drop))
        self._final_features[self.generation_count] = (
            self._features[retained].to_dict() if len(retained) else {}
        )

    def _finalize(self) -> pd.DataFrame:
        merged: Dict[str, Dict[Hashable, float]] = {}
        for gen in sorted(self._final_features):
            for name, vals in self._final_features[gen].items():
                merged.setdefault(name, vals)
        return pd.DataFrame(merged).sort_index()
