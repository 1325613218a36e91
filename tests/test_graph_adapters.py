"""Graph-object front door (networkx) + pluggable aggregations.

Mirrors the reference's primary entry point: a networkx graph object
passed straight to the extractor (reference:
graphrole/graph/interface/networkx.py:12, dispatch __init__.py:39-53)
and the callable-agg surface (reference: features/extract.py:26, tests
pass [np.sum, np.mean] at tests/test_features/test_extract.py:82-88).
"""

import networkx as nx
import numpy as np
import pytest
from pyspark.sql import functions as F

from graphrole_spark.operators.recursion import RecursiveFeatureExtractor
from graphrole_spark.sources.graphs import from_networkx, get_interface

PATH4_EDGES = [("a", "b"), ("a", "c"), ("c", "d")]
SEVEN_EDGES = [(0, 1), (0, 2), (0, 3), (3, 6), (4, 5), (4, 6), (5, 6)]
SEVEN_WEIGHTS = [2, 1.5, 3, 0.25, 0.75, 2.5, 1]


def test_from_networkx_relations(spark):
    G = nx.Graph()
    G.add_edges_from(PATH4_EDGES)
    edges, nodes, attrs, directed = from_networkx(G, spark)
    assert not directed
    assert attrs is None
    assert edges.count() == 3
    assert {r["node"] for r in nodes.collect()} == {"a", "b", "c", "d"}
    # missing weights default to 1.0 (reference networkx.py:115-123)
    assert {r["weight"] for r in edges.collect()} == {1.0}


def test_extractor_accepts_networkx_object(spark):
    """Graph-object run must equal the edge-DataFrame run (path4)."""
    G = nx.Graph()
    G.add_edges_from(PATH4_EDGES)
    via_graph = (
        RecursiveFeatureExtractor(G)
        .extract_features()
        .toPandas()
        .set_index("node")
        .sort_index()
    )
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in PATH4_EDGES], "src string, dst string, weight double"
    )
    via_frame = (
        RecursiveFeatureExtractor(edges)
        .extract_features()
        .toPandas()
        .set_index("node")
        .sort_index()
    )
    assert sorted(via_graph.columns) == sorted(via_frame.columns)
    assert np.allclose(
        via_graph.sort_index(axis=1).values, via_frame.sort_index(axis=1).values
    )


def test_directed_weighted_seven_node_graph(spark):
    """Directedness and weights are read off the graph object
    (reference seven-node weighted digraph fixture)."""
    G = nx.DiGraph()
    for (u, v), w in zip(SEVEN_EDGES, SEVEN_WEIGHTS):
        G.add_edge(u, v, weight=w)
    edges, nodes, _, directed = from_networkx(G, spark)
    assert directed
    rfe = RecursiveFeatureExtractor(G, max_generations=1, prune=False)
    feats = rfe.extract_features().toPandas().set_index("node")
    # out-degree of node 0 = 2 + 1.5 + 3 (weighted, directed)
    assert feats.loc["0", "out_degree"] == pytest.approx(6.5)
    assert feats.loc["6", "in_degree"] == pytest.approx(0.25 + 2.5 + 1)


def test_networkx_node_attributes(spark):
    G = nx.Graph()
    G.add_edges_from(PATH4_EDGES)
    nx.set_node_attributes(G, {"a": 3, "b": 1}, name="score")
    nx.set_node_attributes(G, {"a": "red"}, name="color")  # non-numeric: skipped
    rfe = RecursiveFeatureExtractor(G, max_generations=1)
    feats = rfe.extract_features().toPandas().set_index("node")
    assert "attribute_score" in feats.columns
    assert "attribute_color" not in feats.columns
    assert feats.loc["a", "attribute_score"] == 3.0
    assert feats.loc["c", "attribute_score"] == 0.0  # missing -> 0


def test_unknown_graph_type_raises():
    with pytest.raises(TypeError):
        RecursiveFeatureExtractor(object())
    assert get_interface(object()) is None


def test_callable_and_extended_aggs(spark):
    """Callable aggs (F.sum / F.avg mirror [np.sum, np.mean]) and the
    extended named set (stddev, count) in edges mode."""
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in PATH4_EDGES], "src string, dst string, weight double"
    )
    named = RecursiveFeatureExtractor(
        edges, max_generations=2, aggs=("sum", "mean")
    ).extract_features().toPandas().set_index("node").sort_index()
    via_callables = RecursiveFeatureExtractor(
        edges, max_generations=2, aggs=(F.sum, ("mean", F.avg))
    ).extract_features().toPandas().set_index("node").sort_index()
    assert sorted(named.columns) == sorted(via_callables.columns)
    assert np.allclose(
        named.sort_index(axis=1).values, via_callables.sort_index(axis=1).values
    )

    ext = RecursiveFeatureExtractor(
        edges, max_generations=2, aggs=("sum", "stddev", "count"), prune=False
    ).extract_features().toPandas()
    assert any("(stddev)" in c for c in ext.columns)
    assert any("(count)" in c for c in ext.columns)
