"""Property test: the distributed extractor equals the numpy oracle on
RANDOM small graphs (not just the ported golden fixtures).

Every example runs the full Spark recursion (seeds, neighbor
aggregation, binning, Chebyshev pruning, finalize) and the pure-numpy
reference-semantics oracle on the same edge list, then compares retained
feature names per generation AND values (allclose)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from graphrole_spark.operators.recursion import RecursiveFeatureExtractor
from graphrole_spark.oracle.refex import RefexOracle

NODES = list("abcdefg")

edges_strategy = st.lists(
    st.tuples(st.sampled_from(NODES), st.sampled_from(NODES)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=10,
    unique=True,
).filter(
    # one edge per unordered pair (undirected graph, reference convention)
    lambda es: len({frozenset(e) for e in es}) == len(es)
)


def _compare(spark, edges, weights, directed):
    oracle = RefexOracle(
        edges, weights=weights, directed=directed, max_generations=3
    )
    expected = oracle.extract_features().sort_index()

    edf = spark.createDataFrame(
        [(a, b, float(w)) for (a, b), w in zip(edges, weights)],
        "src string, dst string, weight double",
    )
    rfe = RecursiveFeatureExtractor(edf, directed=directed, max_generations=3)
    got = rfe.extract_features().toPandas().set_index("node").sort_index()

    assert rfe.retained_by_generation() == oracle.retained_by_generation(), edges
    assert sorted(got.columns) == sorted(expected.columns), edges
    assert np.allclose(
        got.sort_index(axis=1).values,
        expected.sort_index(axis=1).astype(float).values,
    ), (edges, weights, directed)


@settings(max_examples=7, deadline=None)
@given(edges=edges_strategy)
def test_random_graphs_match_numpy_oracle(spark, edges):
    _compare(spark, edges, [1.0] * len(edges), directed=False)


@settings(max_examples=5, deadline=None)
@given(
    edges=edges_strategy,
    data=st.data(),
    directed=st.booleans(),
)
def test_random_weighted_graphs_match_numpy_oracle(spark, edges, data, directed):
    weights = data.draw(
        st.lists(
            st.sampled_from([0.25, 0.5, 1.0, 2.0, 3.5]),
            min_size=len(edges), max_size=len(edges),
        )
    )
    _compare(spark, edges, weights, directed=directed)
