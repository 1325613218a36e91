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


@settings(max_examples=8, deadline=None)
@given(edges=edges_strategy)
def test_random_graphs_match_numpy_oracle(spark, edges):
    oracle = RefexOracle(edges, max_generations=3)
    expected = oracle.extract_features().sort_index()

    edf = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src string, dst string, weight double"
    )
    rfe = RecursiveFeatureExtractor(edf, max_generations=3)
    got = rfe.extract_features().toPandas().set_index("node").sort_index()

    assert rfe.retained_by_generation() == oracle.retained_by_generation(), edges
    assert sorted(got.columns) == sorted(expected.columns), edges
    assert np.allclose(
        got.sort_index(axis=1).values,
        expected.sort_index(axis=1).astype(float).values,
    ), edges
