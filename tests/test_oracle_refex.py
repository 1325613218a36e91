"""Golden tests for the ReFeX oracle (seeds + recursion + e2e).

Ported from reference: tests/test_graph/test_interface.py:124-322 and
tests/test_features/test_extract.py:36-122,210-214.
"""

import numpy as np
import pandas as pd
import pytest

from graphrole_spark.oracle.refex import EdgeListGraph, RefexOracle
from tests.conftest import (
    PATH4_EDGES,
    PATH4_GEN1_GOLDEN,
    PATH4_NODES,
    SEVEN_DW_GOLDEN,
    SEVEN_EDGES,
    SEVEN_GOLDEN,
    SEVEN_WEIGHTS,
)


def _sorted_frame(d):
    return pd.DataFrame(d).sort_index(axis=0).sort_index(axis=1).astype(float)


def test_seed_features_seven_undirected():
    g = EdgeListGraph(SEVEN_EDGES)
    got = g.neighborhood_features()
    # column order: local then egonet (reference: base.py:18-26)
    assert list(got.columns) == ["degree", "internal_edges", "external_edges"]
    pd.testing.assert_frame_equal(
        got.sort_index(axis=1), _sorted_frame(SEVEN_GOLDEN), check_dtype=False
    )


def test_seed_features_seven_directed_weighted():
    g = EdgeListGraph(SEVEN_EDGES, weights=SEVEN_WEIGHTS, directed=True)
    got = g.neighborhood_features()
    assert list(got.columns) == [
        "in_degree",
        "out_degree",
        "total_degree",
        "internal_edges",
        "external_edges",
    ]
    pd.testing.assert_frame_equal(
        got.sort_index(axis=1), _sorted_frame(SEVEN_DW_GOLDEN), check_dtype=False
    )


def test_seed_features_with_attributes():
    attrs = {
        0: {"attr1": 1.0, "attr2": 0.0},
        1: {"attr2": 1.0},
        2: {"attr2": 2.0},
        3: {"attr2": 3.0},
        4: {"attr2": 4.0},
        5: {"attr2": 5.0},
        6: {"attr2": 6.0},
    }
    g = EdgeListGraph(SEVEN_EDGES, node_attributes=attrs)
    got = g.neighborhood_features(attributes=True)
    assert list(got.columns) == [
        "degree",
        "attribute_attr1",
        "attribute_attr2",
        "internal_edges",
        "external_edges",
    ]
    assert got["attribute_attr1"].tolist() == [1.0, 0, 0, 0, 0, 0, 0]
    assert got["attribute_attr2"].tolist() == [0.0, 1, 2, 3, 4, 5, 6]
    # include/exclude matrix (reference: test_interface.py:188-322)
    only2 = g.neighborhood_features(attributes=True, attributes_include=["attr2"])
    assert "attribute_attr1" not in only2.columns
    excl = g.neighborhood_features(attributes=True, attributes_exclude=["attr2"])
    assert "attribute_attr2" not in excl.columns
    both = g.neighborhood_features(
        attributes=True,
        attributes_include=["attr1", "attr2"],
        attributes_exclude=["attr2"],  # exclude wins on conflict
    )
    assert "attribute_attr2" not in both.columns
    assert "attribute_attr1" in both.columns


def test_gen1_features_path4_golden():
    rfe = RefexOracle(PATH4_EDGES)
    # seed state exactly as the reference test does (bypassing gen-0 pruning)
    rfe._features = rfe.graph.neighborhood_features()
    rfe._final_features = {0: rfe._features.to_dict()}
    rfe.generation_count = 1
    got = rfe._next_features()
    expected = _sorted_frame(PATH4_GEN1_GOLDEN)
    assert np.allclose(
        got.sort_index(axis=0).sort_index(axis=1).values, expected.values
    )


def test_dangling_nodes_e2e():
    rfe = RefexOracle([("a", "c")], nodes=PATH4_NODES)
    feats = rfe.extract_features()
    assert feats.index.tolist() == PATH4_NODES
    assert feats.notna().all().all()


def test_dangling_nodes_gen1_rows():
    rfe = RefexOracle([("a", "c")], nodes=PATH4_NODES)
    rfe._features = rfe.graph.neighborhood_features()
    rfe._final_features = {0: rfe._features.to_dict()}
    rfe.generation_count = 1
    nxt = rfe._next_features()
    assert sorted(nxt.index.tolist()) == ["a", "c"]
    assert nxt.notna().all().all()


def test_update_prunes_duplicates():
    """Near-duplicate new features collapse onto the oldest original.

    Mirrors reference: tests/test_features/test_extract.py:124-159.
    """
    rng = np.random.RandomState(0)
    rfe = RefexOracle(PATH4_EDGES)
    rfe._features = rfe.graph.neighborhood_features()
    rfe._final_features = {0: rfe._features.to_dict()}
    rfe.generation_count = 1
    existing = rfe._features
    new = pd.concat(
        [
            pd.DataFrame(
                existing["degree"].values, columns=["degree2"], index=existing.index
            ),
            pd.DataFrame(
                rng.randn(existing.shape[0], 2), columns=["a", "b"], index=existing.index
            ),
        ],
        axis=1,
    )
    rfe._update(new)
    assert list(rfe._features.columns) == ["degree", "external_edges", "a", "b"]
    final = rfe._finalize()
    assert set(final.columns) == {
        "degree", "internal_edges", "external_edges", "a", "b",
    }


def test_extract_back_to_back_identical():
    rfe = RefexOracle(PATH4_EDGES)
    f1 = rfe.extract_features()
    f2 = rfe.extract_features()
    pd.testing.assert_frame_equal(f1, f2)


def test_empty_graph_raises():
    with pytest.raises(ValueError):
        RefexOracle([])


def test_custom_aggs():
    rfe = RefexOracle(PATH4_EDGES, aggs=["sum", "mean", "max"])
    feats = rfe.extract_features()
    assert any("(max)" in c for c in feats.columns) or feats.shape[1] > 0
