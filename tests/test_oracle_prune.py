"""Golden tests for the feature pruner and connected components.

Ported from reference: tests/test_features/test_prune.py:107-225 and
tests/test_graph/test_graph.py:11-53.
"""

import pandas as pd
import pytest

from graphrole_spark.oracle.components import connected_components
from graphrole_spark.oracle.prune import FeaturePruner, oldest_feature


GENERATION_DICT = {
    0: {"a": {0: 0, 1: 1}, "b": {0: 2, 1: 3}, "c": {0: 8, 1: 9}},
    1: {"d": {0: 4, 1: 5}, "e": {0: 6, 1: 7}},
}

PRUNE_FRAME = pd.DataFrame(
    {
        "a": [1, 2, 3, 10],
        "b": [1, 2, 3, 1],
        "c": [2, 1, 1, 4],
        "d": [1, 1, 1, 1],
        "e": [1, 1, 2, 0],
    }
)


@pytest.mark.parametrize(
    "thresh,expected",
    [(0, []), (1, ["c", "d", "e"]), (2, ["b", "c", "d", "e"])],
)
def test_prune_features_golden(thresh, expected):
    pruner = FeaturePruner(GENERATION_DICT, thresh)
    assert set(pruner.prune_features(PRUNE_FRAME)) == set(expected)


GROUP_FRAME = pd.DataFrame(
    {"a": [1, 2, 3], "b": [1, 2, 3], "c": [2, 1, 1], "d": [1, 1, 1]}
)


@pytest.mark.parametrize(
    "thresh,expected",
    [
        (0, [{"a", "b"}]),
        (1, [{"a", "b"}, {"c", "d"}]),
        (2, [{"a", "b", "c", "d"}]),
        (-1, []),
    ],
)
def test_group_features_golden(thresh, expected):
    pruner = FeaturePruner({0: {"b": {}, "a": {}}, 1: {"c": {}, "d": {}}}, thresh)
    assert list(pruner._group_features(GROUP_FRAME)) == expected


@pytest.mark.parametrize(
    "names,expected",
    [
        ({"a", "c", "f"}, "a"),
        ({"a", "b", "f"}, "a"),
        ({"x", "d", "f", "aa"}, "d"),
        ({"y", "x", "z"}, "x"),
    ],
)
def test_oldest_feature_golden(names, expected):
    gen_dict = {
        0: {"b": {0: 0, 1: 1}, "a": {0: 2, 1: 3}},
        1: {"c": {0: 4, 1: 5}, "d": {0: 6, 1: 7}},
    }
    assert oldest_feature(names, gen_dict) == expected


# connected components goldens, reference: tests/test_graph/test_graph.py:11-53
@pytest.mark.parametrize(
    "edges,expected",
    [
        ([(0, 1), (2, 3)], [{0, 1}, {2, 3}]),
        ([(0, 1), (1, 2), (2, 0)], [{0, 1, 2}]),
        (
            [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8)],
            [{0, 1, 2}, {3, 4, 5, 6, 7, 8}],
        ),
        ([(0, 0), (1, 2)], [{0}, {1, 2}]),
        ([], []),
    ],
)
def test_connected_components(edges, expected):
    got = connected_components(edges)
    assert sorted(map(sorted, got)) == sorted(map(sorted, expected))
