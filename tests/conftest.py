import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from graphrole_spark.session import get_spark

    s = get_spark("graphrole_spark_tests", cores=4, shuffle_partitions=4)
    yield s


# -- shared golden fixtures (from the reference test suite; see FIXTURES.md) --

PATH4_NODES = ["a", "b", "c", "d"]
PATH4_EDGES = [("a", "b"), ("a", "c"), ("c", "d")]

SEVEN_EDGES = [(0, 1), (0, 2), (0, 3), (3, 6), (4, 5), (4, 6), (5, 6)]
SEVEN_WEIGHTS = [2, 1.5, 3, 0.25, 0.75, 2.5, 1]

# expected gen-1 features for path4, reference:
# tests/test_features/test_extract.py:109-116
PATH4_GEN1_GOLDEN = {
    "external_edges(sum)": {"a": 2.0, "b": 1.0, "c": 2.0, "d": 1.0},
    "degree(sum)": {"a": 3.0, "b": 2.0, "c": 3.0, "d": 2.0},
    "internal_edges(sum)": {"a": 3.0, "b": 2.0, "c": 3.0, "d": 2.0},
    "external_edges(mean)": {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0},
    "degree(mean)": {"a": 1.5, "b": 2.0, "c": 1.5, "d": 2.0},
    "internal_edges(mean)": {"a": 1.5, "b": 2.0, "c": 1.5, "d": 2.0},
}

# expected seed features for the 7-node graph, reference:
# tests/test_graph/test_interface.py:124-148
SEVEN_GOLDEN = {
    "degree": {0: 3, 1: 1, 2: 1, 3: 2, 4: 2, 5: 2, 6: 3},
    "internal_edges": {0: 3, 1: 1, 2: 1, 3: 2, 4: 3, 5: 3, 6: 4},
    "external_edges": {0: 1, 1: 2, 2: 2, 3: 4, 4: 1, 5: 1, 6: 1},
}

# directed+weighted seed goldens, reference:
# tests/test_graph/test_interface.py:150-186
SEVEN_DW_GOLDEN = {
    "in_degree": {0: 0.0, 1: 2.0, 2: 1.5, 3: 3.0, 4: 0.0, 5: 0.75, 6: 3.75},
    "out_degree": {0: 6.5, 1: 0.0, 2: 0.0, 3: 0.25, 4: 3.25, 5: 1.0, 6: 0.0},
    "total_degree": {0: 6.5, 1: 2.0, 2: 1.5, 3: 3.25, 4: 3.25, 5: 1.75, 6: 3.75},
    "internal_edges": {0: 6.5, 1: 0.0, 2: 0.0, 3: 0.25, 4: 4.25, 5: 1.0, 6: 0.0},
    "external_edges": {0: 0.25, 1: 0.0, 2: 0.0, 3: 0.0, 4: 0.0, 5: 0.0, 6: 0.0},
}
