"""Golden tests for vertical log binning.

Ported verbatim from reference: tests/test_features/test_prune.py:17-104.
"""

import numpy as np
import pandas as pd
import pytest

from graphrole_spark.oracle.binning import (
    bin_boundaries,
    log_bin_histogram,
    vertical_log_binning,
)

CASES = {
    "empty": ([], 0.5, []),
    "single 0": ([0], 0.5, [0]),
    "single nonzero": ([1], 0.5, [0]),
    "repeated": ([1, 1], 0.5, [0, 0]),
    "2 bins": ([1, 2], 0.5, [0, 1]),
    "2 bins with repeated lower bin": ([1, 2, 1], 0.5, [0, 1, 0]),
    "2 bins with repeated upper bin": ([1, 2, 2], 0.5, [0, 1, 1]),
    "negative and zeros": ([-1, 0, 0], 0.5, [0, 1, 1]),
    "1 through 4": ([1, 2, 3, 4], 0.5, [0, 0, 1, 2]),
    "1 through 5": ([1, 2, 3, 4, 5], 0.5, [0, 0, 1, 2, 3]),
    "1 through 6": ([1, 2, 3, 4, 5, 6], 0.5, [0, 0, 0, 1, 2, 3]),
    "range(10)": (list(range(10)), 0.5, [0, 0, 0, 0, 0, 1, 1, 2, 3, 4]),
    "-range(10)": (
        [-x for x in range(10)],
        0.5,
        [0, 0, 0, 0, 0, 1, 1, 2, 3, 4][::-1],
    ),
    "non-integer": (
        [-0.1 * x for x in range(10)],
        0.5,
        [0, 0, 0, 0, 0, 1, 1, 2, 3, 4][::-1],
    ),
    "frac=0.1": (list(range(10)), 0.1, list(range(10))),
    "frac=0.25": (list(range(10)), 0.25, [0, 0, 1, 1, 2, 3, 4, 5, 6, 7]),
}


@pytest.mark.parametrize("name", list(CASES))
def test_vertical_log_binning_golden(name):
    arr, frac, expected = CASES[name]
    np.testing.assert_array_equal(
        vertical_log_binning(np.array(arr), frac=frac), expected
    )
    np.testing.assert_array_equal(
        vertical_log_binning(pd.Series(arr), frac=frac), expected
    )


def test_invalid_frac():
    for frac in (0.0, 1.0, -0.5, 2.0):
        with pytest.raises(ValueError):
            vertical_log_binning(np.array([1.0, 2.0]), frac=frac)


@pytest.mark.parametrize("name", [n for n in CASES if CASES[n][0]])
def test_boundaries_equivalent_to_binning(name):
    """value -> #{boundary < value} must reproduce the bin assignment.

    This is the property the Spark side relies on: binning becomes a
    JVM-side expression over a broadcast boundary array.
    """
    arr, frac, expected = CASES[name]
    values = np.array(arr, dtype=float)
    uniq, counts = np.unique(values, return_counts=True)
    bounds = bin_boundaries(uniq, counts, frac=frac)
    recomputed = np.array([int((bounds < v).sum()) for v in values])
    np.testing.assert_array_equal(recomputed, expected)


def test_histogram_matches_raw_path():
    rng = np.random.RandomState(7)
    values = rng.randint(0, 50, size=5000).astype(float)
    uniq, counts = np.unique(values, return_counts=True)
    by_hist = log_bin_histogram(uniq, counts)[
        np.searchsorted(uniq, values)
    ]
    np.testing.assert_array_equal(by_hist, vertical_log_binning(values))
