"""Property-based tests (hypothesis) for the deterministic driver math."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from graphrole_spark.oracle.binning import bin_boundaries, vertical_log_binning
from graphrole_spark.oracle.quantize import encode


@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=200),
    st.sampled_from([0.1, 0.25, 0.5, 0.75]),
)
@settings(max_examples=200, deadline=None)
def test_binning_invariants(values, frac):
    arr = np.array(values, dtype=float)
    bins = vertical_log_binning(arr, frac=frac)
    # bins are non-negative, at most one per row
    assert bins.min() >= 0
    assert bins.max() < len(arr)
    # monotone: larger value → same or larger bin
    order = np.argsort(arr, kind="stable")
    assert (np.diff(bins[order]) >= 0).all()
    # ties share a bin
    for v in np.unique(arr):
        assert len(np.unique(bins[arr == v])) == 1
    # boundary form reproduces the assignment exactly
    uniq, counts = np.unique(arr, return_counts=True)
    bounds = bin_boundaries(uniq, counts, frac=frac)
    recomputed = np.array([int((bounds < v).sum()) for v in arr])
    np.testing.assert_array_equal(recomputed, bins)


@given(
    st.lists(
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
        min_size=4,
        max_size=64,
    ),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=100, deadline=None)
def test_quantizer_invariants(values, bits):
    X = np.array(values, dtype=float).reshape(-1, 1)
    n_bins = 2**bits
    if n_bins > X.size:
        return
    enc = encode(X, n_bins)
    assert enc.shape == X.shape
    assert len(np.unique(enc)) <= n_bins
    # quantization never increases the range
    assert enc.min() >= X.min() - 1e-9 and enc.max() <= X.max() + 1e-9
    # idempotent on already-quantized data with enough bins
    k = len(np.unique(enc))
    if k <= n_bins:
        again = encode(enc, n_bins)
        np.testing.assert_allclose(np.sort(np.unique(again)), np.sort(np.unique(enc)))
