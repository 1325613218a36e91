"""Vertical logarithmic binning.

Semantics match the reference's ``vertical_log_binning``
(reference: graphrole/features/prune.py:13-56): repeatedly place the
smallest ``frac`` of the still-unbinned values into the next bin, always
at least one value per bin, and never splitting ties — a bin boundary
always falls on a unique value.

The core routine here operates on a *histogram* ``(unique values,
counts)`` rather than the raw array. That is deliberate: at cluster
scale the raw column never leaves the executors — the engine computes a
``groupBy(value).count()`` histogram (distinct values ≪ rows for ReFeX
features, which are sums/means of small integers) and runs this exact
loop on the driver, then broadcasts the resulting bin boundaries.
"""

from __future__ import annotations

import numpy as np


def log_bin_histogram(
    uniq: np.ndarray, counts: np.ndarray, frac: float = 0.5
) -> np.ndarray:
    """Assign a bin id to each unique value of a histogram.

    :param uniq: sorted unique values (ascending)
    :param counts: occurrence count per unique value (same length)
    :param frac: fraction of remaining rows per bin, in (0, 1)
    :returns: int64 array, bin id per unique value (non-decreasing)
    """
    if not 0 < frac < 1:
        raise ValueError("must specify frac in interval (0, 1)")

    n_uniq = len(uniq)
    bins_for_uniq = np.zeros(n_uniq, dtype=np.int64)
    if n_uniq == 0:
        return bins_for_uniq

    cum = np.cumsum(counts)
    total = int(cum[-1])

    placed = 0       # rows already assigned to a bin
    lo = 0           # first unique-value index not yet binned
    bin_id = 0
    while placed < total:
        # target size of this bin: frac of what remains, at least one row
        want = max(int(frac * (total - placed)), 1)
        # the bin's upper boundary is the smallest unique value whose
        # cumulative count reaches the target — ties never straddle bins
        hi = int(np.searchsorted(cum, placed + want, side="left"))
        bins_for_uniq[lo : hi + 1] = bin_id
        placed = int(cum[hi])
        lo = hi + 1
        bin_id += 1
    return bins_for_uniq


def vertical_log_binning(arr, frac: float = 0.5) -> np.ndarray:
    """Bin a raw value array (oracle-facing wrapper over the histogram core).

    Matches the reference goldens in
    reference: tests/test_features/test_prune.py:17-104, e.g.
    ``range(10) -> [0,0,0,0,0,1,1,2,3,4]``.
    """
    values = np.asarray(arr)
    if values.size == 0:
        return np.zeros(0, dtype=np.int64)
    uniq, inverse, counts = np.unique(values, return_inverse=True, return_counts=True)
    bins_for_uniq = log_bin_histogram(uniq, counts, frac=frac)
    return bins_for_uniq[inverse]


def bin_boundaries(uniq: np.ndarray, counts: np.ndarray, frac: float = 0.5) -> np.ndarray:
    """Return the ascending list of *upper* boundaries (inclusive) per bin.

    A value ``v`` maps to ``bin = #{b in boundaries : b < v}`` — the form
    the Spark side evaluates JVM-side with a higher-order ``filter`` over
    a literal array (no Python in the hot path).
    """
    bins_for_uniq = log_bin_histogram(uniq, counts, frac=frac)
    if len(bins_for_uniq) == 0:
        return np.zeros(0, dtype=float)
    # last unique value of each bin is its inclusive upper boundary
    is_last = np.ones(len(bins_for_uniq), dtype=bool)
    is_last[:-1] = bins_for_uniq[:-1] != bins_for_uniq[1:]
    return np.asarray(uniq)[is_last]
