"""Lloyd-Max quantization via exact 1-D weighted k-means.

The reference quantizes factor matrices by flattening to 1-D and running
sklearn ``KMeans(n_clusters=n_bins, random_state=1)``
(reference: graphrole/roles/factor.py:29-49). For one-dimensional data
the k-means optimum is computable *exactly* with dynamic programming
over the sorted unique values (clusters are contiguous intervals) — so
instead of imitating sklearn's seeded heuristic we use the deterministic
optimal quantizer. This is deterministic across runs and machines, at
least as good (in SSE) as the reference's, and — crucially for the
distributed engine — operates on a (value, count) histogram, so the
executors only ship ``groupBy(value).count()`` and the DP runs on the
driver.

Matches the reference's contract: output has at most ``n_bins`` distinct
values, each input replaced by its bin centroid, and a ``ValueError`` is
raised when ``n_bins`` exceeds the number of samples (the MDL grid
search relies on that signal, reference: roles/extract.py:124-129).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def kmeans_1d_histogram(
    uniq: np.ndarray, counts: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Optimal weighted 1-D k-means on a histogram.

    :param uniq: sorted unique values
    :param counts: weight (occurrence count) per unique value
    :param k: number of clusters
    :returns: (centroid per unique value, cluster id per unique value)
    """
    n = len(uniq)
    if n == 0:
        return np.zeros(0), np.zeros(0, dtype=np.int64)
    if k >= n:
        return uniq.astype(np.float64).copy(), np.arange(n, dtype=np.int64)

    w = counts.astype(np.float64)
    x = uniq.astype(np.float64)
    cw = np.concatenate([[0.0], np.cumsum(w)])
    cwx = np.concatenate([[0.0], np.cumsum(w * x)])
    cwx2 = np.concatenate([[0.0], np.cumsum(w * x * x)])

    def seg_cost(i: np.ndarray, j: int) -> np.ndarray:
        # weighted SSE of uniq[i..j] about its weighted mean, vectorized in i
        tw = cw[j + 1] - cw[i]
        ts = cwx[j + 1] - cwx[i]
        tq = cwx2[j + 1] - cwx2[i]
        with np.errstate(divide="ignore", invalid="ignore"):
            c = tq - np.where(tw > 0, ts * ts / tw, 0.0)
        return np.maximum(c, 0.0)

    INF = np.inf
    # dp[m][j] = min cost of clustering uniq[0..j] into m+1 clusters
    dp = np.full((k, n), INF)
    back = np.zeros((k, n), dtype=np.int64)
    idx = np.arange(n)
    dp[0, :] = seg_cost(np.zeros(n, dtype=np.int64), n - 1)  # placeholder
    for j in range(n):
        dp[0, j] = seg_cost(np.array([0]), j)[0]
    for m in range(1, k):
        for j in range(m, n):
            starts = idx[m : j + 1]
            cand = dp[m - 1, starts - 1] + seg_cost(starts, j)
            best = int(np.argmin(cand))
            dp[m, j] = cand[best]
            back[m, j] = starts[best]

    # recover cluster boundaries
    labels = np.zeros(n, dtype=np.int64)
    j = n - 1
    for m in range(k - 1, 0, -1):
        i = back[m, j]
        labels[i : j + 1] = m
        j = i - 1
    labels[: j + 1] = 0

    centroids = np.zeros(n)
    for m in range(k):
        sel = labels == m
        if sel.any():
            centroids[sel] = np.average(x[sel], weights=w[sel])
    return centroids, labels


def encode(X: np.ndarray, n_bins: int) -> np.ndarray:
    """Quantize matrix X to at most ``n_bins`` distinct centroid values.

    Raises ``ValueError`` when n_bins exceeds the number of samples,
    mirroring sklearn KMeans (the reference MDL loop catches this to
    skip infeasible grid cells).
    """
    X = np.asarray(X, dtype=np.float64)
    if n_bins > X.size:
        raise ValueError(
            f"n_bins={n_bins} exceeds number of samples {X.size}"
        )
    flat = X.ravel()
    uniq, inverse, counts = np.unique(flat, return_inverse=True, return_counts=True)
    centroids, _ = kmeans_1d_histogram(uniq, counts, n_bins)
    return centroids[inverse].reshape(X.shape)
