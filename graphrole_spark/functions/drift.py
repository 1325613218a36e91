"""Feature-distribution drift between two snapshots (PSI).

The feature-store monitoring primitive: given a reference snapshot (the
training window) and a current snapshot (the serving window) of the same
feature frame, compute the Population Stability Index per feature —
``PSI = Σ_bins (q_b − p_b)·ln(q_b/p_b)`` over a fixed binning derived
from the reference. PSI ≈ 0 means the serving distribution still looks
like training; the usual alerting rule of thumb is 0.1 (drifting) /
0.25 (drifted).

Everything is ratio-of-counts over a FIXED per-feature equal-width
binning (edges from the reference min/max, out-of-range current values
clamp to the edge bins, NULLs get their own bin), with add-α smoothing
so empty bins are defined — deterministic, engine-portable, and
expressible as three aggregations: per-feature edges (tiny, broadcast),
per-(feature, bin, side) counts, per-feature PSI. Nothing but
(feature, long) rows ever shuffles, so the operator scales with a
corpus scan regardless of how many snapshots it monitors.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["feature_drift"]

_ALPHA = 0.5  # add-α smoothing per bin, so ln() is always defined


def _binned(long: DataFrame, edges: DataFrame, bins: int) -> DataFrame:
    """(feature, value) → (feature, bin): equal-width on the reference
    [mn, mx], clamped into the edge bins, NULL → bin -1, degenerate
    (mn == mx) reference → everything in bin 0."""
    width = (F.col("mx") - F.col("mn")) / bins
    raw = F.floor((F.col("value") - F.col("mn")) / width)
    # width.isNull() covers an all-NULL reference feature (mn/mx NULL):
    # without it those rows would land in a NULL bin, which a full-outer
    # join never co-groups — degenerate refs collapse to bin 0 instead
    bucket = (
        F.when(F.col("value").isNull(), F.lit(-1))
        .when(width.isNull() | (width <= 0), F.lit(0))
        .otherwise(F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw)))
    )
    return long.join(F.broadcast(edges), "feature").select(
        "feature", bucket.cast("long").alias("bin")
    )


def feature_drift(
    ref: DataFrame,
    cur: DataFrame,
    features: Sequence[str],
    bins: int = 10,
) -> DataFrame:
    """Per-feature PSI between ``ref`` and ``cur``.

    Returns ``(feature, psi, n_ref, n_cur)`` with ``psi`` rounded to 6
    decimals. Binning: ``bins`` equal-width buckets over the REFERENCE
    min/max (the standard convention — the serving side is always
    measured against the training grid) plus a NULL bin; bins empty on
    both sides contribute exactly 0 under fixed-denominator add-α
    smoothing, so only observed bins are materialized.
    """
    feats = list(features)
    ref_long = ref.unpivot([], feats, "feature", "value")
    cur_long = cur.unpivot([], feats, "feature", "value")
    edges = ref_long.groupBy("feature").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    rc = _binned(ref_long, edges, bins).groupBy("feature", "bin").agg(
        F.count("*").alias("rc")
    )
    cc = _binned(cur_long, edges, bins).groupBy("feature", "bin").agg(
        F.count("*").alias("cc")
    )
    totals = (
        rc.groupBy("feature")
        .agg(F.sum("rc").alias("n_ref"))
        .join(cc.groupBy("feature").agg(F.sum("cc").alias("n_cur")), "feature")
    )
    n_bins = bins + 1  # + the NULL bin: the FIXED smoothing denominator
    joined = (
        rc.join(cc, ["feature", "bin"], "full_outer")
        .select(
            "feature",
            F.coalesce("rc", F.lit(0)).alias("rc"),
            F.coalesce("cc", F.lit(0)).alias("cc"),
        )
        .join(F.broadcast(totals), "feature")
    )
    p = (F.col("rc") + _ALPHA) / (F.col("n_ref") + _ALPHA * n_bins)
    q = (F.col("cc") + _ALPHA) / (F.col("n_cur") + _ALPHA * n_bins)
    term = (q - p) * F.log(q / p)
    return (
        joined.groupBy("feature")
        .agg(
            F.round(F.sum(term), 6).alias("psi"),
            F.first("n_ref").alias("n_ref"),
            F.first("n_cur").alias("n_cur"),
        )
        .select("feature", "psi", "n_ref", "n_cur")
    )
