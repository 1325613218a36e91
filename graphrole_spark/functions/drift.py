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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["feature_drift"]

_ALPHA = 0.5  # add-α smoothing per bin, so ln() is always defined


def _binned(long: DataFrame, edges: DataFrame, bins: int) -> DataFrame:
    """(feature, value) → (feature, bin): equal-width on the reference
    [mn, mx], clamped into the edge bins, NULL → bin -1. Degenerate
    references stay drift-visible: a constant reference (mn == mx) maps
    values equal to the constant to bin 0 and everything else to the
    last bin; an all-NULL reference (mn/mx NULL) maps every non-NULL
    value to bin 0 (the reference mass sits entirely in the NULL bin,
    so any non-NULL serving mass registers)."""
    width = (F.col("mx") - F.col("mn")) / bins
    raw = F.floor((F.col("value") - F.col("mn")) / width)
    bucket = (
        F.when(F.col("value").isNull(), F.lit(-1))
        .when(width.isNull(), F.lit(0))
        .when(
            width <= 0,
            F.when(F.col("value") == F.col("mn"), F.lit(0)).otherwise(
                F.lit(max(bins - 1, 1))
            ),
        )
        .otherwise(F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw)))
    )
    return long.join(F.broadcast(edges), "feature").select(
        "feature", bucket.cast("long").alias("bin")
    )


def _quantile_binned(long: DataFrame, edges: DataFrame, bins: int) -> DataFrame:
    """(feature, value) → (feature, bin) on the reference QUANTILE grid:
    ``edges`` carries the bins−1 inner reference quantiles as ``bnd``;
    bin = number of boundaries ≤ value (boundary values go right), so
    the reference lands ~uniformly across bins regardless of outliers.
    NULL value → bin -1; all-NULL reference (bnd NULL) → bin 0; a
    super-degenerate reference (every boundary identical — ≥(bins−1)/bins
    of its mass on one value c) falls back to the width-grid rule:
    value == c → bin 0, anything else → the top bin, so total shifts
    off a near-constant reference stay visible."""
    val = F.col("value")
    cnt = F.size(F.filter(F.col("bnd"), lambda b: val >= b))
    allsame = F.size(F.array_distinct("bnd")) == 1
    bucket = (
        F.when(val.isNull(), F.lit(-1))
        .when(F.col("bnd").isNull(), F.lit(0))
        .when(
            allsame,
            F.when(val == F.element_at("bnd", 1), F.lit(0)).otherwise(
                F.lit(max(bins - 1, 1))
            ),
        )
        .otherwise(cnt)
    )
    return long.join(F.broadcast(edges), "feature").select(
        "feature", bucket.cast("long").alias("bin")
    )


def feature_drift(
    ref: DataFrame,
    cur: DataFrame,
    features: Sequence[str],
    bins: int = 10,
    grid: str = "width",
) -> DataFrame:
    """Per-feature PSI between ``ref`` and ``cur``.

    Returns ``(feature, psi, n_ref, n_cur)`` with ``psi`` rounded to 6
    decimals — one row per requested feature ALWAYS (an empty snapshot
    reports ``n_cur=0`` with a loud uniform-vs-observed PSI instead of
    silently vanishing from the output). Binning: ``bins`` buckets over
    the REFERENCE distribution (the standard convention — the serving
    side is always measured against the training grid) plus a NULL bin;
    ``grid="width"`` (default, portable to the DuckDB oracle) uses
    equal-width buckets on the reference min/max, ``grid="quantile"``
    uses the reference quantiles via ``percentile_approx`` — the
    outlier-robust production choice (one extreme reference value
    collapses a width grid into a single populated bucket, hiding any
    drift inside it; a quantile grid keeps ~1/bins of the reference in
    every bucket). The PSI sum runs over the FULL ``bins+1`` grid: under
    fixed-denominator add-α smoothing a bin empty on both sides still
    contributes ``(q−p)·ln(q/p) ≠ 0`` whenever ``n_ref ≠ n_cur``, so
    summing only observed bins would systematically understate drift
    for differently-sized windows. The grid is ``features × (bins+1)``
    rows — driver-trivial at any corpus size.
    """
    if bins < 2:
        raise ValueError(f"feature_drift needs bins >= 2, got {bins}")
    if grid not in ("width", "quantile"):
        raise ValueError(f"grid must be 'width' or 'quantile', got {grid!r}")
    feats = list(features)
    ref_long = ref.unpivot([], feats, "feature", "value")
    cur_long = cur.unpivot([], feats, "feature", "value")
    if grid == "quantile":
        qs = F.array(*[F.lit(i / bins) for i in range(1, bins)])
        edges = ref_long.groupBy("feature").agg(
            F.percentile_approx("value", qs, F.lit(10_000)).alias("bnd")
        )
        binned = _quantile_binned
    else:
        edges = ref_long.groupBy("feature").agg(
            F.min("value").alias("mn"), F.max("value").alias("mx")
        )
        binned = _binned
    rc = binned(ref_long, edges, bins).groupBy("feature", "bin").agg(
        F.count("*").alias("rc")
    )
    cc = binned(cur_long, edges, bins).groupBy("feature", "bin").agg(
        F.count("*").alias("cc")
    )
    grid = (
        ref.sparkSession.createDataFrame(
            [(f,) for f in feats], "feature string"
        )
        .select(
            "feature",
            F.explode(F.sequence(F.lit(-1), F.lit(bins - 1))).alias("bin"),
        )
        .select("feature", F.col("bin").cast("long").alias("bin"))
    )
    n_bins = bins + 1  # + the NULL bin: the FIXED smoothing denominator
    joined = (
        grid.join(rc, ["feature", "bin"], "left")
        .join(cc, ["feature", "bin"], "left")
        .select(
            "feature",
            F.coalesce("rc", F.lit(0)).alias("rc"),
            F.coalesce("cc", F.lit(0)).alias("cc"),
        )
    )
    w = Window.partitionBy("feature")
    joined = joined.select(
        "feature", "rc", "cc",
        F.sum("rc").over(w).alias("n_ref"),
        F.sum("cc").over(w).alias("n_cur"),
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
