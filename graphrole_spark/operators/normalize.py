"""Feature-matrix normalization — the post-processing step between the
ReFeX feature frame and anything that consumes it (NMF role discovery,
classifier training, similarity kernels).

The reference leaves features raw (GraphRole feeds unscaled counts into
NMF); real pipelines standardize first. Three policies over a wide
feature frame, all exact and two-pass:

pass 1 — one ``agg`` over the input computing every per-column statistic
         map-side-combined (a few doubles per column reach the driver);
pass 2 — one ``select`` applying the broadcast statistics, whole-stage
         codegen, no shuffle.

At 10^12 rows the cost is a single scan plus a scan-shaped projection —
no window functions, no per-column jobs, no Python.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_features(
    df: DataFrame,
    cols: Sequence[str],
    method: str = "zscore",
    lower: float = 0.25,
    upper: float = 0.75,
    clip: Optional[float] = None,
    output_suffix: str = "",
) -> DataFrame:
    """Scale ``cols`` in place (or to ``<col><output_suffix>``).

    * ``zscore``  — ``(x − mean) / stddev_pop``; zero-variance columns
      map to 0 (the reference's degenerate-feature convention: constant
      columns carry no signal and must not emit NaN/inf).
    * ``minmax``  — ``(x − min) / (max − min)`` into [0, 1]; constant
      columns map to 0.
    * ``robust``  — ``(x − median) / IQR`` with the quantile pair
      ``(lower, upper)`` (exact percentiles; swap in
      ``percentile_approx`` upstream if the fit must stream);
      zero-IQR columns map to 0.

    ``clip`` (zscore/robust): winsorize the scaled value to
    ``[−clip, +clip]`` — the standard guard against heavy-tail features
    saturating a downstream gradient. Nulls pass through as nulls (the
    ReFeX frames are already 0-filled; generic inputs keep their
    missingness semantics).
    """
    if method not in ("zscore", "minmax", "robust"):
        raise ValueError("method must be 'zscore', 'minmax' or 'robust'")
    cols = list(cols)

    aggs: list[Column] = []
    for c in cols:
        if method == "zscore":
            aggs += [
                F.avg(c).alias(f"__m_{c}"),
                F.stddev_pop(c).alias(f"__s_{c}"),
            ]
        elif method == "minmax":
            aggs += [F.min(c).alias(f"__m_{c}"), F.max(c).alias(f"__s_{c}")]
        else:
            aggs += [
                F.percentile(c, F.lit(0.5)).alias(f"__m_{c}"),
                (
                    F.percentile(c, F.lit(float(upper)))
                    - F.percentile(c, F.lit(float(lower)))
                ).alias(f"__s_{c}"),
            ]
    stats = df.agg(*aggs).collect()[0].asDict()

    out_cols: list[Column] = []
    for c in df.columns:
        # with a suffix the scaled column is ADDITIVE (original kept),
        # so normalize calls chain: value -> value_z -> value_mm ...
        if c not in cols or output_suffix:
            out_cols.append(F.col(c))
    for c in cols:
        center = float(stats[f"__m_{c}"] or 0.0)
        if method == "minmax":
            span = float(stats[f"__s_{c}"] or 0.0) - center
        else:
            span = float(stats[f"__s_{c}"] or 0.0)
        if span > 0.0:
            scaled = (F.col(c).cast("double") - F.lit(center)) / F.lit(span)
        else:
            scaled = F.when(F.col(c).isNotNull(), F.lit(0.0))
        if clip is not None and method != "minmax":
            k = float(clip)
            scaled = F.greatest(F.least(scaled, F.lit(k)), F.lit(-k))
        out_cols.append(scaled.alias(f"{c}{output_suffix}"))
    return df.select(*out_cols)


# Acklam's rational approximation to the inverse normal CDF (peter
# acklam 2003, |rel err| < 1.15e-9) — pure arithmetic, so the
# rank-gauss transform stays inside whole-stage codegen instead of
# calling out to a Python UDF. Coefficients are the published ones.
_ACKLAM_A = (-3.969683028665376e+01, 2.209460984245205e+02,
             -2.759285104469687e+02, 1.383577518672690e+02,
             -3.066479806614716e+01, 2.506628277459239e+00)
_ACKLAM_B = (-5.447609879822406e+01, 1.615858368580409e+02,
             -1.556989798598866e+02, 6.680131188771972e+01,
             -1.328068155288572e+01)
_ACKLAM_C = (-7.784894002430293e-03, -3.223964580411365e-01,
             -2.400758277161838e+00, -2.549732539343734e+00,
             4.374664141464968e+00, 2.938163982698783e+00)
_ACKLAM_D = (7.784695709041462e-03, 3.224671290700398e-01,
             2.445134137142996e+00, 3.754408661907416e+00)
_ACKLAM_PLOW = 0.02425


def _poly(coeffs, x: Column) -> Column:
    acc: Column = F.lit(float(coeffs[0]))
    for k in coeffs[1:]:
        acc = acc * x + F.lit(float(k))
    return acc


def inv_normal_cdf(p: Column) -> Column:
    """Φ⁻¹(p) as a codegen expression (Acklam). Caller guarantees
    p ∈ (0, 1); the rank transform clamps to [1/(2n), 1 − 1/(2n)]."""
    a, b, c, d = _ACKLAM_A, _ACKLAM_B, _ACKLAM_C, _ACKLAM_D
    q_low = F.sqrt(-2.0 * F.log(p))
    x_low = _poly(c, q_low) / (_poly(d, q_low) * q_low + F.lit(1.0))
    q_high = F.sqrt(-2.0 * F.log(1.0 - p))
    x_high = -(_poly(c, q_high) / (_poly(d, q_high) * q_high + F.lit(1.0)))
    qc = p - 0.5
    r = qc * qc
    x_mid = (_poly(a, r) * qc) / (_poly(b, r) * r + F.lit(1.0))
    return (
        F.when(p < _ACKLAM_PLOW, x_low)
        .when(p > 1.0 - _ACKLAM_PLOW, x_high)
        .otherwise(x_mid)
    )


def rank_normalize(
    df: DataFrame,
    cols: Sequence[str],
    bins: int = 256,
    method: str = "cdf",
    output_suffix: str = "_rank",
) -> DataFrame:
    """Rank / rank-gauss feature transform: map each value to its
    (approximate) empirical CDF position, optionally through Φ⁻¹ —
    the "RankGauss" normalization that makes any heavy-tailed feature
    distribution uniform (``method="cdf"``) or standard-normal
    (``method="gauss"``) regardless of shape, where zscore/robust only
    recenter it.

    Fit: ONE aggregate computing a ``bins``-point equiprobable
    quantile grid per column (``percentile_approx``, mergeable sketch
    — map-side combined, ``bins`` doubles per column to the driver).
    Transform: pure projection — the bucket index is a short
    higher-order ``filter`` over the broadcast cutpoint array
    (interpreted, O(bins) per value: budget it like the simhash fold,
    PERF rule 15 — keep ``bins`` ≤ a few hundred) followed by linear
    interpolation inside the bucket, all other arithmetic codegen. No
    joins, no windows, no shuffle — the same two-pass shape as
    :func:`normalize_features`, so it runs at full scan speed on any
    row count.

    CDF positions are clamped to ``[1/(2·bins), 1 − 1/(2·bins)]``
    before Φ⁻¹ so tails stay finite. NULLs pass through. Constant
    columns (degenerate grid) map to 0.5 (cdf) / 0.0 (gauss).
    """
    if method not in ("cdf", "gauss"):
        raise ValueError("method must be 'cdf' or 'gauss'")
    if bins < 2:
        raise ValueError("bins must be >= 2")
    cols = list(cols)
    probs = [i / bins for i in range(bins + 1)]
    fit = df.agg(
        *[
            F.percentile_approx(
                F.col(c).cast("double"), F.lit(probs), F.lit(10000)
            ).alias(f"__q_{c}")
            for c in cols
        ]
    ).collect()[0]

    eps = 1.0 / (2.0 * bins)
    out_cols = [F.col(c) for c in df.columns]
    for c in cols:
        cuts = [float(x) for x in (fit[f"__q_{c}"] or [])]
        v = F.col(c).cast("double")
        if not cuts or cuts[0] == cuts[-1]:
            cdf = F.when(v.isNotNull(), F.lit(0.5))
        else:
            arr = F.lit(cuts)
            # strictly-below count = bucket index (values at a cutpoint
            # land at the bucket's left edge; duplicates in the grid —
            # heavy ties — collapse to the same index, giving the tied
            # value one consistent rank)
            idx = F.size(F.filter(arr, lambda e: e < v))
            lo = F.element_at(arr, F.greatest(idx, F.lit(1)))
            hi = F.element_at(
                arr, F.least(idx + 1, F.lit(len(cuts)))
            )
            frac = F.when(hi > lo, (v - lo) / (hi - lo)).otherwise(
                F.lit(0.0)
            )
            cdf = (idx - 1 + frac) / F.lit(float(bins))
            cdf = F.greatest(
                F.least(cdf, F.lit(1.0 - eps)), F.lit(eps)
            )
        if method == "gauss":
            expr = F.when(v.isNotNull(), inv_normal_cdf(cdf))
        else:
            expr = F.when(v.isNotNull(), cdf)
        out_cols.append(F.round(expr, 9).alias(f"{c}{output_suffix}"))
    return df.select(*out_cols)
