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
