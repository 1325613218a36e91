"""Seasonal baselines: per-key hour-of-day / day-of-week /
hour-of-week profiles and residual anomaly scoring — the
calendar-aware complement to ``rolling_anomalies`` (a Monday-9am
traffic spike is NORMAL for Monday 9am; the trailing window can't
know that, the seasonal profile can).

Fit/score split (the ``normalize_features`` discipline): the profile
is a tiny (keys × slots) frame fitted in one map-side-combined
aggregate; scoring is a broadcast-or-shuffle equi-join plus codegen
arithmetic — so a profile fitted on last month scores today's stream
with zero leakage (the caller controls which data fits; in-sample
scoring is valid for exploratory use and pytest-pinned).

Slots are UTC-epoch-derived (portable: DuckDB oracles reproduce them
exactly; epoch day 0 = Thursday 1970-01-01, so day-of-week slot 0 =
Thursday — a stable, documented convention rather than a localized
calendar call).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PERIODS = {
    "hour_of_day": (3600, 24),
    "day_of_week": (86400, 7),
    "hour_of_week": (3600, 168),
}


def _slot(ts_col: str, period: str):
    sec, mod = _PERIODS[period]
    num = F.col(ts_col).cast("timestamp").cast("double")
    return F.pmod(F.floor(num / sec), F.lit(mod)).cast("int")


def seasonal_profile(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    period: str = "hour_of_week",
) -> DataFrame:
    """Fit the per-(key, slot) baseline: ``key_cols + (slot, n, mean,
    std)`` (sample std, NULL for n=1 slots). One aggregate; output is
    keys × ≤168 rows."""
    if period not in _PERIODS:
        raise ValueError(f"period must be one of {sorted(_PERIODS)}")
    v = F.col(value_col).cast("double")
    return (
        df.where(v.isNotNull())
        .groupBy(*key_cols, _slot(ts_col, period).alias("slot"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg(v), 9).alias("mean"),
            F.round(F.stddev_samp(v), 9).alias("std"),
        )
    )


def seasonal_anomalies(
    df: DataFrame,
    profile: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    period: str = "hour_of_week",
    z_thresh: float = 3.0,
    min_slot_n: int = 5,
) -> DataFrame:
    """Score rows against a fitted :func:`seasonal_profile`: attach
    ``expected`` (the slot mean), ``resid_z`` (residual z-score) and
    ``is_anomaly``. Rows whose slot has fewer than ``min_slot_n``
    observations, no profile row at all, or zero/NULL std score
    ``resid_z = NULL`` / ``is_anomaly = 0`` (an unseen slot is
    unknown, not anomalous). One equi-join on (keys, slot) — the
    profile side is keys × ≤168 rows, broadcastable for any sane key
    cardinality."""
    if period not in _PERIODS:
        raise ValueError(f"period must be one of {sorted(_PERIODS)}")
    if z_thresh <= 0:
        raise ValueError("z_thresh must be positive")
    if min_slot_n < 1:
        raise ValueError("min_slot_n must be >= 1")
    g = list(key_cols)
    v = F.col(value_col).cast("double")
    prof = profile.select(
        *g,
        "slot",
        F.col("n").alias("__pn"),
        F.col("mean").alias("expected"),
        F.col("std").alias("__ps"),
    )
    joined = df.withColumn("slot", _slot(ts_col, period)).join(
        prof, g + ["slot"], "left"
    )
    z = F.when(
        (F.col("__pn") >= min_slot_n)
        & F.col("__ps").isNotNull()
        & (F.col("__ps") > 0),
        F.round((v - F.col("expected")) / F.col("__ps"), 9),
    )
    return (
        joined.withColumn("resid_z", z)
        .withColumn(
            "is_anomaly",
            (F.abs(F.col("resid_z")) > F.lit(float(z_thresh))).cast("int"),
        )
        .fillna({"is_anomaly": 0})
        .drop("__pn", "__ps")
    )
