"""Cohort retention analysis — "of the users first seen in period P,
what fraction were still active k periods later" — the classic
retention triangle (Amplitude/Mixpanel cohorts), engine-native.

Companion to :mod:`graphrole_spark.temporal.funnel`: funnels measure
ordered progression inside a journey, cohorts measure return behavior
across calendar periods. Both are first-gate analytics over the same
event stream an agent-transcript pipeline already has.

Plan (100 TB lens): one (key → first-period) aggregate, one distinct
(key, period) activity frame (both map-side combined), one
co-partitioned join on the key, one (cohort, offset) count — every
shuffle is on a hash-balanced key, the output is
``n_cohorts × max_offset`` rows. Cohort sizes come from offset 0 of
the same aggregate (first-period activity is activity), so no second
pass over the events.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PERIODS = {"day": 86400, "week": 604800}


def cohort_retention(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    period: str = "week",
    max_offset: int | None = None,
) -> DataFrame:
    """Retention triangle over ``events``.

    Each key's cohort is the ``period`` bucket (UTC epoch-aligned
    ``day`` or ``week`` — fixed-width buckets, engine-portable) of its
    FIRST event; a key is *retained* at offset ``k`` if it has any
    event in cohort-bucket + k. ``max_offset`` truncates the triangle
    (None = full observed span).

    Returns ``(cohort_ts timestamp, offset int, n_active long,
    cohort_size long, retention double)`` — one row per
    (cohort, offset) where any key was active; ``offset = 0`` rows
    carry ``retention = 1.0`` by construction.
    """
    if period not in _PERIODS:
        raise ValueError(f"period must be one of {sorted(_PERIODS)}")
    if max_offset is not None and max_offset < 0:
        raise ValueError("max_offset must be >= 0")
    p = _PERIODS[period]

    ts_num = F.col(ts_col).cast("timestamp").cast("double")
    bucket = (F.floor(ts_num / p) * p).cast("long")
    # distinct per-key activity buckets; the same aggregate's min IS
    # the cohort assignment, computed per key via a window so the
    # activity frame is scanned once
    activity = (
        events.select(*key_cols, bucket.alias("__b"))
        .groupBy(*key_cols, "__b")
        .agg(F.lit(1).alias("__one"))
    )
    w = Window.partitionBy(*key_cols)
    with_cohort = activity.select(
        *key_cols,
        "__b",
        F.min("__b").over(w).alias("__cohort"),
    )
    offs = with_cohort.select(
        F.col("__cohort"),
        ((F.col("__b") - F.col("__cohort")) / p).cast("int").alias("offset"),
    )
    if max_offset is not None:
        offs = offs.where(F.col("offset") <= max_offset)
    counts = offs.groupBy("__cohort", "offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )
    wsize = Window.partitionBy("__cohort")
    # cohort_size = the offset-0 count (first-period activity is
    # activity, so it always exists)
    sized = counts.withColumn(
        "cohort_size",
        F.max(F.when(F.col("offset") == 0, F.col("n_active"))).over(wsize),
    )
    return sized.select(
        F.col("__cohort").cast("timestamp").alias("cohort_ts"),
        "offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
            "retention"
        ),
    )
