"""Range / interval join without a nested-loop plan.

Spark turns a pure range predicate (no equi key) into a broadcast
nested loop. This operator makes the range key an equi key: each right
interval is exploded into the fixed-width buckets it covers, each left
point is tagged with its bucket, and the join becomes a hash equi-join
on (bucket, *extra_keys) followed by the exact range filter. Cost is
|right| × (interval_width / bucket_width) expansion instead of
|left| × |right|; pick ``bucket_width`` near the typical interval
width.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _epoch(col):
    return F.col(col).cast("timestamp").cast("double")


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int,
    keys: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (and equal ``keys``), via bucket equi-join.

    Returns all point columns + all interval columns.
    """
    keys = list(keys)
    p = points.withColumn(
        "__bucket", F.floor(_epoch(point_ts) / bucket_seconds).cast("long")
    )
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(_epoch(start_ts) / bucket_seconds).cast("long"),
                # end is exclusive, but a point in the end bucket can still
                # precede it — include the bucket containing end
                F.floor(_epoch(end_ts) / bucket_seconds).cast("long"),
            )
        ),
    )
    joined = p.join(i, ["__bucket"] + keys, how).where(
        (_epoch(point_ts) >= _epoch(start_ts)) & (_epoch(point_ts) < _epoch(end_ts))
    )
    return joined.drop("__bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
    keys: Sequence[str] = (),
    min_overlap_seconds: float = 0.0,
) -> DataFrame:
    """Join two INTERVAL tables on temporal overlap — "which incidents
    overlapped which deploy windows", "which sessions ran during which
    experiments" — the two-sided generalization of
    :func:`bucketed_range_join` (which joins points to intervals).

    Overlap semantics: half-open ``[start, end)`` intervals;
    ``overlap_seconds = max(0, min(ends) − max(starts))`` and rows pair
    iff ``overlap_seconds > min_overlap_seconds`` (strict: touching
    intervals with zero overlap never match; raise the threshold to
    ignore trivial grazes). NULL or inverted (end ≤ start) intervals
    on either side never match.

    Plan (100 TB lens): BOTH sides explode into the fixed-width
    buckets they cover and the join is a hash equi-join on
    (bucket, *keys) + the exact overlap predicate — never Spark's
    nested-loop fallback for pure range predicates. A pair overlapping
    several buckets would duplicate, so each pair is kept only in the
    FIRST bucket both cover (``greatest(start buckets)`` == the join
    bucket — an arithmetic dedup, no distinct shuffle). Expansion cost
    is interval_width / bucket_width per row; pick ``bucket_seconds``
    near the typical interval length, and cap pathological open-ended
    intervals upstream.

    Returns all left columns + all right columns + ``overlap_seconds``
    (rounded to 6).
    """
    if bucket_seconds < 1:
        raise ValueError("bucket_seconds must be >= 1")
    if min_overlap_seconds < 0:
        raise ValueError("min_overlap_seconds must be >= 0")
    keys = list(keys)

    def prep(df, start, end, side):
        s, e = _epoch(start), _epoch(end)
        b0 = F.floor(s / bucket_seconds).cast("long")
        # end is exclusive: an interval ending exactly on a bucket
        # boundary does not cover that bucket. Trim with integer
        # microsecond arithmetic — a double epsilon is below one ulp at
        # epoch magnitudes (~2.4e-7 s at 1.7e9), so `e - 1e-9` would be
        # a no-op and every interval would explode one extra bucket.
        b1 = F.floor(
            (F.unix_micros(F.col(end).cast("timestamp")) - F.lit(1))
            / F.lit(int(bucket_seconds) * 1_000_000)
        ).cast("long")
        return (
            df.where(s.isNotNull() & e.isNotNull() & (e > s))
            .withColumn(f"__s_{side}", s)
            .withColumn(f"__e_{side}", e)
            .withColumn(f"__b0_{side}", b0)
            .withColumn(
                "__bucket",
                F.explode(F.sequence(b0, b1)),
            )
        )

    l = prep(left, left_start, left_end, "l")
    r = prep(right, right_start, right_end, "r")
    ov = F.least(F.col("__e_l"), F.col("__e_r")) - F.greatest(
        F.col("__s_l"), F.col("__s_r")
    )
    first_shared = F.greatest(F.col("__b0_l"), F.col("__b0_r"))
    joined = (
        l.join(r, ["__bucket"] + keys)
        # keep each pair once: only in the first bucket both cover
        .where(F.col("__bucket") == first_shared)
        .withColumn("overlap_seconds", F.round(ov, 6))
        .where(F.col("overlap_seconds") > min_overlap_seconds)
    )
    drop = ["__bucket", "__s_l", "__e_l", "__b0_l", "__s_r", "__e_r",
            "__b0_r"]
    return joined.drop(*drop)
