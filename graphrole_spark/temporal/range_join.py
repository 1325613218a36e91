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
