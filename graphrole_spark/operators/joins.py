"""Skew-aware join utilities: key-frequency audits and an explicit
hot-key salted equi-join — the generic form of the egonet hub guard
(`operators/seeds.py::_member_join`), exposed as a public operator per
the north rule's "partitioning / shuffle / skew handled explicitly".

When to reach for this instead of AQE: adaptive skew-join splitting
(`spark.sql.adaptive.skewJoin`) re-chunks oversized SHUFFLE PARTITIONS
at runtime and covers most sort-merge cases for free, but it (a) does
nothing for the broadcast-hash plans Catalyst picks first, (b) cannot
help downstream ops that inherit the join's key clustering, and (c)
reacts after a straggler materializes rather than planning for a key
you know is pathological (the power-law hub, the NULL-ish sentinel
key, the one mega-conversation). Salting is the planned-for version:
hot keys are spread over ``salt`` synthetic sub-keys before the
shuffle; cold keys pay nothing.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_stats(df: DataFrame, cols: Sequence[str], k: int = 20) -> DataFrame:
    """Top-``k`` heaviest key values of ``cols`` with absolute count
    and share of all rows — the audit that decides whether a join/agg
    key needs salting (run it BEFORE burning a cluster-day on a
    straggler). One map-side-combined aggregate; the total is a 1-row
    broadcast; TakeOrderedAndProject bounds driver traffic to ``k``
    rows per partition."""
    if k < 1:
        raise ValueError("k must be >= 1")
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
        )
        .orderBy(F.desc("n_rows"), *[F.asc(c) for c in cols])
        .limit(k)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
    hot_threshold: Optional[int] = None,
    hot_keys: Optional[Sequence] = None,
) -> DataFrame:
    """Equi-join ``left ⋈ right`` on ``on`` with hot keys spread over
    ``salt`` sub-keys. Result rows are identical to the plain join
    (parity-tested); only the physical distribution changes.

    * ``hot_keys`` — explicit key values known to be pathological
      (skips the detection pass), or
    * ``hot_threshold`` — keys whose LEFT row count exceeds it are hot
      (one extra aggregate over ``left``'s key column; the hot list is
      a tiny broadcast).
      Exactly one of the two must be given.
    * Hot LEFT rows get a deterministic content-hash salt in
      ``[0, salt)``; hot RIGHT rows are replicated ``salt`` ways —
      so put the side with per-key row explosion on the LEFT and the
      dimension-ish side on the RIGHT (replication cost =
      ``salt × right-rows-under-hot-keys``).
    * ``how`` ∈ {"inner", "left"} (an unmatched hot left row still
      appears exactly once: its salt value is a constant per row).

    NULL join keys never match in an equi-join; they pass through
    unchanged under ``how="left"`` exactly as the plain join does.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    if salt < 2:
        raise ValueError("salt must be >= 2")
    if (hot_threshold is None) == (hot_keys is None):
        raise ValueError("give exactly one of hot_threshold / hot_keys")

    if hot_keys is not None:
        hot = left.sparkSession.createDataFrame(
            [(v,) for v in hot_keys], [on]
        ).select(F.col(on).alias("__hot"))
    else:
        if hot_threshold < 1:
            raise ValueError("hot_threshold must be >= 1")
        hot = (
            left.groupBy(on)
            .agg(F.count(F.lit(1)).alias("__c"))
            .where(F.col("__c") > hot_threshold)
            .select(F.col(on).alias("__hot"))
        )

    # deterministic per-row salt for hot left rows: hash of the whole
    # row content (identical duplicate rows share a salt — they would
    # co-locate under ANY content-deterministic scheme; that residual
    # skew is the row-duplication kind salting cannot split)
    l_salt = F.when(
        F.col("__hot").isNotNull(),
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)),
    ).otherwise(F.lit(-1))
    l = (
        left.join(F.broadcast(hot), F.col(on) == F.col("__hot"), "left")
        .withColumn("__salt", l_salt)
        .drop("__hot")
    )
    # explode of a CONDITIONAL array (generators can't sit inside
    # when()): hot rows fan out salt ways, cold rows keep one row
    r_salt = F.explode(
        F.when(
            F.col("__hot").isNotNull(),
            F.sequence(F.lit(0), F.lit(salt - 1)),
        ).otherwise(F.array(F.lit(-1)))
    )
    r = (
        right.join(F.broadcast(hot), F.col(on) == F.col("__hot"), "left")
        .select(
            *right.columns,
            r_salt.alias("__salt"),
        )
        .drop("__hot")
    )
    return l.join(r, [on, "__salt"], how).drop("__salt")
