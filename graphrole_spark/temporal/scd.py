"""Slowly-changing-dimension (SCD type 2) history over a change feed.

The feature-store complement of ``temporal/asof.py``: ``asof_join``
serves "the value as of t" from a *feed*; ``scd2_history`` materializes
the same information as an effective-dated dimension table
``(key, attrs, valid_from, valid_to, is_current)`` so point-in-time
lookups become a plain range predicate (``valid_from <= t < valid_to``)
— the standard lakehouse shape for dimensions joined to 100 TB fact
scans (Kimball SCD2; Iceberg/Delta MERGE idiom).

Scale notes: ``scd2_history`` is one shuffle on the key (two window
passes over the same partitioning — one sort). ``scd2_merge`` touches
ONLY the keys present in the update batch: unchanged keys stream through
an anti-join without being re-sorted, so a 1k-key delta against a
10^10-row dimension costs O(delta) window work + one semi/anti join,
never a full rebuild.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Collapse a change feed into SCD2 versions.

    A new version opens at the first change per key and whenever ANY
    attribute differs from the previous change (null-safe comparison);
    a change that repeats the current attribute values is absorbed into
    the open version. Output: one row per version with

    * ``valid_from`` — ts of the change that opened the version;
    * ``valid_to``  — ts of the next version's open (null for current);
    * ``is_current`` — exactly one true row per key.

    Ties on ``ts_col`` within a key are ordered by the attribute values
    themselves so the construction is deterministic on replayed feeds.
    One shuffle; both windows reuse the same sort.
    """
    key_cols = list(key_cols)
    attr_cols = list(attr_cols)
    renamed = changes.select(*key_cols, F.col(ts_col).alias("__ts"), *attr_cols)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("__ts"), *[F.col(c) for c in attr_cols]
    )
    # null-safe "any attribute changed vs previous row"
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    is_open = F.when(F.lag(F.col("__ts")).over(w).isNull(), F.lit(1)).when(
        changed, F.lit(1)
    ).otherwise(F.lit(0))
    versioned = renamed.withColumn(
        "__ver",
        F.sum(is_open).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_ver = versioned.groupBy(*key_cols, "__ver").agg(
        F.min("__ts").alias("valid_from"),
        # within a version every row carries identical attrs (a version
        # closes on ANY attr change), so first() is deterministic here
        *[F.first(c).alias(c) for c in attr_cols],
    )
    # order by (valid_from, __ver): ties on valid_from (same-ts changes)
    # keep the version-creation order, so valid_to stays deterministic
    w2 = Window.partitionBy(*key_cols).orderBy("valid_from", "__ver")
    return per_ver.select(
        *key_cols,
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Apply an update batch to an existing SCD2 dimension.

    Equivalent to rebuilding ``scd2_history`` over the full change feed,
    but the window work is confined to the touched keys: rows of ``dim``
    whose key has no update pass through via one anti-join. For each
    touched key the existing versions re-enter the history construction
    as synthetic changes at their ``valid_from`` (SCD2 versions ARE the
    collapsed change feed, so this is lossless), concatenated with the
    new updates.

    An update older than a key's current ``valid_from`` back-fills
    history (versions re-split deterministically); an update equal to
    the open version's attributes is absorbed — both for free from the
    shared ``scd2_history`` core.
    """
    key_cols = list(key_cols)
    attr_cols = list(attr_cols)
    upd_changes = updates.select(
        *key_cols, F.col(ts_col).alias("__ts"), *attr_cols
    )
    touched_keys = upd_changes.select(*key_cols).distinct()
    untouched = dim.join(touched_keys, on=key_cols, how="left_anti")
    touched_existing = dim.join(touched_keys, on=key_cols, how="left_semi").select(
        *key_cols, F.col("valid_from").alias("__ts"), *attr_cols
    )
    merged = scd2_history(
        touched_existing.unionByName(upd_changes),
        key_cols,
        "__ts",
        attr_cols,
    )
    return untouched.select(merged.columns).unionByName(merged)


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: Sequence[str],
    fact_ts: str,
    attr_cols: Sequence[str],
    suffix: str = "_dim",
    broadcast_dim: Optional[bool] = None,
) -> DataFrame:
    """Point-in-time dimension lookup: attach the version of ``dim``
    effective at each fact's timestamp (``valid_from <= ts < valid_to``).

    This is the serving join SCD2 exists for: an equi-join on the key
    plus a range predicate — at most one dimension row qualifies per
    fact, so there is no row explosion. ``broadcast_dim`` defaults to
    broadcasting (None == True): the dimension is typically millions of
    versions against 100 TB of facts, and the broadcast keeps the fact
    table from shuffling. Pass ``False`` for a dimension too large to
    broadcast (Spark then sort-merge-joins on the key).
    """
    key_cols = list(key_cols)
    d = dim.select(
        *[F.col(c).alias(f"__k_{c}") for c in key_cols],
        F.col("valid_from").alias("__from"),
        F.col("valid_to").alias("__to"),
        *[F.col(c).alias(f"{c}{suffix}") for c in attr_cols],
    )
    if broadcast_dim or broadcast_dim is None:
        d = F.broadcast(d)
    cond = F.lit(True)
    for c in key_cols:
        cond = cond & (F.col(c) == F.col(f"__k_{c}"))
    cond = cond & (F.col(fact_ts) >= F.col("__from")) & (
        F.col("__to").isNull() | (F.col(fact_ts) < F.col("__to"))
    )
    joined = facts.join(d, on=cond, how="left")
    return joined.select(*facts.columns, *[f"{c}{suffix}" for c in attr_cols])
