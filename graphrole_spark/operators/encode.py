"""Leakage-safe categorical target encoding — the high-cardinality
bridge between raw categorical columns (tool names, sources, user ids)
and any numeric model downstream of the feature frame.

Target (mean) encoding replaces a category with the mean of the label
over that category. Done naively it leaks the row's own label into its
feature — the classic train-time-only "magic feature". This module
implements the three leak-disciplines the literature settled on
(Micci-Barreca, SIGKDD Explorations 2001 for the smoothing form):

* ``method="prefix"`` — POINT-IN-TIME encoding, the north-rule
  discipline this engine applies everywhere else: each row sees the
  smoothed label mean of strictly-earlier rows (``ts_col`` RANGE frame,
  so same-timestamp rows are mutually invisible — no intra-batch
  leakage). The serve-time twin of an online running mean; rows with no
  history get the pure prior.
* ``method="oof"`` — K-fold out-of-fold encoding for non-temporal
  training sets: a row's encoding uses category statistics from the
  OTHER folds only (leave-one-fold-out subtraction). Folds come from a
  caller column or a deterministic md5 hash of an id column — no RNG,
  re-runs agree.
* ``method="fit"`` — the inference-time table: one smoothed mean per
  category, to broadcast-join onto serving traffic (no leakage concern
  at serve: the label is in the past by construction).

All three share the smoothing rule
``enc = (sum_label + smoothing · prior) / (count + smoothing)`` with
``prior`` = global label mean — categories with little evidence shrink
toward the prior instead of memorizing noise.

NULL labels contribute no evidence but still receive an encoding; a
NULL category is its own group (Spark window/groupBy semantics),
documented rather than remapped.

Plan shapes (100 TB lens):
* prefix — ONE category-keyed exchange; the running sum/count is a
  RANGE window over the same sort, no joins, no Python. Heavy
  categories stream through the window operator (sort-based, spills).
* oof — ONE (category, fold) map-side-combined aggregate (tiny: |cats|
  × K rows), aggregated again to per-category totals, then ONE
  broadcastable join back; the fact table is never shuffled when the
  encoding table broadcasts.
* fit — one aggregate, |cats| rows out.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def target_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    method: str = "prefix",
    ts_col: str = "ts",
    id_col: Optional[str] = None,
    fold_col: Optional[str] = None,
    n_folds: int = 5,
    smoothing: float = 20.0,
    output_col: Optional[str] = None,
) -> DataFrame:
    """Append ``output_col`` (default ``<cat_col>_enc``) per the chosen
    leak discipline; ``method="fit"`` instead RETURNS the per-category
    encoding table ``(cat_col, <cat_col>_enc, n)``.

    ``prefix`` needs ``ts_col``; ``oof`` needs ``fold_col`` (trusted)
    or ``id_col`` (md5-hashed into ``n_folds`` deterministic folds).
    """
    if method not in ("prefix", "oof", "fit"):
        raise ValueError("method must be 'prefix', 'oof' or 'fit'")
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (prior weight)")
    out = output_col or f"{cat_col}_enc"
    y = F.col(label_col).cast("double")

    # global prior: one tiny aggregate, broadcast via crossJoin
    prior = df.agg(F.avg(y).alias("__prior"))

    if method == "fit":
        fit = (
            df.groupBy(cat_col)
            .agg(
                F.sum(y).alias("__s"),
                F.count(y).alias("__n"),
            )
            .crossJoin(F.broadcast(prior))
            .select(
                cat_col,
                (
                    (F.col("__s") + F.lit(smoothing) * F.col("__prior"))
                    / (F.col("__n") + F.lit(smoothing))
                ).alias(out),
                F.col("__n").cast("long").alias("n"),
            )
        )
        return fit

    if method == "prefix":
        # RANGE frame on the timestamp: strictly-earlier rows only, so
        # ties at the same ts are mutually invisible (no intra-batch
        # leakage) — the same discipline as pipeline.py's cutoffs.
        ts_num = (
            F.col(ts_col).cast("timestamp").cast("double") * 1e6
        ).cast("long")  # integral micros: RANGE frames need long bounds
        w = (
            Window.partitionBy(cat_col)
            .orderBy(ts_num)
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        s = F.coalesce(F.sum(y).over(w), F.lit(0.0))
        n = F.coalesce(F.count(y).over(w), F.lit(0))
        return df.crossJoin(F.broadcast(prior)).select(
            *df.columns,
            (
                (s + F.lit(smoothing) * F.col("__prior"))
                / (n + F.lit(smoothing))
            ).alias(out),
        )

    # method == "oof"
    if fold_col is None:
        if id_col is None:
            raise ValueError("oof needs fold_col or id_col")
        fold = (
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % int(n_folds)
        )
    else:
        fold = F.col(fold_col)
    with_fold = df.withColumn("__fold", fold)
    per_cat_fold = with_fold.groupBy(cat_col, "__fold").agg(
        F.sum(y).alias("__fs"), F.count(y).alias("__fn")
    )
    per_cat = per_cat_fold.groupBy(cat_col).agg(
        F.sum("__fs").alias("__ts"), F.sum("__fn").alias("__tn")
    )
    enc = per_cat_fold.join(per_cat, cat_col).select(
        cat_col,
        "__fold",
        (F.col("__ts") - F.col("__fs")).alias("__s"),
        (F.col("__tn") - F.col("__fn")).alias("__n"),
    )
    return (
        with_fold.join(
            F.broadcast(enc), [cat_col, "__fold"], "left"
        )
        .crossJoin(F.broadcast(prior))
        .select(
            *df.columns,
            (
                (
                    F.coalesce(F.col("__s"), F.lit(0.0))
                    + F.lit(smoothing) * F.col("__prior")
                )
                / (F.coalesce(F.col("__n"), F.lit(0)) + F.lit(smoothing))
            ).alias(out),
        )
    )
