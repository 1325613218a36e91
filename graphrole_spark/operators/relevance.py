"""Feature-relevance scoring against a label — the filter-method
feature-selection step between a wide feature frame (ReFeX output,
quality signals) and model training: which engineered features carry
signal about the target, and which are noise to drop before the model
sees them.

Three complementary statistics per feature, all from the classical
filter literature (Guyon & Elisseeff, JMLR 2003):

* ``mi`` — mutual information (nats) between the equal-width-binned
  feature and the label: detects ANY dependence, including
  non-monotone;
* ``chi2`` — Pearson's chi-squared over the same contingency table,
  full grid including absent cells via the ``Σ O²/E − N`` identity
  (absent cells carry expected mass, so they must count);
* ``pearson`` — linear correlation between the RAW feature and the
  label cast to double: signed, catches direction; NULL when either
  side is constant (or the label is non-numeric).

Binning is equal-width over the feature's observed [min, max] into
``bins`` cells (constant features collapse to one cell → mi = chi2 = 0:
no information). NULL feature values and NULL labels are excluded
per-feature; ``n`` reports the rows that counted.

Plan (100 TB lens): pass 1 is ONE wide map-side-combined aggregate
computing min/max + the five Pearson moment sums for every feature
(a few doubles per feature reach the driver — the normalize.py
two-pass shape). Pass 2 melts the frame feature-major (``stack``, a
projection — no explode of arrays, no shuffle) and runs ONE
(feature, bin, label) hash aggregate; the resulting contingency is
``|features| × bins × |labels|`` rows — marginal windows and the final
per-feature reduce run over THAT, never over raw rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def feature_relevance(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """One row per feature: ``feature, mi, chi2, pearson, n`` —
    best-first by ``mi``, feature-name tie-break."""
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    if bins < 2:
        raise ValueError("bins must be >= 2")
    y_str = F.col(label_col).cast("string")
    y_num = F.col(label_col).cast("double")

    # pass 1: per-feature bounds + Pearson moments, one wide aggregate
    aggs = []
    for c in feature_cols:
        v = F.col(c).cast("double")
        ok = v.isNotNull() & y_str.isNotNull()
        vv = F.when(ok, v)
        yy = F.when(ok, y_num)
        aggs += [
            F.min(vv).alias(f"__min_{c}"),
            F.max(vv).alias(f"__max_{c}"),
            F.count(vv).alias(f"__n_{c}"),
            F.sum(vv).alias(f"__sx_{c}"),
            F.sum(vv * vv).alias(f"__sxx_{c}"),
            F.sum(vv * yy).alias(f"__sxy_{c}"),
            F.sum(yy).alias(f"__sy_{c}"),
            F.sum(yy * yy).alias(f"__syy_{c}"),
        ]
    stats = df.agg(*aggs).collect()[0].asDict()

    # pass 2: melt + contingency. stack() is a pure projection.
    stack_args = ", ".join(
        f"'{c}', cast(`{c}` as double)" for c in feature_cols
    )
    melted = df.select(
        F.expr(
            f"stack({len(feature_cols)}, {stack_args}) as (__feature, __v)"
        ),
        y_str.alias("__y"),
    ).where(F.col("__v").isNotNull() & F.col("__y").isNotNull())

    lo = F.create_map(
        *[
            x
            for c in feature_cols
            for x in (F.lit(c), F.lit(stats[f"__min_{c}"]))
        ]
    )[F.col("__feature")]
    hi = F.create_map(
        *[
            x
            for c in feature_cols
            for x in (F.lit(c), F.lit(stats[f"__max_{c}"]))
        ]
    )[F.col("__feature")]
    width = hi - lo
    b = F.when(width > 0,
        F.least(
            F.lit(bins - 1),
            F.floor((F.col("__v") - lo) / width * bins).cast("int"),
        ),
    ).otherwise(F.lit(0))
    cont = (
        melted.select("__feature", b.alias("__b"), "__y")
        .groupBy("__feature", "__b", "__y")
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )

    wf = Window.partitionBy("__feature")
    wx = Window.partitionBy("__feature", "__b")
    wy = Window.partitionBy("__feature", "__y")
    cells = cont.select(
        "__feature",
        "n_xy",
        F.sum("n_xy").over(wf).alias("n_f"),
        F.sum("n_xy").over(wx).alias("n_x"),
        F.sum("n_xy").over(wy).alias("n_y"),
    )
    exp = F.col("n_x") * F.col("n_y") / F.col("n_f")
    per_feature = cells.groupBy("__feature").agg(
        F.sum(
            (F.col("n_xy") / F.col("n_f"))
            * F.log(
                F.col("n_xy") * F.col("n_f") / (F.col("n_x") * F.col("n_y"))
            )
        ).alias("mi"),
        # full-grid chi2 without materializing absent cells:
        # chi2 = sum_all (O-E)^2/E = sum_present O^2/E - N
        F.sum(F.col("n_xy") * F.col("n_xy") / exp).alias("__chi2_o2e"),
        F.first("n_f").alias("n"),
    )

    rows = []
    for c in feature_cols:
        n = stats[f"__n_{c}"] or 0
        pearson = None
        if n >= 2:
            sx, sxx = stats[f"__sx_{c}"], stats[f"__sxx_{c}"]
            sy, syy = stats[f"__sy_{c}"], stats[f"__syy_{c}"]
            sxy = stats[f"__sxy_{c}"]
            if None not in (sx, sxx, sy, syy, sxy):
                vx = sxx - sx * sx / n
                vy = syy - sy * sy / n
                if vx > 0 and vy > 0:
                    pearson = (sxy - sx * sy / n) / (vx**0.5 * vy**0.5)
        rows.append((c, pearson))
    spark = df.sparkSession
    pearson_df = spark.createDataFrame(
        rows, schema="__feature string, pearson double"
    )
    return (
        pearson_df.join(per_feature, "__feature", "left")
        .select(
            F.col("__feature").alias("feature"),
            F.when(
                F.col("mi").isNotNull(), F.greatest(F.col("mi"), F.lit(0.0))
            ).alias("mi"),
            (F.col("__chi2_o2e") - F.col("n")).alias("chi2"),
            "pearson",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
        .orderBy(F.desc_nulls_last("mi"), F.asc("feature"))
    )
