"""Experiment-analysis layer: two-sample A/B evaluation with CUPED
variance reduction, and Kaplan-Meier survival/retention curves.

Model-eval infrastructure a training-data pipeline grows into: A/B
tests adjudicate data-recipe or model-version rollouts (the metric is
whatever the eval layer produced — win rate, quality score, reward),
survival curves describe time-to-churn / time-to-event over the same
event streams the cohort triangle summarizes.

Both operators are pure moment/window arithmetic — one hash aggregate
per variant (A/B) or one ordered window pass per group (KM); no
Python in the hot path, everything DuckDB-reproducible.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ab_test(
    assignments: DataFrame,
    variant_col: str,
    metric_col: str,
    control: str,
    pre_metric_col: Optional[str] = None,
) -> DataFrame:
    """Per-variant two-sample z-test against ``control``, optionally
    CUPED-adjusted (Deng et al., WSDM 2013): ``y' = y − θ(x − x̄)``
    with ``θ = cov(x, y) / var(x)`` fitted on the POOLED population
    (the standard single-θ variant — pre-period data is
    pre-assignment, so pooling introduces no bias) where ``x`` is the
    pre-experiment metric. CUPED removes the variance the pre-period
    already explains; with a strong covariate the same experiment
    reaches significance at a fraction of the sample.

    Plan: ONE moment aggregate per variant (n, Σy, Σy², Σx, Σxy, Σx²
    — map-side combined), the 1-row pooled-θ frame and the 1-row
    control frame cross/broadcast-joined back. Output one row per
    non-control variant: ``(variant, n, mean, n_control, mean_control,
    effect, rel_effect, se, z, significant)`` — Welch unpooled SE,
    ``significant`` = |z| > 1.96 (95% two-sided). Rows where the
    metric (or, under CUPED, the pre-metric) is NULL are excluded.
    Means/effects rounded to 9 decimals (engine-portable).
    """
    y = F.col(metric_col).cast("double")
    base = assignments.where(y.isNotNull()).select(
        F.col(variant_col).alias("variant"),
        y.alias("__y"),
        *(
            [F.col(pre_metric_col).cast("double").alias("__x")]
            if pre_metric_col
            else []
        ),
    )
    if pre_metric_col:
        base = base.where(F.col("__x").isNotNull())
        # ONE row — checkpointed so the broadcast side does not re-run
        # the whole base scan to produce it (every reference would
        # otherwise re-execute the upstream synthesis/scan)
        pooled = base.agg(
            F.avg("__x").alias("__mx"),
            F.covar_samp("__x", "__y").alias("__cxy"),
            F.var_samp("__x").alias("__vx"),
        ).localCheckpoint()
        theta = F.when(
            F.col("__vx") > 0, F.col("__cxy") / F.col("__vx")
        ).otherwise(F.lit(0.0))
        base = base.crossJoin(F.broadcast(pooled)).select(
            "variant",
            (F.col("__y") - theta * (F.col("__x") - F.col("__mx"))).alias(
                "__y"
            ),
        )
    # |variants| rows — checkpointed: the control collect below AND the
    # final projection both reference it, and unmaterialized each
    # would re-run the base scan (plus the CUPED pass) from scratch
    stats = base.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("__y").alias("__mean"),
        F.var_samp("__y").alias("__var"),
    ).localCheckpoint()
    # The control is 1 row by construction — collect it. This (a) turns
    # a typo'd/absent control value into a loud ValueError instead of a
    # silently empty result, and (b) inlines the control stats as
    # literals so execution runs the variant aggregate ONCE (the
    # crossJoin form would re-execute the whole stats subtree to
    # produce the broadcast side).
    ctrl_rows = (
        stats.where(F.col("variant") == control)
        .select("n", "__mean", "__var")
        .collect()
    )
    if not ctrl_rows:
        raise ValueError(
            f"control variant {control!r} not present in {variant_col!r} "
            "(or has no non-NULL metric rows)"
        )
    n_c, mean_c, var_c = ctrl_rows[0]
    stats = (
        stats.withColumn("n_control", F.lit(n_c).cast("long"))
        .withColumn("__mean_c", F.lit(mean_c).cast("double"))
        .withColumn("__var_c", F.lit(var_c).cast("double"))
    )
    se = F.sqrt(
        F.col("__var") / F.col("n") + F.col("__var_c") / F.col("n_control")
    )
    z = F.when(se > 0, (F.col("__mean") - F.col("__mean_c")) / se)
    return (
        stats.where(F.col("variant") != control)
        .select(
            "variant",
            "n",
            F.round("__mean", 9).alias("mean"),
            "n_control",
            F.round("__mean_c", 9).alias("mean_control"),
            F.round(F.col("__mean") - F.col("__mean_c"), 9).alias("effect"),
            F.round(
                F.when(
                    F.col("__mean_c") != 0,
                    (F.col("__mean") - F.col("__mean_c"))
                    / F.abs(F.col("__mean_c")),
                ),
                9,
            ).alias("rel_effect"),
            F.round(se, 9).alias("se"),
            F.round(z, 6).alias("z"),
            # a variant too small for a variance (n=1 -> NULL z) must
            # read "not significant", never NULL
            F.coalesce((F.abs(z) > 1.96).cast("int"), F.lit(0)).alias(
                "significant"
            ),
        )
        .orderBy("variant")
    )


def kaplan_meier(
    durations: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimate per group —
    time-to-churn / time-to-failure curves with right-censoring
    (``event = 1`` observed, ``0`` censored at ``duration``).

    S(t) = Π_{u ≤ t} (1 − d_u / n_u) over distinct observed times:
    ``d_u`` events at ``u``, ``n_u`` at-risk (neither dropped out nor
    censored before ``u``). Censored-only times carry S(t) forward
    unchanged (their factor is 1) but still appear so the at-risk
    column is auditable.

    Plan: one (group, duration) count aggregate, one ordered window
    per group (cumulative counts share the sort; the running product
    is exp∘Σlog with an exact zero-factor flag — ``log(0)`` is NULL in
    Spark and −inf in DuckDB, so the flag keeps both engines at an
    exact 0.0). Output rows = distinct (group, duration) pairs.

    Returns ``group_cols + (duration, n_risk, n_events, n_censored,
    survival)`` with survival rounded to 9 decimals.
    """
    g = list(group_cols)
    d = F.col(duration_col).cast("double")
    ev = F.col(event_col).cast("int")
    base = durations.where(d.isNotNull() & ev.isNotNull()).select(
        *g, d.alias("__t"), ev.alias("__e")
    )
    counts = base.groupBy(*g, "__t").agg(
        F.sum("__e").cast("long").alias("n_events"),
        F.sum(1 - F.col("__e")).cast("long").alias("n_censored"),
    )
    w = Window.partitionBy(*g) if g else Window.partitionBy(F.lit(1))
    wo = w.orderBy("__t")
    prior = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(
            wo.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(w)
    # windows can't nest — stage at-risk, then the factor, then the
    # running product; every window shares the same partition+order so
    # Catalyst keeps them in one sort
    staged = counts.withColumn(
        "n_risk", (total - prior).cast("long")
    ).withColumn("__f", 1.0 - F.col("n_events") / F.col("n_risk"))
    run = wo.rowsBetween(Window.unboundedPreceding, 0)
    staged = staged.withColumn(
        "__hz", F.max((F.col("__f") <= 0).cast("int")).over(run)
    ).withColumn(
        "__ls",
        F.sum(
            F.when(F.col("__f") > 0, F.log("__f")).otherwise(F.lit(0.0))
        ).over(run),
    )
    survival = F.when(F.col("__hz") == 1, F.lit(0.0)).otherwise(
        F.exp(F.col("__ls"))
    )
    return staged.select(
        *g,
        F.col("__t").alias("duration"),
        "n_risk",
        "n_events",
        "n_censored",
        F.round(survival, 9).alias("survival"),
    )
