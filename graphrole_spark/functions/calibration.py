"""Score calibration: Platt scaling and isotonic regression — turn a
ranking-good-but-probability-bad scorer (quality classifier, reward
model, LM-judge confidence) into calibrated probabilities before its
outputs gate data selection or get thresholded.

Companion to ``evaluation.binary_metrics`` (which MEASURES
miscalibration via ECE/Brier): fit here, re-measure there.

Scale design:

* **Platt** (sigmoid ``p = σ(a·s + b)``, Platt 1999): fitted by
  Newton-Raphson on the exact log-loss — each iteration is ONE
  aggregate computing the 2-gradient + 2×2-Hessian sums
  (map-side combined, five doubles to the driver); 25 iterations =
  25 tiny jobs over a persisted (score, label) projection. No data
  leaves the cluster.
* **Isotonic** (monotone step function, PAV): the pool-adjacent-
  violators pass is inherently sequential, but it runs over the
  per-DISTINCT-SCORE histogram, not the rows (the binary_metrics
  trick): one hash aggregate to ``(score, n, sum_y)``, driver-side
  PAV over ≤ ``max_distinct`` histogram rows (guarded — a continuous
  score column should be rounded/bucketed first, which calibration
  data always tolerates), mapping applied back with a broadcast
  range lookup.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def platt_fit(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_iter: int = 25,
    prior_smoothing: bool = True,
) -> tuple[float, float]:
    """Fit Platt's ``(a, b)`` by Newton-Raphson on exact log-loss.

    ``prior_smoothing`` uses Platt's target smoothing
    ``t⁺ = (N⁺+1)/(N⁺+2)``, ``t⁻ = 1/(N⁻+2)`` — the published guard
    against overconfident sigmoids on small calibration sets.
    Returns the scalar ``(a, b)``.
    """
    base = scored.select(
        F.col(score_col).cast("double").alias("s"),
        F.col(label_col).cast("double").alias("y"),
    ).where(F.col("s").isNotNull() & F.col("y").isNotNull()).persist()
    counts = base.agg(
        F.sum("y").alias("np"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    n_pos, n = float(counts["np"] or 0.0), float(counts["n"])
    if n == 0:
        base.unpersist()
        raise ValueError("no usable (score, label) rows")
    n_neg = n - n_pos
    if prior_smoothing:
        t_pos = (n_pos + 1.0) / (n_pos + 2.0)
        t_neg = 1.0 / (n_neg + 2.0)
    else:
        t_pos, t_neg = 1.0, 0.0
    t = F.when(F.col("y") > 0, F.lit(t_pos)).otherwise(F.lit(t_neg))

    a, b = 0.0, math.log((n_neg + 1.0) / (n_pos + 1.0))
    for _ in range(n_iter):
        z = F.lit(a) * F.col("s") + F.lit(b)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        w = p * (1.0 - p) + 1e-12
        r = base.agg(
            F.sum((p - t) * F.col("s")).alias("ga"),
            F.sum(p - t).alias("gb"),
            F.sum(w * F.col("s") * F.col("s")).alias("haa"),
            F.sum(w * F.col("s")).alias("hab"),
            F.sum(w).alias("hbb"),
        ).collect()[0]
        ga, gb = float(r["ga"]), float(r["gb"])
        haa, hab, hbb = float(r["haa"]), float(r["hab"]), float(r["hbb"])
        det = haa * hbb - hab * hab
        if abs(det) < 1e-18:
            break
        da = (hbb * ga - hab * gb) / det
        db = (haa * gb - hab * ga) / det
        a, b = a - da, b - db
        if abs(da) < 1e-12 and abs(db) < 1e-12:
            break
    base.unpersist()
    return a, b


def platt_apply(
    scored: DataFrame,
    a: float,
    b: float,
    score_col: str = "score",
    out_col: str = "calibrated",
) -> DataFrame:
    """Apply a fitted sigmoid — pure codegen projection."""
    z = F.lit(float(a)) * F.col(score_col).cast("double") + F.lit(float(b))
    return scored.withColumn(
        out_col, F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9)
    )


def _pav(points: "list[tuple[float, float, float]]") -> "list[tuple[float, float]]":
    """Pool-adjacent-violators over (score, n, sum_y) sorted by score.
    Returns (score_threshold, calibrated_value) per pooled block —
    the step function's right-continuous breakpoints (block start)."""
    blocks: list[list[float]] = []  # [start_score, n, sum_y]
    for s, cnt, sy in points:
        blocks.append([s, cnt, sy])
        while len(blocks) >= 2 and (
            blocks[-2][2] / blocks[-2][1] >= blocks[-1][2] / blocks[-1][1]
        ):
            s2 = blocks.pop()
            blocks[-1][1] += s2[1]
            blocks[-1][2] += s2[2]
    return [(blk[0], blk[2] / blk[1]) for blk in blocks]


def isotonic_fit(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    max_distinct: int = 100_000,
) -> DataFrame:
    """Fit isotonic calibration; returns the step-function mapping as
    a (tiny) DataFrame ``(score_from, calibrated)`` — block start
    thresholds, right-continuous. Raises when the score column has
    more than ``max_distinct`` distinct values (round/bucket a
    continuous score first; PAV's sequential pass is driver-side by
    construction and the histogram must stay driver-sized)."""
    hist = (
        scored.select(
            F.col(score_col).cast("double").alias("s"),
            F.col(label_col).cast("double").alias("y"),
        )
        .where(F.col("s").isNotNull() & F.col("y").isNotNull())
        .groupBy("s")
        .agg(F.count(F.lit(1)).cast("double").alias("n"), F.sum("y").alias("sy"))
    )
    n_distinct = hist.count()
    if n_distinct == 0:
        raise ValueError("no usable (score, label) rows")
    if n_distinct > max_distinct:
        raise ValueError(
            f"{n_distinct} distinct scores exceeds max_distinct="
            f"{max_distinct}; round or bucket the score column first"
        )
    pts = [
        (r["s"], r["n"], r["sy"])
        for r in hist.orderBy("s").collect()
    ]
    mapping = _pav(pts)
    spark = scored.sparkSession
    return spark.createDataFrame(
        [(s, round(v, 9)) for s, v in mapping],
        "score_from double, calibrated double",
    )


def _step_lookup(thresholds, values, s):
    """Exact right-continuous step lookup as a balanced binary-search
    WHEN-tree: depth ⌈log₂ b⌉ comparisons per row, expression size
    O(b) — each threshold/value literal appears ONCE (no subtree
    duplication, PERF rule 35), all codegen, no join, no HOF lambda.
    Scores below thresholds[0] clamp up to values[0]."""
    if len(values) == 1:
        return F.lit(values[0])
    mid = len(values) // 2
    return F.when(
        s < F.lit(thresholds[mid]),
        _step_lookup(thresholds[:mid], values[:mid], s),
    ).otherwise(_step_lookup(thresholds[mid:], values[mid:], s))


def isotonic_apply(
    scored: DataFrame,
    mapping: DataFrame,
    score_col: str = "score",
    out_col: str = "calibrated",
    max_blocks: int = 8192,
) -> DataFrame:
    """Apply the step mapping: each score takes the calibrated value
    of the LAST block whose ``score_from <= score`` (scores below the
    first block clamp up to it — the standard out-of-range rule).

    The mapping (driver-born and PAV-pooled, typically tens of
    blocks) is compiled into a balanced binary-search expression —
    a pure projection, O(log blocks) comparisons per row, no join.
    ``max_blocks`` guards the expression size; a mapping that large
    means the calibration scores were never bucketed (see
    :func:`isotonic_fit`'s ``max_distinct``)."""
    rows = mapping.orderBy("score_from").collect()
    if not rows:
        raise ValueError("empty mapping")
    if len(rows) > max_blocks:
        raise ValueError(
            f"{len(rows)} mapping blocks exceeds max_blocks={max_blocks}"
        )
    thresholds = [float(r["score_from"]) for r in rows]
    values = [float(r["calibrated"]) for r in rows]
    s = F.col(score_col).cast("double")
    return scored.withColumn(
        out_col, F.when(s.isNotNull(), _step_lookup(thresholds, values, s))
    )


def conformal_interval(
    calibration: DataFrame,
    scored: DataFrame,
    pred_col: str = "prediction",
    label_col: str = "label",
    alpha: float = 0.1,
    group_cols: "Optional[list[str]]" = None,
) -> DataFrame:
    """Split-conformal prediction intervals (Vovk et al.; Lei et al.
    2018): from a held-out calibration set's absolute residuals
    ``|y − ŷ|``, take the ``⌈(n+1)(1−α)⌉/n`` empirical quantile ``q̂``;
    then ``ŷ ± q̂`` covers the true label with probability ≥ 1−α for
    any exchangeable data and ANY underlying model — the
    distribution-free error bar to attach to a reward model or
    quality regressor before its scores gate data.

    ``group_cols`` fits one q̂ per group (Mondrian/group-conditional
    conformal — coverage holds per group). Groups present in
    ``scored`` but absent from the calibration set get NULL bounds
    (no guarantee exists there — surfaced, not faked).

    Plan: residuals ranked once per group (one window exchange over
    the CALIBRATION set — held-out-sized, not the scored stream); q̂
    is the exact ``k = min(⌈(n+1)(1−α)⌉, n)``-th order statistic (the
    method's definition — no interpolation), and the (groups ×) 1-row
    q̂ frame broadcasts onto ``scored`` as a pure projection.
    Returns ``scored`` + ``(conf_q, conf_lo, conf_hi)``.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    g = list(group_cols or [])
    resid = F.abs(
        F.col(label_col).cast("double") - F.col(pred_col).cast("double")
    )
    base = calibration.where(
        F.col(label_col).isNotNull() & F.col(pred_col).isNotNull()
    ).select(*g, resid.alias("__r"))
    from pyspark.sql import Window

    wg = Window.partitionBy(*g) if g else Window.partitionBy(F.lit(1))
    wo = wg.orderBy("__r", F.monotonically_increasing_id())
    ranked = base.withColumn(
        "__n", F.count(F.lit(1)).over(wg)
    ).withColumn("__rn", F.row_number().over(wo))
    k = F.least(
        F.ceil((F.col("__n") + 1) * F.lit(1.0 - alpha)).cast("long"),
        F.col("__n"),
    )
    qhat = ranked.where(F.col("__rn") == k).select(
        *g, F.col("__r").alias("conf_q")
    )
    if g:
        joined = scored.join(F.broadcast(qhat), g, "left")
    else:
        joined = scored.crossJoin(F.broadcast(qhat))
    p = F.col(pred_col).cast("double")
    return joined.select(
        "*",
        F.round(p - F.col("conf_q"), 9).alias("conf_lo"),
        F.round(p + F.col("conf_q"), 9).alias("conf_hi"),
    )
