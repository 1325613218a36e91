"""Temporal primitives: sessionize, lag/lead, backfill, prefix aggregates.

These are the engine's point-in-time surface (BASELINE.json north_rule):
every operator is a pure DataFrame transformation — single window pass,
no Python in the hot path — so Catalyst plans one shuffle per
``partitionBy`` key set and whole-stage-codegens the rest.

Scale notes (10^12 turns): all windows partition by the conversation /
entity key, so the shuffle is hash(key)-balanced; one pathological key
(a 10^8-turn conversation) is bounded by sessionized sub-keys where the
semantics allow (see ``sessionize``). No window here is unbounded over
the whole table.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: float,
    session_col: str = "session_seq",
) -> DataFrame:
    """Assign a per-key session sequence number using the classic
    gap-and-cumsum construction: a new session starts whenever the gap to
    the previous row exceeds ``gap_seconds``.

    Output column ``session_col`` is 0-based per key. One shuffle on
    ``key_cols``; both window passes share the same partitioning so
    Catalyst executes them in a single sort.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col))
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # TIMESTAMP_NTZ has no direct numeric cast; hop through TIMESTAMP
    # (lossless with the session pinned to UTC, session.py)
    gap = F.col(ts_col).cast("timestamp").cast("double") - prev_ts.cast(
        "timestamp"
    ).cast("double")
    is_new = F.when(prev_ts.isNull(), F.lit(0)).when(
        gap > F.lit(float(gap_seconds)), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )


def lag_lead_features(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_cols: Sequence[str],
    lags: Sequence[int] = (1,),
    leads: Sequence[int] = (1,),
) -> DataFrame:
    """Attach lag/lead columns ``<col>_lag<k>`` / ``<col>_lead<k>``.

    All offsets share one window definition → one shuffle + one sort.
    """
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    out = df
    for col in value_cols:
        for k in lags:
            out = out.withColumn(f"{col}_lag{k}", F.lag(col, k).over(w))
        for k in leads:
            out = out.withColumn(f"{col}_lead{k}", F.lead(col, k).over(w))
    return out


def backfill(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    out_col: Optional[str] = None,
    direction: str = "forward",
) -> DataFrame:
    """Fill nulls from the last (forward) or next (backward) non-null
    value within the key group, in ``order_cols`` order.

    forward: ``last(value, ignorenulls)`` over (-inf, 0];
    backward: ``first(value, ignorenulls)`` over [0, +inf).
    """
    out_col = out_col or f"{value_col}_filled"
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    if direction == "forward":
        expr = F.last(value_col, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    elif direction == "backward":
        expr = F.first(value_col, ignorenulls=True).over(
            w.rowsBetween(0, Window.unboundedFollowing)
        )
    else:
        raise ValueError("direction must be 'forward' or 'backward'")
    return df.withColumn(out_col, expr)


def decayed_sum(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    half_life_seconds: float,
    out_col: str,
    include_current: bool = True,
) -> DataFrame:
    """Exponentially time-decayed prefix sum — the classic recency-
    weighted engagement feature: at each row,
    ``Σ_{t_i ≤ t} v_i · 2^(−(t−t_i)/half_life)``.

    Closed form as ONE window pass (no recursion, no UDF):
    ``2^(−(t−m)/hl) · Σ v_i · 2^((t_i−m)/hl)`` where ``m`` is the
    per-key minimum timestamp — the re-basing keeps the exponent range
    to span/half_life (guard: spans beyond ~1000 half-lives overflow a
    double; pick the half-life accordingly or segment first).
    ``include_current=False`` gives the strict-prefix (zero-leakage)
    form. Deterministic: the cumulative sum runs in ``order_cols``
    order on both engines, so the DuckDB oracle matches bit-for-bit
    modulo 6-dp rounding.
    """
    ts_dbl = F.col(ts_col).cast("timestamp").cast("double")
    wk = Window.partitionBy(*key_cols)
    upper = 0 if include_current else -1
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    rebased = (ts_dbl - F.min(ts_dbl).over(wk)) / F.lit(half_life_seconds)
    out = df.withColumn("__t", rebased)
    acc = F.sum(F.col(value_col) * F.pow(F.lit(2.0), F.col("__t"))).over(w)
    return out.withColumn(
        out_col, F.coalesce(acc, F.lit(0.0)) * F.pow(F.lit(2.0), -F.col("__t"))
    ).drop("__t")


def prefix_aggregate(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    agg_exprs: dict[str, Column],
    include_current: bool = True,
) -> DataFrame:
    """Point-in-time running aggregates over all earlier rows of the key.

    ``agg_exprs`` maps output column name -> aggregate Column (e.g.
    ``F.sum("value")``). ``include_current=False`` gives the strict-prefix
    frame (-inf, -1] — the zero-leakage form: the aggregate at row t sees
    only rows strictly before t.
    """
    upper = 0 if include_current else -1
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    out = df
    for name, expr in agg_exprs.items():
        out = out.withColumn(name, expr.over(w))
    return out


def temporal_split(
    df: DataFrame,
    ts_col: str,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
    embargo_seconds: float = 0.0,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe TIME-ordered train/val/test split with an embargo.

    The hash split (``corpus.split_assign``) randomizes WITHIN time —
    right for i.i.d. documents, wrong for forecasting-style evaluation
    where the model must be trained strictly before the data it is
    scored on. This operator cuts on the time axis instead: the earliest
    ``train_frac`` of rows become ``train``, the next ``val_frac``
    become ``val``, the rest ``test`` — and rows within
    ``embargo_seconds`` AFTER each boundary are labeled ``embargo``
    (dropped by convention), so windowed features computed near a
    boundary cannot straddle it (the purged/embargoed split of the
    financial-ML literature).

    Exact quantile cutpoints: one scan to fit two timestamps (tiny
    driver traffic), one codegen projection to label — no shuffle, no
    window. Boundary ties: a row exactly at a cut timestamp stays on
    the earlier side (<=), so the labeling is deterministic under
    duplicate timestamps.
    """
    if not (0.0 < train_frac < 1.0 and 0.0 <= val_frac < 1.0):
        raise ValueError("fractions must be in (0,1)")
    if train_frac + val_frac >= 1.0:
        raise ValueError("train_frac + val_frac must leave room for test")
    ts_dbl = F.col(ts_col).cast("timestamp").cast("double")
    cuts = df.agg(
        F.percentile(ts_dbl, F.lit(float(train_frac))).alias("t1"),
        F.percentile(ts_dbl, F.lit(float(train_frac + val_frac))).alias("t2"),
    ).collect()[0]
    if cuts["t1"] is None:
        raise ValueError("temporal_split on an empty input")
    t1, t2 = float(cuts["t1"]), float(cuts["t2"])
    e = float(embargo_seconds)
    label = (
        F.when(ts_dbl <= F.lit(t1), F.lit("train"))
        .when(ts_dbl <= F.lit(t1 + e), F.lit("embargo"))
        .when(ts_dbl <= F.lit(t2), F.lit("val"))
        .when(ts_dbl <= F.lit(t2 + e), F.lit("embargo"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(split_col, label)


def rolling_origin_folds(
    df: DataFrame,
    ts_col: str,
    n_folds: int = 4,
    base_train_frac: float = 0.5,
    embargo_seconds: float = 0.0,
    fold_col: str = "fold",
) -> DataFrame:
    """Rolling-origin (expanding-window) backtest folds — the K-fold
    generalization of :func:`temporal_split`.

    The time axis after the base-train window is cut into ``n_folds``
    equal-quantile test segments. Each row gets ONE label:

    * ``0``  — base train window (earliest ``base_train_frac`` rows);
    * ``i``  (1..K) — row falls in test fold i;
    * ``-1`` — row falls in the embargo band right after a fold
      boundary (excluded from both sides).

    Fold i's evaluation convention: train = labels in [0, i-1], test =
    label i — so the training window expands with the origin and never
    sees data at or after its own test fold (zero temporal leakage by
    construction). Compact single-label output: no K-fold row
    replication, so a 10^12-row table gains one int column, not K
    copies. One fit scan (K exact quantiles) + one codegen projection.
    """
    if n_folds < 1:
        raise ValueError("n_folds must be >= 1")
    if not 0.0 < base_train_frac < 1.0:
        raise ValueError("base_train_frac must be in (0,1)")
    ts_dbl = F.col(ts_col).cast("timestamp").cast("double")
    fracs = [
        base_train_frac + i * (1.0 - base_train_frac) / n_folds
        for i in range(n_folds)  # upper edge of fold K is +infinity
    ]
    row = df.agg(
        *[
            F.percentile(ts_dbl, F.lit(float(fr))).alias(f"c{i}")
            for i, fr in enumerate(fracs)
        ]
    ).collect()[0]
    if row["c0"] is None:
        raise ValueError("rolling_origin_folds on an empty input")
    cuts = [float(row[f"c{i}"]) for i in range(n_folds)]
    e = float(embargo_seconds)
    # chained CASE, earliest band wins: base train, then per boundary
    # an embargo band followed by the fold's own segment; the last fold
    # is open-ended
    label = F.when(ts_dbl <= F.lit(cuts[0]), F.lit(0))
    for i in range(1, n_folds + 1):
        label = label.when(ts_dbl <= F.lit(cuts[i - 1] + e), F.lit(-1))
        if i < n_folds:
            label = label.when(ts_dbl <= F.lit(cuts[i]), F.lit(i))
    label = label.otherwise(F.lit(n_folds))
    return df.withColumn(fold_col, label.cast("int"))


def resample(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    every_seconds: int,
    agg: str = "last",
    fill: str = "interpolate",
) -> DataFrame:
    """Resample an irregular per-key time series onto a regular
    ``every_seconds`` grid and fill the gaps — pandas ``resample`` /
    TimescaleDB ``time_bucket_gapfill``, engine-native. The regular-grid
    prerequisite for sequence models and rolling features over event
    streams whose raw timestamps are bursty.

    Semantics per key:

    1. each row lands in bucket ``floor(epoch(ts)/every)*every``;
    2. buckets aggregate with ``agg`` — ``"last"`` (value at the max ts
       in the bucket, ``max_by``), ``"mean"``, ``"min"``, ``"max"`` or
       ``"sum"``;
    3. every missing bucket strictly between two present buckets is
       emitted with ``filled = 1`` and its value from ``fill``:
       ``"interpolate"`` (linear between the surrounding present
       buckets, rounded to 9 decimals — engine-portable),
       ``"ffill"`` (previous present value) or ``"null"``.

    The grid spans min..max present bucket per key — no extrapolation
    beyond either end, so downstream point-in-time joins see no
    fabricated future.

    Plan (10^12-turn lens): the (key, bucket) aggregate shuffles
    map-side-combined partials (bursty buckets collapse before the
    wire); the gap window then re-hashes the already-bucket-sized
    frame on the bare key — two exchanges, but the second moves
    aggregate-sized data, which beats shuffling raw rows once (the
    repartition-by-key-first alternative loses the combine). The grid
    comes from ``sequence``-explode of each present bucket's run to
    its successor — cost proportional to OUTPUT rows, never a per-key
    driver loop or a grid cross-join. Dense keys explode at most
    ``span/every`` rows; a key with one bucket emits one row.

    Returns ``key_cols + (bucket_ts timestamp, <value_cols>..., filled
    int)`` with one row per grid point.
    """
    aggs_fns = {
        # tie-break equal timestamps by value so "last" is
        # deterministic across partitionings (max_by alone picks an
        # arbitrary row among ts ties)
        "last": lambda c: F.max_by(
            F.col(c), F.struct(F.col("__ts"), F.col(c))
        ),
        "mean": lambda c: F.avg(c),
        "min": lambda c: F.min(c),
        "max": lambda c: F.max(c),
        "sum": lambda c: F.sum(c),
    }
    if agg not in aggs_fns:
        raise ValueError(f"agg must be one of {sorted(aggs_fns)}")
    if fill not in ("interpolate", "ffill", "null"):
        raise ValueError("fill must be 'interpolate', 'ffill' or 'null'")
    if every_seconds < 1:
        raise ValueError("every_seconds must be >= 1")
    every = int(every_seconds)

    # TIMESTAMP_NTZ: hop through TIMESTAMP for the numeric epoch (UTC
    # session, session.py)
    ts_num = F.col(ts_col).cast("timestamp").cast("double")
    bucket = (F.floor(ts_num / every) * every).cast("long")
    bucketed = (
        df.select(
            *key_cols,
            ts_num.alias("__ts"),
            bucket.alias("__b"),
            *value_cols,
        )
        .groupBy(*key_cols, "__b")
        .agg(*[aggs_fns[agg](c).cast("double").alias(f"__v_{c}") for c in value_cols])
    )
    w = Window.partitionBy(*key_cols).orderBy("__b")
    nxt = bucketed.select(
        *key_cols,
        "__b",
        *[F.col(f"__v_{c}") for c in value_cols],
        F.lead("__b").over(w).alias("__nb"),
        *[F.lead(f"__v_{c}").over(w).alias(f"__nv_{c}") for c in value_cols],
    )
    # explode each present bucket's run [b, next_b) on the grid; the
    # final bucket of a key (no successor) emits exactly itself
    grid = nxt.withColumn(
        "__g",
        F.explode(
            F.sequence(
                F.col("__b"),
                F.coalesce(F.col("__nb") - every, F.col("__b")),
                F.lit(every),
            )
        ),
    )
    is_gap = F.col("__g") > F.col("__b")
    vals = []
    for c in value_cols:
        v, nv = F.col(f"__v_{c}"), F.col(f"__nv_{c}")
        if fill == "interpolate":
            gap_val = F.round(
                v + (nv - v) * (F.col("__g") - F.col("__b"))
                / (F.col("__nb") - F.col("__b")),
                9,
            )
        elif fill == "ffill":
            gap_val = v
        else:
            gap_val = F.lit(None).cast("double")
        vals.append(F.when(is_gap, gap_val).otherwise(v).alias(c))
    return grid.select(
        *key_cols,
        F.col("__g").cast("timestamp").alias("bucket_ts"),
        *vals,
        is_gap.cast("int").alias("filled"),
    )


def rolling_anomalies(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    window: int = 20,
    z_thresh: float = 3.0,
    min_periods: int = 5,
) -> DataFrame:
    """Leakage-safe rolling z-score anomaly flags: each row is scored
    against the mean/std of the ``window`` rows STRICTLY BEFORE it in
    its key's time order (frame ``[-window, -1]`` — the current value
    never contributes to its own baseline, the same zero-leakage
    discipline as ``prefix_aggregate``). The first-gate monitoring
    signal for metric streams and per-conversation feature drift.

    Rows with fewer than ``min_periods`` predecessors, or a zero/NULL
    trailing std, get ``z = NULL`` and ``is_anomaly = 0`` (a cold
    start is not an anomaly). ``z`` is rounded to 9 decimals
    (engine-portable); ties in ``ts`` are ordered by the remaining
    ``df`` columns' first key for determinism — pass a unique
    tie-break column as the last entry of ``key_cols``'s ordering via
    ``ts_col`` tuples upstream if needed.

    One window exchange on ``key_cols``; mean/std/count share one
    frame so Catalyst evaluates them in a single pass.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if min_periods < 1:
        raise ValueError("min_periods must be >= 1")
    if z_thresh <= 0:
        raise ValueError("z_thresh must be positive")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col))
        .rowsBetween(-window, -1)
    )
    v = F.col(value_col).cast("double")
    mean = F.avg(v).over(w)
    std = F.stddev_samp(v).over(w)
    n = F.count(v).over(w)
    z = F.when(
        (n >= min_periods) & std.isNotNull() & (std > 0),
        F.round((v - mean) / std, 9),
    )
    return (
        df.withColumn("trail_n", n.cast("int"))
        .withColumn("trail_mean", F.round(mean, 9))
        .withColumn("z", z)
        .withColumn(
            "is_anomaly",
            (F.abs(F.col("z")) > F.lit(float(z_thresh)))
            .cast("int"),
        )
        .fillna({"is_anomaly": 0})
    )


def future_window_label(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    event_col: str,
    horizon_seconds: float,
    out_col: str = "label",
) -> DataFrame:
    """Supervised label generation: ``label = 1`` iff any row with
    ``event_col`` truthy occurs in ``(t, t + horizon]`` within the
    key — "will this user churn / convert / abandon within H?". The
    forward-looking mirror of ``prefix_aggregate``'s rule: FEATURES
    must only look backward (zero leakage), LABELS must only look
    forward — this pairs with the point-in-time feature frame to form
    a training set where nothing crosses the cutoff in either
    direction.

    Also emits ``<out_col>_censored = 1`` when the key's LAST observed
    timestamp is inside the row's horizon: a 0-label there means "no
    event observed YET", not "no event" — train on censored rows and
    the model learns that the dataset ends, not that users stop.
    Filter on the flag (or hand such rows to :func:`~graphrole_spark.
    functions.experiment.kaplan_meier`, which models the censoring
    instead of dropping it).

    One exchange: the RANGE window (strictly-after, numeric seconds)
    and the per-key max share the hash partitioning.
    """
    if horizon_seconds <= 0:
        raise ValueError("horizon_seconds must be positive")
    # microsecond longs: RANGE frames take integer bounds, and the
    # (1, h_us) frame is EXACTLY "strictly after t, within horizon"
    h_us = int(round(float(horizon_seconds) * 1_000_000))
    out = df.withColumn(
        "__ts_us", F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    wk = Window.partitionBy(*key_cols)
    w = wk.orderBy("__ts_us").rangeBetween(1, h_us)
    ev = F.col(event_col).cast("int")
    label = F.coalesce(F.max(ev).over(w), F.lit(0))
    censored = (
        F.col("__ts_us") + F.lit(h_us) > F.max("__ts_us").over(wk)
    ).cast("int")
    return (
        out.withColumn(out_col, label)
        .withColumn(f"{out_col}_censored", censored)
        .drop("__ts_us")
    )


def baseline_forecast_eval(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    season_lag: int = 7,
) -> DataFrame:
    """Forecasting-baseline scorecard per key: the two no-model
    forecasters every real model must beat (Hyndman & Koehler 2006),
    evaluated one-step-ahead in time order:

    * ``mae_naive`` — mean |v_t − v_{t−1}| (random-walk forecast);
    * ``mae_snaive`` — mean |v_t − v_{t−season_lag}| (seasonal naive);
    * ``mase_snaive`` — ``mae_snaive / mae_naive`` — the seasonal
      baseline in MASE units (< 1 ⇒ the series IS seasonal at this
      lag and any model should be held to the seasonal bar, not the
      naive one). NULL when a denominator is 0/undefined (constant or
      too-short series), never a fabricated number.

    A model's own per-key MAE divided by ``mae_naive`` is its MASE;
    join this frame to the model's errors on the key. ROW lag, not
    time lag — resample first (:func:`resample`) if the series is
    irregular and calendar seasonality is meant.

    One window exchange (both lags share the sort) + one per-key
    aggregate on the same partitioning.
    """
    if season_lag < 2:
        raise ValueError("season_lag must be >= 2 (1 is the naive lag)")
    v = F.col(value_col).cast("double")
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col))
    errs = df.select(
        *key_cols,
        F.abs(v - F.lag(v, 1).over(w)).alias("__e1"),
        F.abs(v - F.lag(v, int(season_lag)).over(w)).alias("__es"),
    )
    mae_naive = F.avg("__e1")
    mae_snaive = F.avg("__es")
    return errs.groupBy(*key_cols).agg(
        F.count("__e1").cast("long").alias("n_naive"),
        F.count("__es").cast("long").alias("n_snaive"),
        F.round(mae_naive, 9).alias("mae_naive"),
        F.round(mae_snaive, 9).alias("mae_snaive"),
        F.round(
            F.when(mae_naive > 0, mae_snaive / mae_naive), 9
        ).alias("mase_snaive"),
    )
