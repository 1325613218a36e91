"""Ordered-step funnel analysis over event streams — "of the users who
did A, how many then did B, then C, and how fast" — the standard
product/agent-behavior conversion query (ClickHouse ``windowFunnel``,
Amplitude funnels), engine-native and leakage-free (each step's
timestamp is the earliest one at-or-after the previous step's).

Construction (the one-shuffle trick): sort each key's events once;
``m1`` = running min ts of step-1 rows; a step-2 row *qualifies* when
``m1`` is already set (the running window guarantees ``m1 ≤ ts``), so
``m2`` = running min ts of qualifying step-2 rows, and so on — k
chained running-min window columns over ONE sort, each referencing the
previous projection. Because running mins are non-increasing, the
per-key minimum of each column is the funnel's step timestamp. The
final groupBy reuses the window's hash partitioning, so the whole
operator is one exchange + one sort regardless of k.

Scale notes: no self-joins (the naive k-way join funnel shuffles the
event table k times), no per-row Python, no driver state. Skewed keys
cost one sort of their own rows — bounded by the key's event count,
same exposure as every sessionization.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    step_col: str,
    steps: Sequence[str],
    within_seconds: Optional[float] = None,
) -> DataFrame:
    """Per-key funnel timestamps for an ordered ``steps`` sequence.

    Step 1's timestamp is the key's earliest ``steps[0]`` event; step
    ``i``'s is the earliest ``steps[i-1]`` event at-or-after step
    ``i-1``'s timestamp (ties at equal ts count as progression — an
    event can even complete two steps at one timestamp, matching
    ClickHouse ``windowFunnel`` defaults). ``within_seconds`` bounds
    the WHOLE funnel: steps beyond the first only count within
    ``t1 + within_seconds``.

    Returns one row per key that performed step 1:
    ``key_cols + (t_1 .. t_k timestamps, steps_completed int)``.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError("steps must be distinct")
    if within_seconds is not None and within_seconds <= 0:
        raise ValueError("within_seconds must be positive")

    ts_num = F.col(ts_col).cast("timestamp").cast("double")
    # deterministic tie order at equal ts: earlier funnel steps sort
    # first (prio = step index, non-step rows last), so "an event at
    # the same timestamp as its predecessor counts as progression" is
    # a GUARANTEE, not an accident of the shuffle's tie order
    prio = F.lit(len(steps))
    for i, s_ in reversed(list(enumerate(steps))):
        prio = F.when(F.col(step_col) == s_, F.lit(i)).otherwise(prio)
    base = events.select(
        *key_cols,
        ts_num.alias("__ts"),
        F.col(step_col).alias("__step"),
        prio.alias("__prio"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__ts", "__prio")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = base
    prev = None
    for i, s in enumerate(steps, start=1):
        cond = F.col("__step") == s
        if i > 1:
            cond = cond & F.col(f"__m{i-1}").isNotNull()
            if within_seconds is not None:
                cond = cond & (
                    F.col("__ts") <= F.col("__m1") + F.lit(float(within_seconds))
                )
        out = out.withColumn(
            f"__m{i}", F.min(F.when(cond, F.col("__ts"))).over(w)
        )
        prev = f"__m{i}"
    agged = out.groupBy(*key_cols).agg(
        *[F.min(f"__m{i}").alias(f"__t{i}") for i in range(1, len(steps) + 1)]
    )
    completed = sum(
        F.col(f"__t{i}").isNotNull().cast("int")
        for i in range(1, len(steps) + 1)
    )
    return agged.where(F.col("__t1").isNotNull()).select(
        *key_cols,
        *[
            F.col(f"__t{i}").cast("timestamp").alias(f"t_{i}")
            for i in range(1, len(steps) + 1)
        ],
        completed.alias("steps_completed"),
    )


def funnel_summary(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    step_col: str,
    steps: Sequence[str],
    within_seconds: Optional[float] = None,
) -> DataFrame:
    """Per-step conversion table over :func:`funnel`'s per-key frame:
    ``(step_idx, step, n_keys, frac_of_step1, frac_of_prev,
    median_seconds_from_step1)`` — medians are exact
    (``percentile``, fine: the input is one row per key×step, already
    two aggregation levels below the event stream). One extra tiny
    aggregate + window over k rows."""
    per_key = funnel(
        events, key_cols, ts_col, step_col, steps, within_seconds
    )
    k = len(list(steps))
    pieces = []
    for i, s in enumerate(list(steps), start=1):
        ti = F.col(f"t_{i}").cast("timestamp").cast("double")
        t1 = F.col("t_1").cast("timestamp").cast("double")
        pieces.append(
            F.struct(
                F.lit(i).alias("step_idx"),
                F.lit(s).alias("step"),
                F.sum(ti.isNotNull().cast("long")).alias("n_keys"),
                F.round(
                    F.percentile(
                        F.when(ti.isNotNull(), ti - t1), F.lit(0.5)
                    ),
                    3,
                ).alias("median_seconds_from_step1"),
            )
        )
    row = per_key.agg(F.array(*pieces).alias("__a")).select(
        F.inline("__a")
    )
    wprev = Window.orderBy("step_idx")  # k rows — bounded window
    return row.select(
        "step_idx",
        "step",
        "n_keys",
        F.round(
            F.col("n_keys") / F.first("n_keys").over(
                wprev.rowsBetween(Window.unboundedPreceding, 0)
            ),
            6,
        ).alias("frac_of_step1"),
        F.round(
            F.col("n_keys")
            / F.lag("n_keys", 1).over(wprev),
            6,
        ).alias("frac_of_prev"),
        "median_seconds_from_step1",
    )
