"""Reward-data preparation for RL post-training (GRPO / rejection
sampling) over scored candidate groups.

Modern RLHF-without-a-critic recipes (GRPO, DeepSeekMath 2024; RFT /
best-of-n rejection sampling) sample G candidate responses per prompt,
score each with a reward model, and train on the GROUP-RELATIVE signal:
``advantage_i = (r_i - mean(group)) / std(group)``. The data-pipeline
side of that is a pure dataflow problem — normalize scores within
prompt groups, rank candidates, and materialize the best-of-n winners —
and belongs in the corpus engine, not the trainer.

Everything here is windows over one group-key exchange: no joins, no
Python, fully SQL-expressible (DuckDB value parity pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_advantages(
    samples: DataFrame,
    group_col: str = "group_id",
    score_col: str = "score",
    order_col: str | None = None,
    eps: float = 1e-4,
    round_to: int = 6,
) -> DataFrame:
    """Group-relative advantage normalization (the GRPO objective's
    data side): per ``group_col`` group, whiten ``score_col`` to
    ``(score - mean) / (std + eps)`` and rank candidates best-first.

    Input: one row per (prompt group, candidate sample) with a numeric
    reward/score column. Output: every input column plus

    - ``group_n``: number of SCORED samples in the group (NULL scores
      don't count — they get NULL advantage/rank and dilute nothing);
    - ``group_mean`` / ``group_std``: population moments of the scored
      samples (population, not sample — matches ``np.std`` and the
      GRPO reference implementations; a 1-sample group has std 0);
    - ``advantage``: ``(score - group_mean) / (group_std + eps)``,
      rounded to ``round_to`` decimals for engine portability. The
      ``eps`` in the DENOMINATOR (not a guard) is the reference
      formulation: a zero-variance group (all candidates equally
      good) gets advantage exactly 0 for every member, not NULL —
      those groups carry no training signal and downstream filters
      drop them by ``group_std == 0``;
    - ``rank_in_group``: 1 = best score; ties broken by ``order_col``
      ascending (required for deterministic output when provided;
      otherwise ties share a rank via ``rank()`` and the output is
      still deterministic);
    - ``is_best``: rank 1 flag — ``where(is_best == 1)`` IS
      rejection-sampling / best-of-n materialization.

    Plan: two window families (moments, ranking) over the SAME
    ``group_col`` partitioning — ONE exchange, no joins, no Python.
    """
    if eps <= 0:
        raise ValueError("eps must be > 0 (it is the GRPO denominator)")
    w = Window.partitionBy(group_col)
    score = F.col(score_col).cast("double")
    scored = F.when(score.isNotNull(), 1)
    group_n = F.count(score).over(w)
    mean = F.avg(score).over(w)
    # population std via stddev_pop: both Spark and DuckDB implement
    # Welford-style single-pass population variance
    std = F.stddev_pop(score).over(w)
    if order_col is not None:
        w_rank = Window.partitionBy(group_col).orderBy(
            score.desc_nulls_last(), F.col(order_col).asc()
        )
        rank: Column = F.row_number().over(w_rank)
    else:
        w_rank = Window.partitionBy(group_col).orderBy(score.desc_nulls_last())
        rank = F.rank().over(w_rank)
    rank = F.when(score.isNotNull(), rank)
    adv = F.round((score - mean) / (std + F.lit(eps)), round_to)
    return samples.select(
        "*",
        group_n.cast("long").alias("group_n"),
        F.round(mean, round_to).alias("group_mean"),
        F.round(std, round_to).alias("group_std"),
        F.when(score.isNotNull(), adv).alias("advantage"),
        rank.cast("int").alias("rank_in_group"),
        F.coalesce((rank == 1).cast("int"), F.lit(0)).alias("is_best"),
    )
