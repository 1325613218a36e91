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


def bt_leaderboard(
    battles: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    n_iter: int = 30,
    reg: float = 0.1,
    base: float = 1000.0,
    scale: float = 400.0,
    mode: str = "auto",
    driver_max_pairs: int = 2_000_000,
) -> DataFrame:
    """Bradley-Terry strength fit over pairwise battle outcomes — the
    arena-style leaderboard (Chatbot Arena / reward-model preference
    audits): given one row per comparison ``(winner, loser)``, estimate
    per-item strengths ``π_i`` maximizing the regularized likelihood
    ``Π π_w / (π_w + π_l)`` via Hunter's (2004) MM algorithm, the
    standard monotone-convergent fixed point::

        π_i ← (W_i + λ) / ( Σ_j n_ij / (π_i + π_j)  +  2λ / (π_i + 1) )

    with ``W_i`` = wins of i, ``n_ij`` = battles between i and j, and
    ``λ = reg`` pseudo-wins-and-losses against a virtual opponent of
    FIXED strength 1 — the regularizer that keeps never-losing (or
    never-winning) items finite, makes disconnected comparison graphs
    identifiable, and pins the scale (so no per-sweep renormalization
    is needed — the sweep converges straight to the regularized MLE).
    Init π = 1, synchronous (Jacobi) sweeps — deterministic, no RNG.

    Output: one row per item — ``item``, ``strength`` (fitted π),
    ``rating`` (Elo-scaled ``base + scale·log10(π)``), ``n_wins`` /
    ``n_losses`` / ``n_battles``; best first, item tie-break.

    Distribution (100 TB lens): battles collapse ONCE to the
    ``(i, j, n_ij)`` pair-count frame (map-side combined). When that
    frame is small (≤ ``driver_max_pairs``, counted exactly — real
    leaderboards compare thousands of models, not billions), the MM
    sweeps run driver-side over the collected pair counts (the RolX
    MDL-grid pattern: tiny exact core, distributed reduction feeding
    it). Above the budget — an items-scale comparison graph — the same
    Jacobi sweep runs distributed: one item-keyed join of π onto the
    pair frame per sweep + one item-keyed aggregate, π
    localCheckpointed per sweep so lineage is O(1) in ``n_iter`` (the
    NMF-loop pattern). Both paths compute bit-identical sweeps
    (parity-tested).
    """
    if reg <= 0:
        raise ValueError("reg must be > 0 (identifiability regularizer)")
    if mode not in ("auto", "driver", "distributed"):
        raise ValueError("mode must be 'auto', 'driver' or 'distributed'")
    w = F.col(winner_col).cast("string")
    l = F.col(loser_col).cast("string")
    outcomes = battles.select(w.alias("__w"), l.alias("__l"))

    # one row per ordered (item, opp): wins of item over opp; the union
    # with zero rows guarantees every item appears in both directions.
    # The null/self-battle validity predicates are row-local in the
    # GROUP KEYS, so they commute with the aggregate: filtering the
    # handful of post-agg groups is bit-identical to filtering the raw
    # stream. The checkpoint sits BETWEEN the aggregate and the filter,
    # deliberately: without the barrier Catalyst pushes the predicate
    # through the aggregate AND below the caller's projection, so the
    # winner/loser expression trees are evaluated once for the filter
    # and again for the keys (measured 5x the whole scan+aggregate on
    # an md5-synthesized battles frame). Checkpointing also feeds the
    # zero-fill union below, which references `directed` twice.
    directed = (
        outcomes.groupBy(
            F.col("__w").alias("item"), F.col("__l").alias("opp")
        )
        .agg(F.count(F.lit(1)).alias("n_wl"))
        .localCheckpoint()
        .where(
            F.col("item").isNotNull()
            & F.col("opp").isNotNull()
            & (F.col("item") != F.col("opp"))
        )
    )
    pairs = (
        directed.select("item", "opp", "n_wl")
        .unionByName(
            directed.select(
                F.col("opp").alias("item"),
                F.col("item").alias("opp"),
                F.lit(0).alias("n_wl"),
            )
        )
        .groupBy("item", "opp")
        .agg(F.sum("n_wl").alias("n_ij_wins"))
        .localCheckpoint()
    )
    spark = battles.sparkSession
    lam = float(reg)
    sweeps = max(int(n_iter), 1)

    n_pairs = pairs.count()
    if mode == "driver" or (mode == "auto" and n_pairs <= driver_max_pairs):
        rows = pairs.collect()
        wins: dict = {}
        n_ij: dict = {}
        for r in rows:
            wins[r["item"]] = wins.get(r["item"], 0) + r["n_ij_wins"]
            key = (r["item"], r["opp"])
            rev = (r["opp"], r["item"])
            n_ij[key] = n_ij.get(key, 0) + r["n_ij_wins"]
            n_ij[rev] = n_ij.get(rev, 0) + r["n_ij_wins"]
        by_item: dict = {}
        for (i, j), n in n_ij.items():
            by_item.setdefault(i, []).append((j, n))
        pi = {i: 1.0 for i in wins}
        for _ in range(sweeps):
            pi = {
                i: (wins[i] + lam)
                / (
                    sum(n / (pi[i] + pi[j]) for j, n in by_item[i])
                    + 2.0 * lam / (pi[i] + 1.0)
                )
                for i in pi
            }
        import math as _math

        out_rows = [
            (
                i,
                float(p),
                float(base + scale * _math.log10(p)),
                int(wins[i]),
            )
            for i, p in pi.items()
        ]
        fitted = spark.createDataFrame(
            out_rows, schema="item string, strength double, rating double, n_wins long"
        )
    else:
        n_ij_df = (
            pairs.select("item", "opp", F.col("n_ij_wins").alias("n"))
            .unionByName(
                pairs.select(
                    F.col("opp").alias("item"),
                    F.col("item").alias("opp"),
                    F.col("n_ij_wins").alias("n"),
                )
            )
            .groupBy("item", "opp")
            .agg(F.sum("n").alias("n_ij"))
            .localCheckpoint()
        )
        wins_df = pairs.groupBy("item").agg(
            F.sum("n_ij_wins").alias("n_wins")
        ).localCheckpoint()
        pi = wins_df.select("item", F.lit(1.0).alias("pi"))
        for _ in range(sweeps):
            opp_pi = pi.select(
                F.col("item").alias("opp"), F.col("pi").alias("opp_pi")
            )
            denom = (
                n_ij_df.join(pi, "item")
                .join(opp_pi, "opp")
                .groupBy("item")
                .agg(
                    F.sum(
                        F.col("n_ij") / (F.col("pi") + F.col("opp_pi"))
                    ).alias("d")
                )
            )
            pi = (
                wins_df.join(denom, "item")
                .join(pi, "item")
                .select(
                    "item",
                    (
                        (F.col("n_wins") + F.lit(lam))
                        / (
                            F.col("d")
                            + F.lit(2.0 * lam) / (F.col("pi") + 1.0)
                        )
                    ).alias("pi"),
                )
                .localCheckpoint()
            )
        fitted = pi.join(wins_df, "item").select(
            "item",
            F.col("pi").alias("strength"),
            (F.lit(base) + F.lit(scale) * F.log10("pi")).alias("rating"),
            F.col("n_wins").cast("long").alias("n_wins"),
        )

    # losses fall out of the already-materialized pair-count frame
    # (losses of i = Σ_j wins of j over i): re-aggregating the raw
    # battles stream here would re-run the full upstream scan a second
    # time for a count the localCheckpointed `pairs` rows carry exactly
    losses = pairs.groupBy(F.col("opp").alias("item")).agg(
        F.sum("n_ij_wins").alias("n_losses")
    )
    return (
        fitted.join(losses, "item", "left")
        .select(
            "item",
            "strength",
            "rating",
            F.col("n_wins").cast("long").alias("n_wins"),
            F.coalesce(F.col("n_losses"), F.lit(0))
            .cast("long")
            .alias("n_losses"),
            (F.col("n_wins") + F.coalesce(F.col("n_losses"), F.lit(0)))
            .cast("long")
            .alias("n_battles"),
        )
        .orderBy(F.desc("rating"), F.asc("item"))
    )
