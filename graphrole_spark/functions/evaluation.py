"""Label-quality and model-evaluation operators — the adjudication layer
of a training-data pipeline.

Every upstream operator in this engine *produces* data (dedup keeps,
quality scores, preference pairs, retrieval candidates); this module
*evaluates* it:

- ``majority_vote`` / ``fleiss_kappa``: aggregate multi-annotator labels
  into a consensus label with agreement statistics, and measure corpus
  inter-annotator agreement (Fleiss 1971, generalized to variable
  raters-per-item) — the first gate on any human-labeled SFT/RLHF set.
- ``dawid_skene``: EM truth inference with per-annotator confusion
  matrices (Dawid & Skene 1979) — upweights reliable annotators and
  recovers the truth when majority vote is fooled by a noisy or
  adversarial rater.
- ``retrieval_metrics``: per-query precision/recall@k, MRR, MAP and
  nDCG against a qrels table — closes the loop on ``bm25_topk`` and the
  ANN operators.
- ``binary_metrics``: rank-based ROC-AUC (tie-corrected Mann-Whitney),
  Brier score, expected calibration error and thresholded
  accuracy/precision/recall/F1 — closes the loop on the Naive-Bayes
  quality classifier and any reward-model score column.

Design: everything except the Dawid-Skene EM loop is a fixed dataflow of
hash aggregations and windows (fully SQL-expressible; DuckDB value
parity pytest-pinned). Dawid-Skene is the one iterative operator: each
EM step is two joins + two aggregations over ``(item, class)`` /
``(worker, class, label)`` long frames — the label vocabulary K is the
only driver-collected object (label vocabularies are tens, never
millions), items and workers stay distributed, and the posterior frame
is localCheckpoint-truncated per iteration so the plan never grows with
``n_iter``. At 100 TB the E/M shuffles are keyed by item and
(worker, class, label) respectively — both well-spread keys — and only
``(id, class, double)`` rows ever reach an exchange.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "majority_vote",
    "fleiss_kappa",
    "dawid_skene",
    "retrieval_metrics",
    "binary_metrics",
]


# ---------------------------------------------------------------------------
# Annotation aggregation
# ---------------------------------------------------------------------------


def _label_counts(
    annotations: DataFrame, item_col: str, label_col: str
) -> DataFrame:
    """(item, label, n) with NULL labels dropped (an abstention, not a
    vote) — the shared contingency table for vote/kappa/DS-init."""
    return (
        annotations.where(F.col(label_col).isNotNull())
        .groupBy(F.col(item_col).alias("item"), F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def majority_vote(
    annotations: DataFrame,
    item_col: str = "item_id",
    worker_col: str = "worker_id",
    label_col: str = "label",
) -> DataFrame:
    """Per-item consensus label with agreement statistics.

    Input: one row per (item, worker) vote. NULL labels are abstentions
    and are ignored. Output: one row per item that received >=1 vote —

    - ``label``: the modal label; ties break to the lexicographically
      smallest tied label (deterministic, engine-portable);
    - ``n_votes`` / ``n_distinct_labels``;
    - ``agreement``: modal count / n_votes (1.0 = unanimous);
    - ``margin``: (modal - runner-up count) / n_votes (0.0 = exact tie).

    Shape: one (item, label) hash aggregate (map-side combined) + one
    item-keyed window over the contingency rows — votes-per-item rows,
    never raw-vote rows, cross the second exchange.
    """
    counts = _label_counts(annotations, item_col, label_col)
    w = Window.partitionBy("item")
    ranked = counts.select(
        "item",
        "label",
        "n",
        F.row_number()
        .over(w.orderBy(F.desc("n"), F.asc("label")))
        .alias("__rn"),
        F.sum("n").over(w).alias("n_votes"),
        F.count(F.lit(1)).over(w).alias("n_distinct_labels"),
        F.lead("n")
        .over(w.orderBy(F.desc("n"), F.asc("label")))
        .alias("__runner_up"),
    )
    return (
        ranked.where(F.col("__rn") == 1)
        .select(
            F.col("item").alias(item_col),
            F.col("label").alias(label_col),
            "n_votes",
            "n_distinct_labels",
            (F.col("n") / F.col("n_votes")).alias("agreement"),
            (
                (F.col("n") - F.coalesce(F.col("__runner_up"), F.lit(0)))
                / F.col("n_votes")
            ).alias("margin"),
        )
        .orderBy(item_col)
    )


def fleiss_kappa(
    annotations: DataFrame,
    item_col: str = "item_id",
    worker_col: str = "worker_id",
    label_col: str = "label",
) -> DataFrame:
    """Corpus-level inter-annotator agreement (Fleiss' kappa),
    generalized to a variable number of raters per item: items with
    n_i >= 2 votes contribute ``P_i = (Σ_k n_ik² − n_i)/(n_i(n_i−1))``;
    expected agreement uses the pooled label marginals over those same
    items. Returns ONE row: ``kappa``, ``p_bar`` (observed), ``p_e``
    (chance), ``n_items``, ``n_votes``.

    kappa = 1 is perfect agreement, 0 is chance-level, < 0 is worse than
    chance. Two hash aggregates over the (item, label) contingency —
    nothing item-sized reaches the driver.
    """
    counts = _label_counts(annotations, item_col, label_col)
    per_item = counts.groupBy("item").agg(
        F.sum("n").alias("n_i"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    rated = per_item.where(F.col("n_i") >= 2)
    p_bar = rated.agg(
        F.avg(
            (F.col("ss") - F.col("n_i"))
            / (F.col("n_i") * (F.col("n_i") - F.lit(1)))
        ).alias("p_bar"),
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_i").alias("n_votes"),
    )
    marginals = (
        counts.join(rated.select("item"), "item", "left_semi")
        .groupBy("label")
        .agg(F.sum("n").alias("nk"))
    )
    p_e = marginals.agg(
        (
            F.sum(F.col("nk") * F.col("nk"))
            / (F.sum("nk") * F.sum("nk"))
        ).alias("p_e")
    )
    return p_bar.crossJoin(p_e).select(
        ((F.col("p_bar") - F.col("p_e")) / (F.lit(1.0) - F.col("p_e"))).alias(
            "kappa"
        ),
        "p_bar",
        "p_e",
        "n_items",
        "n_votes",
    )


def dawid_skene(
    annotations: DataFrame,
    item_col: str = "item_id",
    worker_col: str = "worker_id",
    label_col: str = "label",
    n_iter: int = 10,
    alpha: float = 0.01,
) -> tuple[DataFrame, DataFrame]:
    """Dawid-Skene (1979) EM truth inference over multi-annotator labels.

    Model: each item has a latent true class c; annotator w reports
    label l with probability ``π_w[c, l]`` (a per-worker confusion
    matrix); classes have prior ``p(c)``. EM alternates

    - E-step: ``P(c | item) ∝ p(c) · Π_votes π_w[c, l]`` (log-space,
      per-item softmax);
    - M-step: ``π_w[c, l] ∝ Σ_items P(c|item)·1[w voted l]`` with add-α
      smoothing over the full label vocabulary, and
      ``p(c) = mean_item P(c|item)``.

    Initialization is the per-item vote proportion (the standard DS
    init), so the whole fit is deterministic — no RNG. NULL labels are
    ignored. Returns ``(assignments, workers)``:

    - ``assignments``: one row per item — ``<label_col>`` (posterior
      argmax, ties to the smallest class), ``confidence`` (posterior
      mass of the winner), ``posterior_entropy`` (nats);
    - ``workers``: one row per annotator — ``est_accuracy``
      (prior-weighted diagonal of the fitted confusion matrix),
      ``n_votes``.

    Distribution: the label vocabulary (K classes) is the ONLY
    driver-collected object; items/workers stay distributed end-to-end.
    Per iteration: one item-keyed join + softmax window (E) and one
    (worker, class, label)-keyed aggregate (M); every shuffled row is
    ``(id, class, double)``. The posterior frame is localCheckpointed
    each iteration, so lineage stays O(1) in ``n_iter`` (the NMF-loop
    pattern, roles/nmf_dist.py).
    """
    ann = (
        annotations.where(F.col(label_col).isNotNull())
        .select(
            F.col(item_col).alias("item"),
            F.col(worker_col).alias("worker"),
            F.col(label_col).alias("label"),
        )
    )
    classes = [
        r[0] for r in ann.select("label").distinct().orderBy("label").collect()
    ]
    if not classes:
        empty_items = ann.select(
            F.col("item").alias(item_col),
            F.col("label").alias(label_col),
            F.lit(0.0).alias("confidence"),
            F.lit(0.0).alias("posterior_entropy"),
        ).limit(0)
        empty_workers = ann.select(
            F.col("worker").alias(worker_col),
            F.lit(0.0).alias("est_accuracy"),
            F.lit(0).cast("long").alias("n_votes"),
        ).limit(0)
        return empty_items, empty_workers
    k = len(classes)
    spark = annotations.sparkSession
    classes_df = spark.createDataFrame(
        [(c,) for c in classes], schema=ann.select("label").schema
    ).withColumnRenamed("label", "class")

    # Init posteriors = per-item vote proportions over the full class
    # grid (zero-mass classes included so the M-step sees the grid).
    counts = ann.groupBy("item", "label").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.groupBy("item").agg(F.sum("n").alias("n_i"))
    post = (
        tot.crossJoin(F.broadcast(classes_df))
        .join(
            counts.withColumnRenamed("label", "class"),
            ["item", "class"],
            "left",
        )
        .select(
            "item",
            "class",
            (F.coalesce(F.col("n"), F.lit(0)) / F.col("n_i")).alias("p"),
        )
        .localCheckpoint()
    )

    item_w = Window.partitionBy("item")
    for _ in range(max(int(n_iter), 1)):
        # M-step: smoothed confusion π_w[c, l] and class priors p(c).
        m = ann.join(post, "item").groupBy("worker", "class", "label").agg(
            F.sum("p").alias("cnt")
        )
        den = m.groupBy("worker", "class").agg(
            (F.sum("cnt") + F.lit(alpha * k)).alias("den")
        )
        conf = m.join(den, ["worker", "class"]).select(
            "worker",
            "class",
            "label",
            (F.log(F.col("cnt") + F.lit(alpha)) - F.log("den")).alias("logp"),
        )
        priors = post.groupBy("class").agg(F.avg("p").alias("prior"))

        # E-step: per-(vote, class) log-likelihoods; votes on labels a
        # worker-class pair never produced take the smoothed-zero mass
        # log(α) − log(den); a (worker, class) pair with no mass at all
        # degenerates to the uniform −log K. Softmax per item.
        annk = ann.crossJoin(F.broadcast(classes_df))
        scored = (
            annk.join(conf, ["worker", "class", "label"], "left")
            .join(den, ["worker", "class"], "left")
            .select(
                "item",
                "class",
                F.coalesce(
                    F.col("logp"),
                    F.log(F.lit(alpha))
                    - F.log(F.coalesce(F.col("den"), F.lit(alpha * k))),
                ).alias("logp"),
            )
            .groupBy("item", "class")
            .agg(F.sum("logp").alias("ll"))
            .join(F.broadcast(priors), "class")
            .select(
                "item", "class", (F.col("ll") + F.log("prior")).alias("score")
            )
        )
        expd = scored.select(
            "item",
            "class",
            F.exp(F.col("score") - F.max("score").over(item_w)).alias("e"),
        )
        post = expd.select(
            "item",
            "class",
            (F.col("e") / F.sum("e").over(item_w)).alias("p"),
        ).localCheckpoint()

    pick = Window.partitionBy("item").orderBy(F.desc("p"), F.asc("class"))
    assignments = (
        post.select(
            "item",
            "class",
            "p",
            F.row_number().over(pick).alias("__rn"),
            F.sum(
                F.when(
                    F.col("p") > 0, -F.col("p") * F.log("p")
                ).otherwise(F.lit(0.0))
            )
            .over(item_w)
            .alias("posterior_entropy"),
        )
        .where(F.col("__rn") == 1)
        .select(
            F.col("item").alias(item_col),
            F.col("class").alias(label_col),
            F.col("p").alias("confidence"),
            "posterior_entropy",
        )
        .orderBy(item_col)
    )

    # Worker quality: prior-weighted diagonal of the fitted confusion.
    m = ann.join(post, "item").groupBy("worker", "class", "label").agg(
        F.sum("p").alias("cnt")
    )
    den = m.groupBy("worker", "class").agg(
        (F.sum("cnt") + F.lit(alpha * k)).alias("den")
    )
    priors = post.groupBy("class").agg(F.avg("p").alias("prior"))
    diag = (
        m.where(F.col("class") == F.col("label"))
        .join(den, ["worker", "class"])
        .select(
            "worker",
            "class",
            ((F.col("cnt") + F.lit(alpha)) / F.col("den")).alias("pi_cc"),
        )
    )
    grid = (
        ann.select("worker")
        .distinct()
        .crossJoin(F.broadcast(priors.withColumnRenamed("class", "__c")))
        .join(
            diag.withColumnRenamed("class", "__c"),
            ["worker", "__c"],
            "left",
        )
        .groupBy("worker")
        .agg(
            F.sum(
                F.col("prior")
                * F.coalesce(F.col("pi_cc"), F.lit(1.0 / k))
            ).alias("est_accuracy")
        )
    )
    votes = ann.groupBy("worker").agg(F.count(F.lit(1)).alias("n_votes"))
    workers = (
        grid.join(votes, "worker")
        .select(
            F.col("worker").alias(worker_col), "est_accuracy", "n_votes"
        )
        .orderBy(worker_col)
    )
    return assignments, workers


# ---------------------------------------------------------------------------
# Retrieval evaluation
# ---------------------------------------------------------------------------


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    grade_col: str = "grade",
    rank_col: str | None = None,
) -> DataFrame:
    """Per-query ranking metrics against a relevance-judgment table.

    ``results``: (query, doc, score) candidate rankings (e.g. the
    output of ``bm25_topk`` or ``ivf_topk``); if ``rank_col`` is given
    it is trusted, otherwise rank = score desc with doc-id tie-break.
    ``qrels``: (query, doc, grade) judgments; grade > 0 means relevant,
    graded values feed nDCG (``gain = 2^grade − 1``).

    Output: one row per query THAT HAS >=1 RELEVANT JUDGMENT (the
    trec_eval convention — queries with no relevant docs are skipped,
    queries the ranker returned nothing for score 0):

    - ``n_rel``: relevant docs judged for the query;
    - ``precision_at_k`` / ``recall_at_k``;
    - ``rr_at_k``: reciprocal rank of the first relevant hit (0 if none
      in the top k) — average for MRR;
    - ``ap_at_k``: average precision (Σ P@i over relevant positions
      ≤ k, / min(n_rel, k)) — average for MAP;
    - ``ndcg_at_k``: DCG@k / ideal-DCG@k with the exponential gain.

    Shape: one query-keyed ranking window over results, one over qrels
    (ideal ranking), one (query, doc) equi-join, two query-keyed
    aggregates. Judgment tables are small relative to the corpus — at
    scale the join broadcasts qrels.
    """
    if rank_col is None:
        rw = Window.partitionBy(query_col).orderBy(
            F.desc(score_col), F.asc(doc_col)
        )
        ranked = results.select(
            F.col(query_col).alias("q"),
            F.col(doc_col).alias("d"),
            F.row_number().over(rw).alias("r"),
        )
    else:
        ranked = results.select(
            F.col(query_col).alias("q"),
            F.col(doc_col).alias("d"),
            F.col(rank_col).cast("int").alias("r"),
        )
    ranked = ranked.where(F.col("r") <= k)

    j = qrels.select(
        F.col(query_col).alias("q"),
        F.col(doc_col).alias("d"),
        F.col(grade_col).cast("double").alias("g"),
    ).where(F.col("g") > 0)

    # Per-query totals + ideal DCG from the judgments alone.
    iw = Window.partitionBy("q").orderBy(F.desc("g"), F.asc("d"))
    ideal = (
        j.select("q", "g", F.row_number().over(iw).alias("ir"))
        .groupBy("q")
        .agg(
            F.count(F.lit(1)).alias("n_rel"),
            F.sum(
                F.when(
                    F.col("ir") <= k,
                    (F.pow(F.lit(2.0), F.col("g")) - 1)
                    / F.log2(F.col("ir") + 1),
                ).otherwise(F.lit(0.0))
            ).alias("idcg"),
        )
    )

    hits = ranked.join(j, ["q", "d"], "left").select(
        "q",
        "r",
        F.coalesce(F.col("g"), F.lit(0.0)).alias("g"),
        (F.col("g") > 0).cast("int").alias("rel"),
    )
    cum = Window.partitionBy("q").orderBy("r").rowsBetween(
        Window.unboundedPreceding, 0
    )
    per_q = (
        hits.select(
            "q",
            "r",
            "g",
            "rel",
            (F.sum("rel").over(cum) / F.col("r")).alias("p_at_r"),
        )
        .groupBy("q")
        .agg(
            F.sum("rel").alias("n_hit"),
            F.sum(
                (F.pow(F.lit(2.0), F.col("g")) - 1) / F.log2(F.col("r") + 1)
            ).alias("dcg"),
            F.min(F.when(F.col("rel") == 1, F.col("r"))).alias("first_rel"),
            F.sum(
                F.when(F.col("rel") == 1, F.col("p_at_r")).otherwise(
                    F.lit(0.0)
                )
            ).alias("sum_prec"),
        )
    )
    return (
        ideal.join(per_q, "q", "left")
        .select(
            F.col("q").alias(query_col),
            "n_rel",
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(float(k))).alias(
                "precision_at_k"
            ),
            (
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_rel")
            ).alias("recall_at_k"),
            F.coalesce(
                F.lit(1.0) / F.col("first_rel"), F.lit(0.0)
            ).alias("rr_at_k"),
            (
                F.coalesce(F.col("sum_prec"), F.lit(0.0))
                / F.least(F.col("n_rel"), F.lit(k)).cast("double")
            ).alias("ap_at_k"),
            F.when(F.col("idcg") > 0, F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"))
            .otherwise(F.lit(0.0))
            .alias("ndcg_at_k"),
        )
        .orderBy(query_col)
    )


# ---------------------------------------------------------------------------
# Binary classifier / reward-score evaluation
# ---------------------------------------------------------------------------


def binary_metrics(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    by: str | None = None,
    threshold: float = 0.5,
    bins: int = 10,
) -> DataFrame:
    """Threshold-free and thresholded quality of a binary scorer.

    Input: one row per example with a {0, 1} label and a numeric score
    (NULL label or score rows are dropped). Output: ONE row (or one per
    ``by`` group) —

    - ``auc``: ROC-AUC via the tie-corrected Mann-Whitney rank statistic
      (ties get the average rank, exactly like scipy's rankdata) —
      valid for ANY score scale, not just probabilities; degenerate
      groups (single-class) yield NULL;
    - ``brier`` and ``ece`` (expected calibration error over ``bins``
      equal-width probability bins): meaningful when the score is a
      probability in [0, 1] — scores are clamped into the bin grid;
    - ``accuracy`` / ``precision`` / ``recall`` / ``f1`` at
      ``threshold`` (predict positive iff score >= threshold); empty
      denominators yield NULL (no predicted / no actual positives);
    - ``n`` / ``n_pos``.

    Shape: ONE map-side-combined hash aggregate to the per-distinct-
    score histogram ``(score, n, n_pos)`` (the log-binning trick —
    classifier scores repeat heavily, so #distinct ≪ #rows), then
    average ranks via a cumulative window over HISTOGRAM rows only, and
    a final per-group reduce. Raw example rows never enter a window.
    """
    keys = [by] if by else []
    df = scored.where(
        F.col(label_col).isNotNull() & F.col(score_col).isNotNull()
    ).select(
        *keys,
        F.col(label_col).cast("double").alias("y"),
        F.col(score_col).cast("double").alias("s"),
    )
    # Per-distinct-score histogram: everything below derives from it.
    hist = df.groupBy(*keys, "s").agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum("y").alias("pos_s"),
    )
    cum = (
        Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    ).orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    # Average rank shared by every row tied at score s:
    # (#rows strictly below) + (n_s + 1)/2 — matches scipy.rankdata.
    ranked = hist.select(
        *keys,
        "s",
        "n_s",
        "pos_s",
        (
            F.coalesce(F.sum("n_s").over(cum), F.lit(0))
            + (F.col("n_s") + 1) / 2.0
        ).alias("ar"),
        F.least(
            F.lit(bins - 1),
            F.greatest(F.lit(0), F.floor(F.col("s") * bins)),
        ).alias("b"),
    )
    per_bin = ranked.groupBy(*keys, "b").agg(
        F.sum("n_s").alias("nb"),
        (F.sum(F.col("s") * F.col("n_s")) / F.sum("n_s")).alias("conf"),
        (F.sum("pos_s") / F.sum("n_s")).alias("acc"),
    )
    ece = per_bin.groupBy(*keys).agg(
        (
            F.sum(F.col("nb") * F.abs(F.col("conf") - F.col("acc")))
            / F.sum("nb")
        ).alias("ece")
    )
    neg_s = F.col("n_s") - F.col("pos_s")
    agg = ranked.groupBy(*keys).agg(
        F.sum("n_s").alias("n"),
        F.sum("pos_s").cast("long").alias("n_pos"),
        F.sum(F.col("pos_s") * F.col("ar")).alias("rank_pos"),
        (
            F.sum(
                F.col("pos_s") * (F.col("s") - 1) * (F.col("s") - 1)
                + neg_s * F.col("s") * F.col("s")
            )
            / F.sum("n_s")
        ).alias("brier"),
        F.sum(
            F.when(F.col("s") >= threshold, F.col("pos_s")).otherwise(
                F.lit(0.0)
            )
        ).cast("long").alias("tp"),
        F.sum(
            F.when(F.col("s") >= threshold, neg_s).otherwise(F.lit(0.0))
        ).cast("long").alias("fp"),
        F.sum(
            F.when(F.col("s") < threshold, F.col("pos_s")).otherwise(
                F.lit(0.0)
            )
        ).cast("long").alias("fn"),
    )
    n_neg = F.col("n") - F.col("n_pos")
    auc = F.when(
        (F.col("n_pos") > 0) & (n_neg > 0),
        (
            F.col("rank_pos")
            - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
        )
        / (F.col("n_pos") * n_neg),
    )
    precision = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp") / (F.col("tp") + F.col("fp")),
    )
    recall = F.when(
        F.col("n_pos") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))
    )
    f1 = F.when(
        (2 * F.col("tp") + F.col("fp") + F.col("fn")) > 0,
        2 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
    )
    out = (
        agg.join(ece, keys) if keys else agg.crossJoin(ece)
    ).select(
        *keys,
        "n",
        "n_pos",
        auc.alias("auc"),
        "brier",
        "ece",
        ((F.col("tp") + (F.col("n") - F.col("n_pos") - F.col("fp"))) / F.col("n")).alias(
            "accuracy"
        ),
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
    )
    return out.orderBy(by) if by else out


def pass_at_k(
    samples: DataFrame,
    ks: "Sequence[int]" = (1, 5, 10),
    problem_col: str = "problem_id",
    correct_col: str = "is_correct",
) -> DataFrame:
    """Unbiased pass@k (Chen et al. 2021, HumanEval appendix) per
    problem and summarized: with ``n`` samples of which ``c`` are
    correct, ``pass@k = 1 − C(n−c, k)/C(n, k)`` — the probability
    that at least one of ``k`` drawn samples is correct. The standard
    metric for code/RL sample sets and best-of-n reward data.

    Numerics: the binomial ratio is expanded to the k-term product
    ``Π_{i=0..k−1} (n−c−i)/(n−i)`` — ``k`` is a plan-time constant, so
    the product is a short codegen expression (no lgamma, which Spark
    SQL lacks; no overflow, every factor ≤ 1). Problems with
    ``n − c < k`` score exactly 1; problems with ``n < k`` get NULL
    for that k (the estimator is undefined — fewer samples than
    draws) rather than a silently-biased number.

    Plan: ONE (problem) aggregate + one tiny summary aggregate.
    Returns one row per problem: ``(problem_id, n_samples, n_correct,
    pass_at_<k>...)`` plus a ``"(mean)"`` summary row (problem id
    NULL, per-k means over defined problems) — the headline numbers.
    """
    ks = sorted(set(int(k) for k in ks))
    if not ks or ks[0] < 1:
        raise ValueError("ks must be positive integers")
    per = samples.groupBy(problem_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_samples"),
        F.sum(F.col(correct_col).cast("int")).cast("long").alias("n_correct"),
    )
    n, c = F.col("n_samples"), F.col("n_correct")
    for k in ks:
        prod = F.lit(1.0)
        for i in range(k):
            prod = prod * (n - c - i) / (n - i)
        expr = (
            F.when(n < k, F.lit(None).cast("double"))
            .when(n - c < k, F.lit(1.0))
            .otherwise(F.round(1.0 - prod, 9))
        )
        per = per.withColumn(f"pass_at_{k}", expr)
    summary = per.agg(
        F.lit(None).cast(per.schema[problem_col].dataType).alias(problem_col),
        F.sum("n_samples").alias("n_samples"),
        F.sum("n_correct").alias("n_correct"),
        *[F.round(F.avg(f"pass_at_{k}"), 9).alias(f"pass_at_{k}") for k in ks],
    )
    return per.unionByName(summary)


def multiclass_metrics(
    scored: DataFrame,
    label_col: str = "label",
    pred_col: str = "prediction",
) -> DataFrame:
    """Per-class precision/recall/F1 from the (label, prediction)
    contingency, plus ``"(macro)"`` (unweighted class means, the
    imbalance-robust summary) and ``"(micro)"`` (pooled counts —
    precision = recall = F1 = accuracy in single-label
    classification) rows. The multiclass companion to
    :func:`binary_metrics`.

    Convention (scikit-learn's): a class with no predicted rows has
    precision 0, no true rows recall 0, and F1 0 when either is 0 —
    never NULL/NaN, so macro means stay defined. Classes appearing
    only as predictions still get a row. Rows with a NULL label or
    prediction are excluded (a NULL class is unscoreable and would
    otherwise deflate the macro averages with an all-zero row).

    Plan: ONE (label, prediction) hash aggregate — contingency-sized,
    ≤ |classes|² rows — then per-class conditional sums over it;
    raw rows are touched once.
    """
    # NULL labels/predictions would form a phantom class: every join
    # below is on the NULL key and misses, so its tp/n_true/n_pred
    # coalesce to 0 and the all-zero row deflates the macro averages.
    # NULL is unscoreable — exclude it before building the contingency.
    # contingency-sized (≤ |classes|² rows) but referenced by SIX plan
    # branches (classes / tp / true_tot / pred_tot, then the macro and
    # micro summary aggregates) — unmaterialized, every branch re-runs
    # the full upstream scan of `scored` (the recompute-at-fan-out
    # trap; measured 7.5 s → 1.5 s on a 50k-doc language-ID input)
    cont = (
        scored.where(
            F.col(label_col).isNotNull() & F.col(pred_col).isNotNull()
        )
        .groupBy(F.col(label_col).alias("__l"), F.col(pred_col).alias("__p"))
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .localCheckpoint()
    )
    classes = (
        cont.select(F.col("__l").alias("cls"))
        .unionByName(cont.select(F.col("__p").alias("cls")))
        .distinct()
    )
    tp = cont.where(F.col("__l") == F.col("__p")).select(
        F.col("__l").alias("cls"), F.col("__n").alias("tp")
    )
    true_tot = cont.groupBy(F.col("__l").alias("cls")).agg(
        F.sum("__n").alias("n_true")
    )
    pred_tot = cont.groupBy(F.col("__p").alias("cls")).agg(
        F.sum("__n").alias("n_pred")
    )
    per = (
        classes.join(tp, "cls", "left")
        .join(true_tot, "cls", "left")
        .join(pred_tot, "cls", "left")
        .select(
            "cls",
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(0.0)
    rec = F.when(F.col("n_true") > 0, F.col("tp") / F.col("n_true")).otherwise(0.0)
    per = per.withColumn("precision", F.round(prec, 9)).withColumn(
        "recall", F.round(rec, 9)
    )
    f1 = F.when(
        (F.col("precision") + F.col("recall")) > 0,
        2 * F.col("precision") * F.col("recall")
        / (F.col("precision") + F.col("recall")),
    ).otherwise(0.0)
    per = per.withColumn("f1", F.round(f1, 9)).withColumn(
        "cls", F.col("cls").cast("string")
    )
    macro = per.agg(
        F.lit("(macro)").alias("cls"),
        F.sum("n_true").alias("n_true"),
        F.sum("n_pred").alias("n_pred"),
        F.sum("tp").alias("tp"),
        F.round(F.avg("precision"), 9).alias("precision"),
        F.round(F.avg("recall"), 9).alias("recall"),
        F.round(F.avg("f1"), 9).alias("f1"),
    )
    micro_val = F.round(F.sum("tp") / F.sum("n_true"), 9)
    micro = per.agg(
        F.lit("(micro)").alias("cls"),
        F.sum("n_true").alias("n_true"),
        F.sum("n_pred").alias("n_pred"),
        F.sum("tp").alias("tp"),
        micro_val.alias("precision"),
        micro_val.alias("recall"),
        micro_val.alias("f1"),
    )
    return per.unionByName(macro).unionByName(micro)


# Poisson(1) inverse-CDF thresholds: P(K <= k) for k = 0..7 (tail mass
# beyond 8 is < 1e-8 — absorbed into the last bucket). Poisson
# bootstrap (Chamandy et al. 2012): resample weights drawn per
# (row, replicate) independently, no global n needed — THE bootstrap
# formulation that distributes, since multinomial resampling requires
# coordinated draws.
_POISSON1_CDF = (
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253,
)


def _poisson1(u):
    """Portable Poisson(1) draw from a uniform column via the CDF
    ladder — 8 codegen comparisons, reproducible in any engine."""
    k = F.lit(8)
    for i in range(len(_POISSON1_CDF) - 1, -1, -1):
        k = F.when(u < F.lit(_POISSON1_CDF[i]), F.lit(i)).otherwise(k)
    return k


def bootstrap_ci(
    df: DataFrame,
    value_col: str,
    group_cols: "Sequence[str]" = (),
    n_boot: int = 200,
    alpha: float = 0.05,
    id_col: "Optional[str]" = None,
    salt: str = "bs1",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Percentile-bootstrap confidence interval for the MEAN of
    ``value_col`` (per group): Poisson(1) resample weights per
    (row, replicate), replicate means, empirical ``alpha/2`` /
    ``1 − alpha/2`` quantiles. The error bar every eval-layer metric
    table should carry before two model versions are declared
    different.

    Determinism: weights derive from ``hash(id ‖ replicate ‖ salt)``
    (pass your primary key as ``id_col``). Same inputs → same
    intervals, any partitioning. ``hash_fn="xxhash64"`` (default) is
    the fast JVM-native path (~3× the whole-operator throughput of
    md5 at 20M draws); ``"md5"`` is the engine-portable path the
    DuckDB parity oracle reproduces bit-for-bit — both are
    deterministic, they just draw different (equally valid) replicate
    universes.

    Plan (100 TB lens): explode ``n_boot`` replicates per row BUT the
    (group, replicate) aggregate partial-combines map-side, so the
    shuffle carries ``groups × n_boot`` rows — the exploded stream
    never hits the wire. One further tiny aggregate takes the
    replicate-mean quantiles (exact ``percentile`` over ``n_boot``
    values per group). Empty-weight replicates (possible in tiny
    groups) are excluded from the quantile.

    Returns ``group_cols + (n, mean, ci_lo, ci_hi)`` (9-dp rounded).
    """
    if id_col is None:
        raise ValueError(
            "pass id_col (a stable unique row id) — bootstrap weights "
            "must be reproducible across partitionings"
        )
    if n_boot < 10:
        raise ValueError("n_boot must be >= 10")
    if not 0 < alpha < 1:
        raise ValueError("alpha must be in (0, 1)")
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError("hash_fn must be 'xxhash64' or 'md5'")
    g = list(group_cols)
    v = F.col(value_col).cast("double")
    base = df.where(v.isNotNull()).select(
        *g, v.alias("__v"), F.col(id_col).cast("string").alias("__id")
    )
    rep = base.select(
        *g,
        "__v",
        "__id",
        F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("__b"),
    )
    if hash_fn == "md5":
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("__id"),
                            F.lit("|"),
                            F.col("__b").cast("string"),
                            F.lit("|"),
                            F.lit(salt),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(16 ** 8))
        )
    else:
        u = (
            F.pmod(
                F.xxhash64(F.col("__id"), F.col("__b"), F.lit(salt)),
                F.lit(2 ** 32),
            ).cast("double")
            / F.lit(float(2 ** 32))
        )
    wtd = rep.select(*g, "__b", "__v", _poisson1(u).alias("__w"))
    reps = (
        wtd.groupBy(*g, "__b")
        .agg(
            F.sum(F.col("__w") * F.col("__v")).alias("__swv"),
            F.sum("__w").alias("__sw"),
        )
        .where(F.col("__sw") > 0)
        .select(*g, (F.col("__swv") / F.col("__sw")).alias("__m"))
    )
    lo, hi = alpha / 2.0, 1.0 - alpha / 2.0
    cis = reps.groupBy(*g).agg(
        F.round(F.percentile("__m", F.lit(lo)), 9).alias("ci_lo"),
        F.round(F.percentile("__m", F.lit(hi)), 9).alias("ci_hi"),
    )
    points = base.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("__v"), 9).alias("mean"),
    )
    joined = (
        points.join(cis, g) if g else points.crossJoin(cis)
    )
    return joined.select(*g, "n", "mean", "ci_lo", "ci_hi")
