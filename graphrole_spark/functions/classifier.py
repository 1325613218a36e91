"""Model-based quality filtering: a hashed-n-gram Naive-Bayes text
classifier (the fastText/CCNet-style quality gate, closed-form).

Production pretraining pipelines score every document with a cheap
linear classifier trained on "good" vs "bad" exemplars (CCNet trains
fastText on Wikipedia-vs-crawl; Llama/GPT data recipes do the same
with pages-cited-by-Wikipedia). Multinomial Naive Bayes over hashed
n-gram counts IS that linear model, and — unlike SGD — its fit is
**closed-form**: two count aggregations. That makes both phases pure
DataFrame dataflow at any corpus size:

* **fit** — explode each labeled document to hashed gram buckets (the
  repo's one portable md5 hash idiom, so DuckDB oracles replicate it
  bit-for-bit), one groupBy(bucket) with conditional sums for the two
  classes, add-one smoothing → a ≤``buckets``-row weight table plus a
  prior row and a default row for never-trained buckets. Two shuffles
  of (long, long) rows, zero driver state. Rows with a NULL label are
  EXCLUDED (an unlabeled row is not negative evidence).
* **score** — explode the target corpus the same way, broadcast-join
  the weight table, one groupBy(doc) sum. ``score = prior +
  Σ_grams ln p(b|pos)/p(b|neg)`` with never-trained buckets taking the
  smoothed default ``ln((N+B)/(P+B))``; ``predicted = score > 0`` is
  exactly the MAP decision of add-one-smoothed multinomial NB.

The unsupervised sibling is ``importance.dsir_scores`` (log-ratio of
target-vs-raw multinomials, no labels); this operator is the
supervised gate the DSIR paper benchmarks against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .importance import _gram_buckets

__all__ = ["nb_quality_fit", "nb_quality_score"]

PRIOR_BUCKET = -1  # the model row that carries ln P(pos)/P(neg)
DEFAULT_BUCKET = -2  # the model row for buckets never seen in training


def nb_quality_fit(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n: int = 1,
    buckets: int = 4096,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fit the classifier on documents with a boolean ``label_col``
    (true = the class to keep). Returns the whole model as ONE
    DataFrame ``(bucket, log_ratio)`` of at most ``buckets + 2`` rows —
    writable to parquet, broadcastable at score time; the ``bucket =
    -1`` row carries the class-prior log odds (add-one smoothed, so a
    single-class training set stays finite) and the ``bucket = -2`` row
    the smoothed weight of a bucket with zero training occurrences,
    ``ln((N+B)/(P+B))`` — true NB, every gram is evidence.

    Documents shorter than ``n`` tokens still count toward the prior
    (they are evidence about class frequency, just not about grams);
    NULL-labeled rows are dropped entirely.
    """
    lbl = F.col(label_col).cast("boolean")
    docs = labeled.where(lbl.isNotNull()).select(
        F.col(id_col).alias("__id"), lbl.alias("__y"), F.col(text_col)
    )
    grams = _gram_buckets(docs, text_col, n, buckets, id_col="__id").join(
        docs.select("__id", "__y"), "__id"
    )
    counts = grams.groupBy("bucket").agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).alias("pc"),
        F.sum(F.when(F.col("__y"), 0).otherwise(1)).alias("nc"),
    )
    totals = counts.agg(
        F.coalesce(F.sum("pc"), F.lit(0)).alias("P"),
        F.coalesce(F.sum("nc"), F.lit(0)).alias("N"),
    )
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("pc") + 1.0) / (F.col("P") + buckets))
            - F.log((F.col("nc") + 1.0) / (F.col("N") + buckets))
        ).alias("log_ratio"),
    )
    prior = docs.agg(
        (
            F.log(F.sum(F.when(F.col("__y"), 1).otherwise(0)) + 1.0)
            - F.log(F.sum(F.when(F.col("__y"), 0).otherwise(1)) + 1.0)
        ).alias("log_ratio")
    ).select(F.lit(PRIOR_BUCKET).cast("long").alias("bucket"), "log_ratio")
    default = totals.select(
        F.lit(DEFAULT_BUCKET).cast("long").alias("bucket"),
        (
            F.log(F.lit(1.0) / (F.col("P") + buckets))
            - F.log(F.lit(1.0) / (F.col("N") + buckets))
        ).alias("log_ratio"),
    )
    # materialize the model eagerly (a fit IS an action): score-time
    # consumers slice it into three branches (weights / prior / default)
    # and an unmaterialized model would re-run the whole training
    # explode+groupBy lineage once per branch. ≤ buckets+2 rows.
    return weights.unionByName(prior).unionByName(default).localCheckpoint()


def nb_quality_score(
    documents: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    n: int = 1,
    buckets: int = 4096,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score ``documents`` with a fitted model (same ``n``/``buckets``
    as the fit — the hashed feature space is part of the model
    contract). One corpus explode, one broadcast join against the
    ≤``buckets``-row weight table, one groupBy(doc) sum.

    Returns ``(id_col, n_grams, nb_score, predicted)``; a gram whose
    bucket never appeared in training takes the model's smoothed
    default weight (the ``bucket = -2`` row), and an empty document
    scores the prior alone.
    """
    prior_row = model.where(F.col("bucket") == PRIOR_BUCKET).select("log_ratio")
    default_row = model.where(F.col("bucket") == DEFAULT_BUCKET).select(
        F.col("log_ratio").alias("__d")
    )
    weights = model.where(F.col("bucket") >= 0)
    g = _gram_buckets(documents, text_col, n, buckets, id_col)
    evidence = (
        g.join(F.broadcast(weights), "bucket", "left")
        .crossJoin(F.broadcast(default_row))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce("log_ratio", F.col("__d"))).alias("__e"),
        )
    )
    return (
        documents.select(id_col)
        .join(evidence, id_col, "left")
        .crossJoin(F.broadcast(prior_row.withColumnRenamed("log_ratio", "__p")))
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.round(F.col("__p") + F.coalesce("__e", F.lit(0.0)), 6).alias(
                "nb_score"
            ),
            (F.col("__p") + F.coalesce("__e", F.lit(0.0)) > 0).alias("predicted"),
        )
    )
