"""Corpus-level term statistics: tf-idf keyword extraction and unigram
language-model scoring.

Two classic training-data-pipeline signals the reference has no
counterpart for (GraphRole is feature extraction over graphs;
this module is the text-feature analogue over the ``documents``
table):

* :func:`tfidf_topk` — the top-k most *characteristic* terms per
  document (tf·idf), the standard keyword / topic-proxy signal used
  for corpus exploration and near-domain clustering.
* :func:`unigram_lm_scores` — per-document mean negative
  log-likelihood under an add-one-smoothed unigram LM fitted on the
  corpus itself: the cheap "perplexity-ish" fluency score pipelines
  use (KenLM-style, without the external model) to flag gibberish
  and boilerplate outliers before training.

Scale notes (100 TB lens): both operators are one token explode
(whole-stage codegen `split` + `explode`, no Python), one partial-
aggregated `groupBy` over (doc, term) or (term), one shuffle join on
the term key (the term-count side is vocabulary-sized — orders of
magnitude smaller than the corpus, broadcastable at moderate vocab,
an ordinary hash join beyond), and one per-doc window / aggregation.
No driver collects; the corpus-total scalars (`N`, `T`, `V`) are
1-row frames cross-joined in, so the whole plan stays lazy and
distributed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graphrole_spark.functions.text import tokens


def _doc_terms(documents: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, term) token instances; empty tokens dropped so the
    empty / all-blank document contributes no rows (the DuckDB oracle
    mirrors this with ``list_filter``)."""
    return documents.select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("term")
    ).where(F.col("term") != "")


def tfidf_topk(
    documents: DataFrame,
    k: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` tf-idf terms per document.

    idf = ln(N / df) with N = number of documents containing at least
    one token and df = number of documents containing the term; score
    = tf · idf.  Ranking is by the 6-decimal-rounded score (engine-
    portable: a 1-ulp libm difference cannot flip an order decided at
    1e-6 granularity) with the term string as the deterministic
    tie-break.

    Returns ``(doc_id, term, tf, df, tfidf, rank)`` with rank ≤ k.
    """
    inst = _doc_terms(documents, text_col)
    # Pin the (doc, term, tf) aggregate: df, N and the ranking leg all
    # derive from it, and without the persist Catalyst re-expands the
    # lineage into THREE corpus explodes (verified via explain).  The
    # cached frame is smaller than the token stream (distinct terms per
    # doc), spills to disk, and turns the operator into a single
    # corpus pass — the 100×-scale shape.
    tf = (
        inst.groupBy("doc_id", "term").agg(F.count("*").alias("tf")).persist()
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = tf.select(F.countDistinct("doc_id").alias("__n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("__n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def unigram_lm_scores(
    documents: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean negative log-likelihood (nats/token) under an
    add-one-smoothed unigram model fitted on the corpus:
    p(t) = (c(t) + 1) / (T + V).

    Low scores = high-probability filler; high scores = rare-token
    documents — both tails are the usual quality-filter candidates.
    Documents with zero tokens produce no row (no likelihood is
    defined), matching the SQL oracle.

    Returns ``(doc_id, n_tokens, nll)`` with ``nll`` rounded to 6
    decimals (averaging order across engines differs only at ~1e-12).
    """
    inst = _doc_terms(documents, text_col)
    # Pin the vocabulary-sized count table: the totals (T, V) and the
    # scoring join both read it, and the persist caps the operator at
    # the canonical TWO corpus passes (train the counts, score the
    # instances) instead of one explode per consumer.
    counts = inst.groupBy("term").agg(F.count("*").alias("__c")).persist()
    totals = counts.agg(
        F.sum("__c").alias("__t"), F.count("*").alias("__v")
    )
    return (
        inst.join(counts, "term")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            (
                -F.log((F.col("__c") + 1) / (F.col("__t") + F.col("__v")))
            ).alias("__nll"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("__nll"), 6).alias("nll"),
        )
    )
