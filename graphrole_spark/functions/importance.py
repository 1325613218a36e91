"""Importance-weighted training-data selection (DSIR).

Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) scores raw-corpus documents by the log-likelihood
ratio of two hashed n-gram bag-of-words models — one fit on a small
target corpus (the distribution you want more of), one fit on the raw
corpus itself — then keeps the highest-ratio documents. It is the
standard cheap alternative to a trained quality classifier for steering
a pretraining mixture toward a domain.

Everything here is expressed as DataFrame ops sized for corpus scale:
the only per-gram state is a ``buckets``-row dimension table (hashed
feature space), so both model fits are a single explode + groupBy each
and the scoring pass is an explode + broadcast join + per-doc mean.
No driver-side model, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

__all__ = ["dsir_scores", "dsir_select"]


def _gram_buckets(
    documents: DataFrame,
    text_col: str,
    n: int,
    buckets: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exploded ``(id, bucket)`` hashed word-n-gram rows.

    The bucket hash is the repo's ONE portable hash idiom (md5 hex
    prefix — ``corpus._md5_bucket``) so the DuckDB oracle can
    reproduce it bit-for-bit; gram text is projected down to the long
    bucket id immediately after the generator, so nothing wider than
    (id, long) ever shuffles."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.filter(tokens(t), lambda x: x != F.lit(""))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    from .corpus import _md5_bucket

    g = documents.select(id_col, F.explode(grams).alias("__gram"))
    return g.select(
        id_col,
        _md5_bucket(F.col("__gram"), buckets).alias("bucket"),
    )


def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    n: int = 2,
    buckets: int = 4096,
    id_col: str = "doc_id",
    target_within_raw: bool = False,
) -> DataFrame:
    """Per-document DSIR importance score over ``raw``.

    ``dsir_score`` = mean over the document's hashed ``n``-grams of
    ``ln p_target(bucket) − ln p_raw(bucket)`` with add-one-smoothed
    bucket multinomials; documents with fewer than ``n`` tokens get
    score 0.0 and ``n_grams`` 0 (no evidence either way).

    Plan: two explode+partial-agg groupBys fit both models (outputs are
    ≤ ``buckets`` rows), the log-ratio dimension is broadcast, and the
    scoring pass is one more groupBy on the document key — three
    shuffles of (long, long) rows total, independent of document size.

    ``target_within_raw=True`` declares that ``target`` is a row-subset
    of ``raw`` under the same ``id_col``/``text_col`` (the common "the
    domain slice of the corpus itself is the target" DSIR setup): the
    target-side gram counts are then derived from the already-exploded
    raw gram stream by an id semi-join instead of a second
    tokenize+md5+explode pass over the target text — bit-identical
    counts (the subset's rows in ``raw_g`` ARE its gram buckets), at
    half the hashing cost.

    Returns ``(id_col, n_grams, dsir_score)``.
    """
    # the raw gram stream feeds BOTH the raw model fit and the scoring
    # pass; persist the (id, long) rows once so the corpus is exploded
    # and md5-hashed a single time (same fan-out rule as terms.py — the
    # footprint is two longs per gram, far cheaper than a second scan)
    raw_g = _gram_buckets(raw, text_col, n, buckets, id_col).persist()
    if target_within_raw:
        tgt_g = raw_g.join(
            target.select(id_col).distinct(), id_col, "left_semi"
        )
    else:
        tgt_g = _gram_buckets(target, text_col, n, buckets, id_col)
    rc = raw_g.groupBy("bucket").agg(F.count("*").alias("rc"))
    tc = tgt_g.groupBy("bucket").agg(F.count("*").alias("tc"))
    dim = rc.join(tc, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("rc", F.lit(0)).alias("rc"),
        F.coalesce("tc", F.lit(0)).alias("tc"),
    )
    totals = dim.agg(F.sum("rc").alias("R"), F.sum("tc").alias("T"))
    log_ratio = F.log((F.col("tc") + 1.0) / (F.col("T") + buckets)) - F.log(
        (F.col("rc") + 1.0) / (F.col("R") + buckets)
    )
    dim = dim.crossJoin(F.broadcast(totals)).select(
        "bucket", log_ratio.alias("log_ratio")
    )
    scored = (
        raw_g.join(F.broadcast(dim), "bucket")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_grams"), F.avg("log_ratio").alias("__s"))
    )
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.round(F.coalesce("__s", F.lit(0.0)), 6).alias("dsir_score"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    n: int = 2,
    buckets: int = 4096,
    id_col: str = "doc_id",
    target_within_raw: bool = False,
) -> DataFrame:
    """DSIR scores plus a deterministic top-``k`` ``selected`` flag (the
    resampling step, greedy variant: keep the k most target-like docs).

    The top-k is ``orderBy(...).limit(k)`` — Spark plans it as
    TakeOrderedAndProject (per-partition heaps + driver merge of k
    ids), then the flag is a broadcast join; no global sort, no single
    reduce partition. Ties rank on the ROUNDED score then ``id_col`` so
    the cut is engine-portable.
    """
    # materialize the (id, n_grams, score) rows once: `scores` feeds
    # BOTH the top-k cut and the flag join, and unmaterialized each
    # branch would re-run the target-side gram explode + md5 bucketing
    # (the raw side is persisted inside dsir_scores, the target side is
    # not) — three slim columns per document
    scores = dsir_scores(
        raw, target, text_col, n, buckets, id_col,
        target_within_raw=target_within_raw,
    ).localCheckpoint()
    topk = (
        scores.orderBy(F.desc("dsir_score"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.lit(1).alias("__sel"))
    )
    return scores.join(F.broadcast(topk), id_col, "left").select(
        id_col,
        "n_grams",
        "dsir_score",
        F.coalesce("__sel", F.lit(0)).cast("int").alias("selected"),
    )
