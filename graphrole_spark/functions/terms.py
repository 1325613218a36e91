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
* :func:`bigram_lm_fit` / :func:`bigram_lm_scores` — the CCNet-shaped
  upgrade: fit a bigram LM with stupid backoff (Brants et al., EMNLP
  2007) on a *reference* corpus, score any corpus against it. This is
  the actual perplexity-filtering workflow (KenLM trained on
  Wikipedia, crawl scored against it) where train and score corpora
  differ, so backoff genuinely fires; the per-doc ``backoff_frac``
  doubles as a domain-shift signal.

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


def _token_arrays(documents: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, toks) with empty tokens filtered — the array-form
    sibling of :func:`_doc_terms` for operators that need positions
    (bigram pairs are built array-locally, no self-join)."""
    return documents.select(
        "doc_id",
        F.filter(tokens(F.col(text_col)), lambda t: t != "").alias("toks"),
    )


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


def bm25_topk(
    documents: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    query_text_col: str = "text",
    tf: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents per query under Okapi BM25 (Robertson &
    Walker, SIGIR 1994) with the Lucene non-negative idf variant —
    the lexical-retrieval workhorse a training-data pipeline uses for
    eval-set decontamination triage, RAG-corpus indexing checks, and
    targeted-domain mining before an embedding model exists.

    ``queries`` is a DataFrame ``(query_id, <query_text_col>)``.  For
    each query term t (distinct per query — Lucene ignores query-side
    term frequency) matching a document::

        idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
        score(t,d) = idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    with N = documents containing ≥1 token, dl the document token
    count and avgdl its corpus mean.  Only documents sharing ≥1 term
    with the query are scored (standard inverted-index semantics).
    ``tf`` optionally injects a precomputed, persisted
    ``(doc_id, term, tf)`` frame so multi-leg callers
    (:func:`hybrid_topk`) pay the corpus explode once.

    Plan (100 TB lens): ONE corpus explode feeds the pinned
    (doc, term, tf) aggregate; dl / avgdl / N / df all derive from that
    vocabulary-sized frame, never from a second corpus pass.  The
    distinct (query_id, term) probe side is broadcast (query sets are
    tiny next to the corpus), so the only wide shuffles are the tf
    groupBy and the final (query, doc) partial-aggregated sum — no
    all-pairs anything.  Ranking rounds to 6 decimals with doc_id as
    the deterministic tie-break (engine-portable, as tfidf_topk).

    Returns ``(query_id, doc_id, n_matched, bm25, rank)`` with
    rank ≤ k.
    """
    if tf is None:
        inst = _doc_terms(documents, text_col)
        tf = (
            inst.groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
            .persist()
        )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("__dl"))
    stats = dl.agg(
        F.count("*").alias("__n_docs"), F.avg("__dl").alias("__avgdl")
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    qterms = (
        queries.select(
            "query_id", F.explode(tokens(F.col(query_text_col))).alias("term")
        )
        .where(F.col("term") != "")
        .distinct()
    )
    idf = F.log(
        1
        + (F.col("__n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(df_, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.count("*").alias("n_matched"),
            F.round(F.sum(idf * tf_part), 6).alias("bm25"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("bm25"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def rrf_fuse(
    rankings,
    k: int = 60,
    topn: int | None = None,
    id_cols=("query_id", "doc_id"),
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
    the standard way to combine heterogeneous retrieval rankings
    (lexical BM25 + embedding ANN, the "hybrid search" pattern) without
    score calibration: fused score = Σ_lists 1/(k + rank), summed over
    the lists where the document appears.

    ``rankings`` is a sequence of DataFrames each carrying ``id_cols``
    and an integer ``rank_col`` (1-based, as produced by
    :func:`bm25_topk`, :func:`tfidf_topk` and the similarity top-k
    family). ``k=60`` is the published default; ``topn`` truncates the
    fused ranking per query.

    Plan (100 TB lens): union the (already top-k-bounded) rankings —
    each contributes ≤ queries×k rows — then ONE partial-aggregated
    groupBy on ``id_cols`` and one per-query window. The fused score is
    rounded to 9 decimals before ranking with the doc id as tie-break
    (engine-portable, same convention as the retrieval operators).

    Returns ``id_cols + (n_lists, rrf, rank)``.
    """
    rankings = list(rankings)
    if len(rankings) < 2:
        raise ValueError("rrf_fuse needs at least two rankings")
    if k <= 0:
        raise ValueError("k must be positive (RRF denominator k + rank)")
    id_cols = list(id_cols)
    cols = id_cols + [rank_col]
    unioned = rankings[0].select(*cols)
    for r in rankings[1:]:
        unioned = unioned.unionByName(r.select(*cols))
    fused = (
        unioned.groupBy(*id_cols)
        .agg(
            F.count("*").cast("int").alias("n_lists"),
            F.round(
                F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))), 9
            ).alias("rrf"),
        )
    )
    w = Window.partitionBy(id_cols[0]).orderBy(
        F.desc("rrf"), *[F.asc(c) for c in id_cols[1:]]
    )
    out = fused.withColumn("rank", F.row_number().over(w))
    if topn is not None:
        out = out.where(F.col("rank") <= topn)
    return out


def tfidf_search_topk(
    documents: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    query_text_col: str = "text",
    tf: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents per query under classic SMART lnc-style
    tf-idf retrieval (Salton & Buckley 1988)::

        score(q, d) = Σ_{t ∈ q ∩ d} (1 + ln tf) · ln(N / df) / sqrt(dl)

    — sublinear term frequency, idf weighting, sqrt-length
    normalization, query-side term frequency ignored (matching
    :func:`bm25_topk`'s Lucene convention). The second lexical leg for
    :func:`hybrid_topk`: it length-normalizes harder and damps tf
    faster than BM25, so the two rankings disagree exactly where RRF
    fusion helps.

    Plan: identical shuffle shape to :func:`bm25_topk` — one pinned
    (doc, term, tf) aggregate feeds df/dl/N, the distinct query-term
    probe is broadcast, one (query, doc) partial-aggregated sum, one
    per-query window. Scores round to 6 decimals, doc id tie-break.

    Returns ``(query_id, doc_id, n_matched, tfidf, rank)``.
    """
    if tf is None:
        inst = _doc_terms(documents, text_col)
        tf = (
            inst.groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
            .persist()
        )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("__dl"))
    n_docs = tf.select(F.countDistinct("doc_id").alias("__n_docs"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    qterms = (
        queries.select(
            "query_id", F.explode(tokens(F.col(query_text_col))).alias("term")
        )
        .where(F.col("term") != "")
        .distinct()
    )
    contrib = (
        (1 + F.log(F.col("tf")))
        * F.log(F.col("__n_docs") / F.col("df"))
        / F.sqrt(F.col("__dl"))
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(df_, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("query_id", "doc_id")
        .agg(
            F.count("*").alias("n_matched"),
            F.round(F.sum(contrib), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("tfidf"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hybrid_topk(
    documents: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    text_col: str = "text",
    query_text_col: str = "text",
) -> DataFrame:
    """Hybrid lexical retrieval: fuse :func:`bm25_topk` and
    :func:`tfidf_search_topk` rankings for the same queries with
    :func:`rrf_fuse`. BM25 rewards rare-term matches under mild length
    normalization; lnc tf-idf damps tf and normalizes length harder —
    their RRF fusion is the no-model "hybrid search" baseline (swap
    either leg for an ANN ranking when an embedding model exists;
    :func:`rrf_fuse` is leg-agnostic).

    Both legs share retrieval depth ``k`` and the fused ranking is
    truncated to ``k`` per query; the (doc, term, tf) aggregate is
    computed ONCE and injected into both legs, so the corpus explode
    runs a single time (the PERF fan-out rule).
    """
    tf = (
        _doc_terms(documents, text_col)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .persist()
    )
    bm = bm25_topk(
        documents, queries, k=k,
        text_col=text_col, query_text_col=query_text_col, tf=tf,
    )
    ti = tfidf_search_topk(
        documents, queries, k=k,
        text_col=text_col, query_text_col=query_text_col, tf=tf,
    )
    return rrf_fuse([bm, ti], k=rrf_k, topn=k)


def score_buckets(
    scored: DataFrame,
    score_col: str,
    by: str | None = None,
    buckets: int = 3,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al., LREC 2020): rank
    documents by a score (ascending — for an LM NLL, low = fluent) and
    cut the ranking into ``buckets`` equal-count tiers, per ``by``
    group when given (CCNet buckets per *language*, so a low-resource
    language's head is not crowded out by English).  Head/middle/tail
    tiers are the standard knobs for perplexity-filtered pre-training
    mixes (train on head+middle, drop tail).

    Equal-count rank cuts (``ntile``) rather than value cutpoints:
    deterministic across engines (no quantile-interpolation drift),
    identical tie-break via ``id_col``, and exactly what CCNet's
    "split each language into thirds by perplexity percentile" does.

    One window pass over the ``by`` partitioning — at 100 TB the
    scored frame is (id, score) longs, and the per-language partitions
    are the natural skew unit (English dominates; ntile over a single
    giant partition is one task — shard English upstream by hashing
    ids into ``by='lang||bucket_salt'`` groups if that ever binds).

    Returns the input plus ``bucket`` (1-based tier index) and
    ``bucket_label`` (from ``labels`` when ``buckets == len(labels)``,
    else the stringified index).
    """
    part = [F.col(by)] if by else []
    w = Window.partitionBy(*part).orderBy(
        F.asc(score_col), F.asc(id_col)
    )
    out = scored.withColumn("bucket", F.ntile(buckets).over(w))
    if buckets == len(labels):
        label = F.element_at(
            F.array(*[F.lit(x) for x in labels]), F.col("bucket")
        )
    else:
        label = F.col("bucket").cast("string")
    return out.withColumn("bucket_label", label)


def score_cutpoints(
    scored: DataFrame,
    score_col: str,
    by: str | None = None,
    buckets: int = 3,
    relative_error: float | None = None,
) -> DataFrame:
    """Fit CCNet tier *cutoffs* once — the deploy-mode half of
    :func:`score_buckets`.  CCNet as actually shipped (Wenzek et al.,
    LREC 2020, §4.3) computes per-language perplexity percentiles on a
    held-out/sample pass and then applies those FIXED thresholds to
    the full crawl stream; the stream pass never sorts.  This function
    is the fit: one aggregation producing ``(by?, cuts array<double>)``
    with the ``1/buckets .. (buckets-1)/buckets`` percentiles.

    Exact ``percentile`` by default — linear interpolation on order
    statistics, bit-identical to DuckDB ``quantile_cont`` and
    ``np.quantile`` (verified in tests), so fitted buckets stay
    engine-portable.  Pass ``relative_error`` (e.g. ``0.0001``) to
    switch to ``percentile_approx`` (single-pass KLL-style sketch,
    mergeable map-side) when the fit corpus itself is at scale; the
    cuts then drift within the sketch bound but apply just as cheaply.

    The output is a ``buckets-1``-element array per group — broadcast
    it into :func:`score_buckets_apply`.
    """
    qs = F.array(*[F.lit(i / buckets) for i in range(1, buckets)])
    if relative_error is not None:
        acc = max(int(1.0 / relative_error), buckets)
        agg = F.percentile_approx(F.col(score_col), qs, F.lit(acc))
    else:
        agg = F.percentile(F.col(score_col), qs)
    agg = agg.cast("array<double>").alias("cuts")
    return scored.groupBy(by).agg(agg) if by else scored.agg(agg)


def score_buckets_apply(
    scored: DataFrame,
    cutpoints: DataFrame,
    score_col: str,
    by: str | None = None,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """Assign CCNet tiers from FIXED cutoffs — a pure projection, the
    100 TB-scale path.  Where :func:`score_buckets` ranks with a
    global/per-group window (one sort of the full stream),
    ``score_buckets_apply`` broadcast-joins the tiny fitted
    ``cutpoints`` frame and computes ``bucket = 1 + |{c in cuts :
    c < score}|`` array-locally: no shuffle of the scored stream at
    all, embarrassingly parallel, and incremental (new partitions
    bucket under yesterday's cuts without touching old data).

    Tie semantics: a score exactly equal to a cut goes to the LOWER
    tier (strict ``<``), deterministic with no id tie-break needed.
    NULL scores and groups absent from ``cutpoints`` yield NULL
    bucket/label (filter them upstream or refit).  ``labels`` maps
    tier indices when it is long enough, else the stringified index
    is used.
    """
    if by:
        j = scored.join(F.broadcast(cutpoints), on=by, how="left")
    else:
        j = scored.crossJoin(F.broadcast(cutpoints))
    s = F.col(score_col)
    bucket = F.when(
        s.isNotNull() & F.col("cuts").isNotNull(),
        F.size(F.filter("cuts", lambda c: c < s)) + 1,
    ).cast("int")
    out = j.withColumn("bucket", bucket).drop("cuts")
    label = F.when(
        F.col("bucket") <= len(labels),
        F.element_at(
            F.array(*[F.lit(x) for x in labels]), F.col("bucket")
        ),
    ).otherwise(F.col("bucket").cast("string"))
    return out.withColumn("bucket_label", label)


def bigram_lm_fit(
    train_documents: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Fit a bigram LM on ``train_documents``. Returns the whole model
    as ONE DataFrame ``(prev, term, c)``:

    * ``prev IS NULL`` rows are the unigram counts ``c(term)``;
    * ``prev IS NOT NULL`` rows are the bigram counts ``c(prev term)``.

    Two count aggregations, zero driver state; bigram pairs are built
    array-locally from each document's token array (``transform`` over
    a slice — no self-join, no window), so the only shuffles are the
    two count ``groupBy``s over (term)-keyed longs. The model is
    materialized eagerly (a fit IS an action) via ``localCheckpoint``
    because score-time consumers slice it into three branches (token
    counts, context counts, pair counts) and an unmaterialized model
    would re-run the training explode once per branch; it stays
    distributed — at real corpus scale write it to parquet instead and
    reload (row count is bounded by bigram *types*, not tokens).

    An empty training corpus yields an empty model; scoring against it
    is undefined (every probability is 0) — fit on a non-empty corpus.
    """
    t = _token_arrays(train_documents, text_col)
    uni = (
        t.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
        .select(F.lit(None).cast("string").alias("prev"), "term", "c")
    )
    # pairs (toks[i], toks[i+1]) built inside the row: slice off the
    # first token, pair each survivor with its predecessor by index.
    bi = (
        t.select(
            F.explode(
                F.expr(
                    "transform(slice(toks, 2, greatest(size(toks) - 1, 0)),"
                    " (t, i) -> struct(toks[i] AS prev, t AS term))"
                )
            ).alias("p")
        )
        .groupBy("p.prev", "p.term")
        .agg(F.count("*").alias("c"))
    )
    return uni.unionByName(bi).localCheckpoint()


def bigram_lm_scores(
    documents: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """Score ``documents`` against a :func:`bigram_lm_fit` model with
    stupid backoff (Brants et al. 2007 — unnormalized scores, the
    web-scale standard):

    * first token of a doc: add-one-smoothed unigram
      ``(c(w)+1) / (T+V)`` (finite for OOV words);
    * seen bigram: relative frequency ``c(prev w) / c(prev)``;
    * unseen bigram: ``alpha * (c(w)+1) / (T+V)``.

    The context total is the training unigram count of ``prev`` (a
    context that ends a training document therefore has its
    continuations sum to slightly below 1 — stupid backoff scores are
    explicitly unnormalized, which is what makes them one join instead
    of a per-context renormalization pass).

    Plan: one corpus explode into (prev, term) instances (array-local
    pairing, no self-join), three left joins against the model (pair
    counts on (prev, term), token and context counts on the unigram
    slice — all vocabulary-sized, broadcastable at moderate vocab, an
    ordinary hash join beyond), one groupBy(doc). Corpus totals (T, V)
    are a 1-row broadcast off the model, not the corpus.

    Returns ``(doc_id, n_tokens, bi_nll, backoff_frac)``; ``bi_nll``
    is the mean negative log-score in nats/token (rounded to 6
    decimals), ``backoff_frac`` the fraction of tokens whose bigram
    was unseen in training — high values flag out-of-domain documents.
    Zero-token documents emit no row (no likelihood is defined).
    """
    uni = model.where(F.col("prev").isNull()).select("term", "c")
    totals = uni.agg(F.sum("c").alias("__t"), F.count("*").alias("__v"))
    bi = model.where(F.col("prev").isNotNull()).select(
        "prev", "term", F.col("c").alias("__cb")
    )
    inst = _token_arrays(documents, text_col).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(toks, (t, i) ->"
                " struct(CASE WHEN i = 0 THEN NULL ELSE toks[i - 1] END AS prev,"
                " t AS term))"
            )
        ).alias("p"),
    ).select("doc_id", "p.prev", "p.term")
    scored = (
        inst.join(uni.withColumnRenamed("c", "__cw"), "term", "left")
        .join(bi, ["prev", "term"], "left")
        .join(
            uni.select(
                F.col("term").alias("prev"), F.col("c").alias("__cp")
            ),
            "prev",
            "left",
        )
        .crossJoin(F.broadcast(totals))
    )
    base = (F.coalesce(F.col("__cw"), F.lit(0)) + 1) / (
        F.col("__t") + F.col("__v")
    )
    score = (
        F.when(F.col("prev").isNull(), base)
        .when(F.col("__cb").isNotNull(), F.col("__cb") / F.col("__cp"))
        .otherwise(F.lit(alpha) * base)
    )
    backed_off = (
        F.col("prev").isNotNull() & F.col("__cb").isNull()
    ).cast("int")
    return (
        scored.select(
            "doc_id",
            (-F.log(score)).alias("__nll"),
            backed_off.alias("__bo"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("__nll"), 6).alias("bi_nll"),
            F.round(F.avg("__bo"), 6).alias("backoff_frac"),
        )
    )
