"""Corpus-assembly operators: packing, splitting, stratified sampling.

The last mile of a training-data pipeline after cleaning/dedup: pack
documents into fixed-token-budget training sequences, carve
deterministic train/val/test splits, and draw stratified samples — all
pure DataFrame expressions (windows + hashes, no Python), each with an
ANSI-SQL-expressible definition so the DuckDB oracle can value-check
every row at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphrole_spark.functions.text import token_count


def _md5_long(col):
    """First 8 hex chars of ``md5(col)`` as a long — the engine's ONE
    portable hash primitive (md5 exists in every engine, so DuckDB
    oracles reproduce it bit-for-bit). Every deterministic
    ranking/bucketing expression derives from this single definition:
    :func:`_md5_uniform`, :func:`pack_documents`'s shard,
    ``importance._gram_buckets``."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _md5_bucket(col, n: int):
    """``_md5_long(col) mod n`` — the portable bucket assignment."""
    return F.pmod(_md5_long(col), F.lit(n))


def _md5_uniform(id_col, salt: str):
    """Portable uniform u ∈ [0,1) from md5(id || salt) — the
    deterministic ranking hash shared by :func:`split_assign` and
    :func:`mix_corpus`."""
    return _md5_long(
        F.concat(id_col.cast("string"), F.lit(salt))
    ).cast("double") / F.lit(float(16 ** 8))


def pack_documents(
    documents: DataFrame,
    max_tokens: int,
    text_col: str = "text",
    shards: int = 64,
    boundary: str = "start",
) -> DataFrame:
    """Assign each document to a fixed-token-budget training sequence.

    Documents are sharded by a deterministic md5 hash of ``doc_id`` (so
    packing parallelizes — each shard packs independently) and ordered by
    ``doc_id``. Two cut policies:

    * ``boundary="start"`` (default): a document joins the sequence its
      cumulative-sum *start* falls in — pure window math, zero Python.
      OVERFLOW BOUND: a document straddling the budget line stays in the
      sequence it started, so ``seq_tokens < max_tokens + max(single-doc
      tokens in the shard)``. Callers packing for a hard model-context
      limit should run :func:`chunk_documents` first (bounding doc size)
      and size the budget with that slack, or use ``"strict"``.
    * ``boundary="strict"``: true first-fit cut — a document whose
      addition would exceed ``max_tokens`` starts a new sequence, so
      every multi-document sequence holds ≤ ``max_tokens`` (an oversized
      single document still gets a sequence of its own). The running
      total resets per cut, which no closed-form window expresses, so
      each shard is packed by one Arrow ``applyInPandas`` scan — still
      one shuffle, shard-parallel, O(shard) memory.

    Scale shape: one hash-partition pass per shard — no driver state; at
    10^12 turns the shard count just rises with the cluster. Returns
    ``(doc_id, shard, seq_id, n_tokens, seq_tokens)`` where ``seq_id``
    is the sequence ordinal within the shard and ``seq_tokens`` the
    packed token total of that sequence.
    """
    if boundary not in ("start", "strict"):
        raise ValueError("boundary must be 'start' or 'strict'")
    # null text packs as an empty document (0-token sequence member),
    # not a null-keyed sequence
    n_tok = token_count(F.coalesce(F.col(text_col), F.lit(""))).cast("long")
    # md5-derived shard (not F.hash): portable, so the DuckDB oracle
    # reproduces the exact shard assignment
    shard = _md5_bucket(F.col("doc_id").cast("string"), shards)
    sharded = documents.select(
        "doc_id", shard.alias("shard"), n_tok.alias("n_tokens")
    )
    if boundary == "strict":
        return _pack_strict(sharded, max_tokens)
    w = Window.partitionBy("shard").orderBy("doc_id")
    cum = F.sum("n_tokens").over(w)
    seq = F.floor((cum - F.col("n_tokens")) / F.lit(max_tokens)).alias("seq_id")
    packed = sharded.select("doc_id", "shard", "n_tokens", seq)
    wseq = Window.partitionBy("shard", "seq_id")
    return packed.select(
        "doc_id", "shard", "seq_id", "n_tokens",
        F.sum("n_tokens").over(wseq).alias("seq_tokens"),
    )


def _pack_strict(sharded: DataFrame, max_tokens: int) -> DataFrame:
    """First-fit cut per shard: one grouped Arrow scan, budget never
    exceeded by a multi-document sequence."""
    import numpy as np
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        toks = pdf["n_tokens"].to_numpy()
        seq_ids = np.empty(len(toks), dtype=np.int64)
        seq, running = 0, 0
        for i, t in enumerate(toks):
            if running > 0 and running + t > max_tokens:
                seq += 1
                running = 0
            seq_ids[i] = seq
            running += t
        pdf["seq_id"] = seq_ids
        pdf["seq_tokens"] = pdf.groupby("seq_id")["n_tokens"].transform("sum")
        return pdf[["doc_id", "shard", "seq_id", "n_tokens", "seq_tokens"]]

    out_schema = (
        "doc_id "
        + sharded.schema["doc_id"].dataType.simpleString()
        + ", shard bigint, seq_id bigint, n_tokens bigint, seq_tokens bigint"
    )
    return sharded.groupBy("shard").applyInPandas(pack, schema=out_schema)


def chunk_documents(
    documents: DataFrame,
    max_tokens: int = 256,
    text_col: str = "text",
    stride: int | None = None,
) -> DataFrame:
    """Split oversized documents into ≤ ``max_tokens``-token chunks (the
    downstream step :func:`pack_documents` assumes): tokenize once,
    explode a chunk index, re-join each token slice — all JVM-side
    (split/sequence/slice/array_join), no Python, fan-out proportional
    to output size only. Returns
    ``(doc_id, chunk_idx, chunk_tokens, chunk_text)``.

    ``stride`` (default ``max_tokens`` = disjoint chunks, the original
    contract) sets the start-to-start distance: ``stride < max_tokens``
    yields overlapping sliding windows — the standard long-document
    treatment for pretraining and embedding indexing, where a hard cut
    mid-sentence loses the boundary context both neighbors need. Chunk
    ``i`` covers tokens ``[i*stride, i*stride + max_tokens)``; the
    last window starts at the first position whose window reaches the
    end (every token covered, no degenerate tail windows fully
    contained in the previous one). ``stride > max_tokens`` would skip
    tokens and raises.
    """
    if stride is None:
        stride = max_tokens
    if not 1 <= stride <= max_tokens:
        raise ValueError(
            "stride must be in [1, max_tokens] (stride > max_tokens skips"
            " tokens)"
        )
    # null text chunks as one empty chunk (parity with empty string)
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), " +")
    # disjoint: ceil(n/w) chunks; overlapping: 1 + ceil((n-w)/stride)
    n_chunks = F.greatest(
        (
            F.ceil(
                (F.size(toks) - F.lit(max_tokens)) / F.lit(stride)
            ).cast("long")
            + 1
        ),
        F.lit(1),
    )
    t = documents.select("doc_id", toks.alias("__toks"), n_chunks.alias("__nc"))
    e = t.select(
        "doc_id",
        "__toks",
        F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("chunk_idx"),
    )
    sliced = F.slice(
        F.col("__toks"), (F.col("chunk_idx") * stride + 1).cast("int"), max_tokens
    )
    return e.select(
        "doc_id",
        "chunk_idx",
        F.size(sliced).alias("chunk_tokens"),
        F.array_join(sliced, " ").alias("chunk_text"),
    )


def weighted_sample(
    documents: DataFrame,
    n: int,
    weight_col: str = "n_chars",
    strata_col: str | None = None,
    salt: str = "ws1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-ES): each row gets key ``u^(1/w)`` with a portable
    md5-derived uniform ``u`` (:func:`_md5_uniform`) and weight ``w``;
    the ``n`` largest keys ARE an exact weight-proportional sample
    without replacement. This is the quality-weighted downsampler — "cut
    the corpus to n documents, preferring high quality scores" — that
    plain ``df.sample`` (Bernoulli, replacement-free only per row, no
    weights, partition-order dependent) cannot express.

    Determinism: ``u`` depends only on ``id || salt``, so the chosen
    sample is stable across runs, partitionings and cluster sizes, and
    an external engine reproduces it exactly (the DuckDB oracle repeats
    the same md5 arithmetic). Rows with NULL or non-positive weight are
    excluded (A-ES assigns them key 0 in the limit — they can never
    out-rank a positive-weight row and a 0^0 corner would be
    engine-dependent). Keys are rounded to 12 decimals before ranking
    with the id as tie-break, so cross-engine float noise in ``pow``
    cannot flip a rank.

    Plan (100 TB lens): global mode compiles to TakeOrderedAndProject —
    every partition keeps its local top-``n`` and only ``partitions×n``
    rows reach the driver-side merge; no full sort, no single-partition
    window. Stratified mode (``strata_col``) is one window exchange on
    the stratum key — ``n`` per stratum, same key arithmetic.

    Returns ``(doc_id[, stratum], weight, samp_key, rank)``.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    w = F.col(weight_col).cast("double")
    u = _md5_uniform(F.col(id_col), salt)
    key = F.round(F.pow(u, F.lit(1.0) / w), 12)
    base = documents.where(w.isNotNull() & (w > 0)).select(
        id_col,
        *([F.col(strata_col).alias("stratum")] if strata_col else []),
        w.alias("weight"),
        key.alias("samp_key"),
    )
    if strata_col is None:
        out = base.orderBy(F.desc("samp_key"), F.asc(id_col)).limit(n)
        win = Window.orderBy(F.desc("samp_key"), F.asc(id_col))
        # rank over the already-limited n rows — the window sees ≤ n rows,
        # so the single-partition window is bounded, not a corpus sort
        return out.withColumn("rank", F.row_number().over(win))
    win = Window.partitionBy("stratum").orderBy(
        F.desc("samp_key"), F.asc(id_col)
    )
    return (
        base.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= n)
    )


def split_assign(
    documents: DataFrame,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic, reshuffle-stable train/val/test assignment.

    Hash-based (md5 of ``doc_id`` + salt), so membership depends only on
    the id and the salt — stable across runs, partitionings and cluster
    sizes, and portable (md5 exists in every engine, so the DuckDB
    oracle checks the exact assignment). The first 8 hex digits give a
    uniform u ∈ [0, 1); u < test_frac → test, < test+val → val, else
    train. Returns ``(doc_id, split)``.
    """
    u = _md5_uniform(F.col("doc_id"), salt)
    return documents.select(
        "doc_id",
        F.when(u < test_frac, F.lit("test"))
        .when(u < test_frac + val_frac, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def stratified_sample(
    documents: DataFrame,
    strata_col,
    n_per_stratum: int,
    order_col: str = "doc_id",
) -> DataFrame:
    """Deterministic top-N per stratum (e.g. N docs per language /
    quality bucket): one window rank per stratum, no sampling bias from
    partition order. ``strata_col`` may be a column name or expression.
    Returns the sampled ``(doc_id, stratum)`` rows.
    """
    strata = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    ranked = documents.select(
        "doc_id",
        strata.alias("stratum"),
        F.row_number()
        .over(Window.partitionBy(strata).orderBy(order_col))
        .alias("__rn"),
    )
    return ranked.where(F.col("__rn") <= n_per_stratum).drop("__rn")


def mix_corpus(
    documents: DataFrame,
    weights,
    total_tokens: int,
    text_col: str = "text",
    source_col: str = "source",
    salt: str = "mix1",
) -> DataFrame:
    """Source-weighted corpus mixing under a token budget — the "data
    mixture" step that turns per-source corpora into one training set
    (e.g. web 0.6 / code 0.3 / papers 0.1 of a 10B-token budget).

    Each source gets ``total_tokens * weight/sum(weights)`` tokens.
    Within a source, documents are ranked by the same portable md5 hash
    as :func:`split_assign` (deterministic across runs, partitionings
    and cluster sizes — an unseeded shuffle would make the mixture
    irreproducible) and kept while the running token sum stays within
    the source budget; the first document that crosses the boundary is
    kept too, so every source with a positive budget contributes
    (budget overshoot is bounded by one document, mirroring
    ``pack_documents``' documented ``start`` boundary rule). Sources
    absent from ``weights`` get budget 0 and are dropped entirely.

    One window per source partition (token cumsum), no shuffle beyond
    it — source skew is bounded by the largest single source, the same
    partitioning a per-source bucketed layout would use at scale.

    ``weights`` is either a ``{source: weight}`` dict, or an ``int`` k
    meaning "k equally weighted sources" (budget = total/k for EVERY
    source value) — the dict form builds a per-source CASE chain, so a
    caller with thousands of uniform strata (e.g. ``diversify_corpus``
    cells) must use the int form to keep the expression O(1)-deep.

    Returns ``(doc_id, source, n_tokens, keep)``.
    """
    from .text import token_count

    if isinstance(weights, int):
        budget = F.lit(float(total_tokens) / max(weights, 1))
    else:
        wsum = float(sum(weights.values())) or 1.0
        budget = F.lit(0.0)
        for src, wt in weights.items():
            budget = F.when(
                F.col(source_col) == src, F.lit(total_tokens * float(wt) / wsum)
            ).otherwise(budget)

    u = _md5_uniform(F.col("doc_id"), salt)
    # NOTE: partition by the POST-rename name — source_col no longer
    # exists after the select below (caught by review: any non-default
    # source_col crashed here)
    w = Window.partitionBy("source").orderBy(F.asc("__u"), F.asc("doc_id"))
    scored = documents.select(
        "doc_id",
        F.col(source_col).alias("source"),
        # NULL text → the empty document (0 tokens), same rule as
        # pack/chunk — a NULL would poison the running sum
        F.coalesce(token_count(F.col(text_col)), F.lit(0)).cast("long").alias("n_tokens"),
        u.alias("__u"),
        budget.alias("__budget"),
    )
    cum = F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0))
    prev = cum - F.col("n_tokens")
    return scored.select(
        "doc_id",
        "source",
        "n_tokens",
        # keep while the PREVIOUS cumsum is inside the budget: the
        # boundary-crossing doc is kept, everything after it dropped
        ((prev < F.col("__budget")) & (F.col("__budget") > 0))
        .cast("int")
        .alias("keep"),
    )


def temperature_weights(
    documents: DataFrame,
    alpha: float,
    text_col: str = "text",
    source_col: str = "source",
) -> dict[str, float]:
    """Temperature-smoothed source weights — the mT5/XLM-R multilingual
    sampling rule (Xue et al. 2021 §3.1): with p_s a source's share of
    corpus tokens, sample with q_s ∝ p_s^alpha. ``alpha=1`` keeps the
    natural proportions, ``alpha=0`` is uniform, the usual 0.2–0.7
    range upsamples low-resource sources without letting them dominate.

    One map-side-combinable aggregate (only #sources rows reach the
    driver); the returned ``{source: q_s}`` dict (sums to 1) feeds
    :func:`mix_corpus`'s ``weights``. NULL sources are excluded —
    they'd be dropped by ``mix_corpus`` anyway."""
    from .text import token_count

    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    counts = (
        documents.where(F.col(source_col).isNotNull())
        .groupBy(F.col(source_col).alias("source"))
        .agg(
            F.sum(
                F.coalesce(token_count(F.col(text_col)), F.lit(0)).cast("long")
            ).alias("n_tokens")
        )
        .collect()
    )
    total = float(sum(r.n_tokens for r in counts)) or 1.0
    smoothed = {r.source: (r.n_tokens / total) ** alpha for r in counts}
    z = sum(smoothed.values()) or 1.0
    return {s: q / z for s, q in smoothed.items()}


def temperature_mix(
    documents: DataFrame,
    total_tokens: int,
    alpha: float = 0.3,
    text_col: str = "text",
    source_col: str = "source",
    salt: str = "mix1",
) -> DataFrame:
    """:func:`mix_corpus` with temperature-derived budgets: one tiny
    per-source aggregate computes the α-smoothed weights, then the
    single-window mixing pass applies them. Returns ``mix_corpus``'s
    ``(doc_id, source, n_tokens, keep)``."""
    weights = temperature_weights(
        documents, alpha, text_col=text_col, source_col=source_col
    )
    return mix_corpus(
        documents,
        weights,
        total_tokens,
        text_col=text_col,
        source_col=source_col,
        salt=salt,
    )


def assemble_corpus(
    documents: DataFrame,
    weights: dict,
    total_tokens: int,
    max_seq_tokens: int = 1024,
    text_col: str = "text",
    source_col: str = "source",
    min_tokens: int = 5,
    min_alpha: float = 0.3,
    jaccard_threshold: float = 0.5,
    shards: int = 64,
) -> DataFrame:
    """The full corpus-assembly pipeline as one composition — the
    production path from a raw document table to packed training
    sequences:

    1. quality gate + exact dedup (:func:`~graphrole_spark.functions.
       text.clean_corpus` — the gate runs before any shuffle);
    2. near-duplicate CLUSTER removal: MinHash-LSH pairs →
       alternating-star connected components → keep the longest doc per
       cluster (:func:`~graphrole_spark.functions.dedup_graph.dedup_keep`);
    3. source-weighted token-budget mixing (:func:`mix_corpus`);
    4. strict first-fit sequence packing (:func:`pack_documents`).

    Every stage is the already-tested operator — this function only
    wires survivorship joins between them (left_semi on the surviving
    ids, so document text crosses each boundary exactly once).

    Returns the packed-sequence assignment ``(doc_id, shard, seq_id,
    n_tokens, seq_tokens)`` for the surviving documents.
    """
    from .dedup_graph import dedup_keep
    from .text import clean_corpus, minhash_near_duplicates

    # Each stage's surviving-ID set is localCheckpoint-ed (ids ONLY —
    # never the text, so the materialized footprint is one long column)
    # because downstream stages fan the frame out to several consumers:
    # left lazy, the quality gate's groupBy and the dedup machinery
    # would re-execute per consumer — the recompute-at-fan-out trap
    # PERF.md log 20 documents. Text always flows from the original
    # pruned scan via a semi-join on the checkpointed ids.
    survivors = (
        clean_corpus(documents, text_col, min_tokens=min_tokens, min_alpha=min_alpha)
        .select("doc_id")
        .localCheckpoint()
    )
    cleaned = documents.join(survivors, "doc_id", "left_semi")

    pairs = minhash_near_duplicates(
        cleaned, text_col, jaccard_threshold=jaccard_threshold
    )
    kept = dedup_keep(
        cleaned.withColumn("__len", F.length(text_col)),
        pairs,
        quality_col="__len",
    )
    kept_ids = (
        kept.where(F.col("keep") == 1).select("doc_id").localCheckpoint()
    )
    deduped = cleaned.join(kept_ids, "doc_id", "left_semi")

    mixed = mix_corpus(
        deduped, weights, total_tokens, text_col=text_col, source_col=source_col
    )
    selected_ids = (
        mixed.where(F.col("keep") == 1).select("doc_id").localCheckpoint()
    )
    selected = deduped.join(selected_ids, "doc_id", "left_semi")

    return pack_documents(
        selected, max_seq_tokens, text_col=text_col, shards=shards,
        boundary="strict",
    )


def diversify_corpus(
    documents: DataFrame,
    embeddings: DataFrame,
    total_tokens: int,
    n_cells: int = 16,
    dedup_threshold: float | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    salt: str = "div1",
    max_iters: int = 12,
) -> DataFrame:
    """D4-style embedding-space diversification (Tirumala et al. 2023,
    "D4: Improving LLM Pretraining via Document De-Duplication and
    Diversification"): cluster the corpus in embedding space, optionally
    drop SemDeDup near-duplicates, then spread a token budget EQUALLY
    across the clusters so no dense region of the space dominates the
    training mixture.

    1. one distributed spherical k-means fit over ``embeddings``
       (:func:`~graphrole_spark.functions.clustering.kmeans_fit`);
    2. if ``dedup_threshold`` is set, in-cell SemDeDup with the SAME
       fitted model (:func:`~graphrole_spark.functions.similarity.
       semantic_dedup` — no refit), lower-id survivor keeps;
    3. :func:`mix_corpus` with the cell id as the source and equal
       weights — per-cell token budget ``total_tokens / n_cells``,
       deterministic md5 ranking inside each cell, ≤ one-document
       overshoot per cell.

    Documents are keyed to vectors by ``id_col`` — the SAME column
    name in both tables (inner join — a document without an embedding
    cannot be placed in the space and is dropped; count them upstream
    if that matters). Returns ``(doc_id, cell, n_tokens, dup_drop, keep)`` —
    ``dup_drop`` marks semantic duplicates (never kept), ``keep`` the
    budgeted selection among survivors.
    """
    from .clustering import kmeans_assign, kmeans_fit
    from .similarity import semantic_dedup

    model = kmeans_fit(
        embeddings,
        n_cells=n_cells,
        id_col=id_col,
        vec_col=vec_col,
        max_iters=max_iters,
    )
    cells = kmeans_assign(embeddings, model, vec_col=vec_col).select(
        F.col(id_col).alias("doc_id"), F.col("cell").cast("long").alias("cell")
    )
    if dedup_threshold is not None:
        dd = semantic_dedup(
            embeddings,
            dedup_threshold,
            id_col=id_col,
            vec_col=vec_col,
            cells="kmeans",
            model=model,
        ).select(F.col("vec_id").alias("doc_id"), F.col("keep").alias("__dk"))
        cells = cells.join(dd, "doc_id").withColumn(
            "dup_drop", ~F.col("__dk")
        ).drop("__dk")
    else:
        cells = cells.withColumn("dup_drop", F.lit(False))
    # materialize the (id, cell, dup_drop) placement ONCE: it feeds both
    # the mix_corpus branch and the output join, and its lineage holds
    # the assignment UDF + the dedup self-join — the expensive subtrees.
    # Three longs + a bool per row.
    cells = cells.localCheckpoint()

    placed = documents.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    ).join(cells, "doc_id")
    survivors = placed.where(~F.col("dup_drop"))
    mixed = mix_corpus(
        survivors,
        len(model.centroids),  # int = uniform budget, O(1) expression
        total_tokens,
        text_col="__text",
        source_col="cell",
        salt=salt,
    ).select("doc_id", "n_tokens", (F.col("keep") == 1).alias("__mk"))
    from .text import token_count

    return (
        placed.select(
            "doc_id",
            "cell",
            F.coalesce(token_count(F.col("__text")), F.lit(0))
            .cast("long")
            .alias("n_tokens"),
            "dup_drop",
        )
        .join(mixed.select("doc_id", "__mk"), "doc_id", "left")
        .select(
            "doc_id",
            "cell",
            "n_tokens",
            "dup_drop",
            F.coalesce("__mk", F.lit(False)).alias("keep"),
        )
    )


def corpus_stats(
    documents: DataFrame,
    by: str = "source",
    text_col: str = "text",
    lang_col: str | None = "lang",
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-``by``-group corpus profile — the health dashboard a mixing /
    budgeting decision reads before anything touches the trainer: doc
    and token volumes, length distribution, null/empty rates, language
    spread, and the exact-duplicate rate.

    Plan: one full-corpus aggregation keyed on ``by`` (all moments +
    exact quartiles in the same pass) plus one pre-aggregation on
    ``(by, md5(text))`` for the duplicate rate, rolled up and joined to
    the profile — both shuffles carry compact keyed longs and the
    output is one row per group, so the profile is linear at 100 TB.
    Quartiles use exact ``percentile`` at binary-exact fractions
    (.25/.5/.75) over integer token counts, so DuckDB's
    ``quantile_cont`` reproduces them bit-for-bit (lerp of integers at
    an exactly-representable fraction).

    ``approx=True`` is the beyond-10^8-docs-per-group path: exact
    ``percentile`` buffers every group's values in executor memory
    (fine at profile scale, unbounded at 100 TB), so the approx mode
    swaps in ``percentile_approx`` — a mergeable bounded-memory sketch
    (map-side combined like every other agg here) with rank error
    ≤ 1/``accuracy`` — and keeps every other column identical and
    exact. Approx quartiles return observed values (no lerp), so the
    DuckDB oracle applies only to the default mode.

    NULL text counts as empty (0 tokens) everywhere — the same
    convention as the packers/cleaners — and is also reported
    separately as ``null_text``.

    Returns one row per group: ``(<by>, n_docs, null_text, empty_text,
    total_tokens, mean_tokens, q1_tokens, median_tokens, q3_tokens,
    max_tokens, mean_chars, n_langs, dup_docs, dup_frac)``.
    """
    from .text import token_count

    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = token_count(txt)
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    prof = (
        documents.select(
            F.col(by),
            F.col(text_col).isNull().cast("int").alias("__null"),
            (F.trim(txt) == "").cast("int").alias("__empty"),
            toks.cast("long").alias("__t"),
            F.length(txt).cast("long").alias("__c"),
            *( [F.col(lang_col)] if lang_col else [] ),
        )
        .groupBy(by)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__null").alias("null_text"),
            F.sum("__empty").alias("empty_text"),
            F.sum("__t").alias("total_tokens"),
            F.round(F.avg("__t"), 6).alias("mean_tokens"),
            (
                # cast: approx returns observed longs; keep the exact
                # mode's array<double> schema so writers see one type
                F.percentile_approx("__t", qs, F.lit(accuracy)).cast(
                    "array<double>"
                )
                if approx
                else F.percentile("__t", qs)
            ).alias("__q"),
            F.max("__t").alias("max_tokens"),
            F.round(F.avg("__c"), 6).alias("mean_chars"),
            *(
                [F.countDistinct(lang_col).alias("n_langs")]
                if lang_col
                else [F.lit(None).cast("long").alias("n_langs")]
            ),
        )
        .select(
            by,
            "n_docs", "null_text", "empty_text", "total_tokens",
            "mean_tokens",
            F.element_at("__q", 1).alias("q1_tokens"),
            F.element_at("__q", 2).alias("median_tokens"),
            F.element_at("__q", 3).alias("q3_tokens"),
            "max_tokens", "mean_chars", "n_langs",
        )
    )
    dup = (
        documents.groupBy(F.col(by), F.md5(txt).alias("__h"))
        .agg(F.count("*").alias("__n"))
        .groupBy(by)
        .agg((F.sum("__n") - F.count("*")).alias("dup_docs"))
    )
    return prof.join(dup, by).withColumn(
        "dup_frac", F.round(F.col("dup_docs") / F.col("n_docs"), 6)
    )


def upsample_corpus(
    documents: DataFrame,
    epochs: dict[str, float],
    by: str = "source",
    id_col: str = "doc_id",
    salt: str = "upsample",
) -> DataFrame:
    """Epoch upsampling — materialize the repeats a training mix
    prescribes (the Llama/GPT-style "this source runs 3.7 epochs"
    knob, the inverse of :func:`mix_corpus`'s subsampling): every doc
    of a source with budget ``e`` appears ``floor(e)`` times, and a
    deterministic ``frac(e)``-share of its docs (md5-uniform on
    ``source|doc_id`` — reshuffle-stable, engine-portable) appears once
    more, tagged with an ``epoch`` index so downstream shuffling /
    packing can keep copies apart.

    ``e < 1`` degenerates to deterministic subsampling (0 full epochs +
    an ``e``-share), so one operator covers both directions of a mix.
    Sources absent from ``epochs`` are dropped (budget 0 — make them
    explicit if they should survive).

    Plan: broadcast the tiny budget dim, ``explode(sequence(...))`` +
    one codegen filter — a narrow map over the corpus scan, no shuffle,
    output rows = exactly the token budget's doc multiples. At 100 TB
    prefer this lazy epoch column over physically copying text bytes:
    downstream operators that only need (id, epoch) never pay for the
    duplication.
    """
    spark = documents.sparkSession
    dim = spark.createDataFrame(
        [(k, float(v)) for k, v in epochs.items()],
        f"{by} string, __e double",
    )
    n_full = F.floor("__e").cast("int")
    frac = F.col("__e") - F.floor("__e")
    u = _md5_uniform(
        F.concat(F.col(by), F.lit("|"), F.col(id_col).cast("string")), salt
    )
    return (
        documents.join(F.broadcast(dim), by, "inner")
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), n_full + 1)))
        .where((F.col("epoch") <= n_full) | (u < frac))
        .drop("__e")
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str | None = "source",
) -> DataFrame:
    """Snapshot delta between two corpus versions — the audit a
    curation pipeline runs before promoting a new Iceberg snapshot:
    which documents were added, removed, or changed (by content hash),
    and how the per-``by``-group token budget moved.

    Plan: both sides reduce to ``(id, md5(text), tokens, group)``
    projections before a single full outer join on ``id`` — the only
    shuffle, hash-partitioned on the id — then one small rollup per
    group × status.  Text bytes never shuffle; at 100 TB the join
    carries three longs and two short strings per doc.

    NULL text hashes as the empty doc (the engine-wide convention), so
    NULL→'' edits are *unchanged*.  ``by`` uses the NEW side's group
    for added/changed rows and the old side's for removed rows.

    Returns one row per (group, status) with ``status`` in
    ``added | removed | changed | unchanged``: ``(group?, status,
    n_docs, tokens_old, tokens_new, token_delta)``.
    """
    from .text import token_count

    def slim(df, tag):
        txt = F.coalesce(F.col(text_col), F.lit(""))
        cols = [
            F.col(id_col).alias("__id"),
            F.md5(txt).alias(f"__h_{tag}"),
            token_count(txt).cast("long").alias(f"__t_{tag}"),
        ]
        if by:
            cols.append(F.col(by).alias(f"__g_{tag}"))
        return df.select(*cols)

    j = slim(old, "o").join(slim(new, "n"), "__id", "full_outer")
    status = (
        F.when(F.col("__h_o").isNull(), F.lit("added"))
        .when(F.col("__h_n").isNull(), F.lit("removed"))
        .when(F.col("__h_o") == F.col("__h_n"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    grp = (
        [F.coalesce("__g_n", "__g_o").alias(by)] if by else []
    )
    return (
        j.select(
            *grp,
            status.alias("status"),
            F.coalesce("__t_o", F.lit(0)).alias("__to"),
            F.coalesce("__t_n", F.lit(0)).alias("__tn"),
        )
        .groupBy(*([by] if by else []), "status")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__to").alias("tokens_old"),
            F.sum("__tn").alias("tokens_new"),
            (F.sum("__tn") - F.sum("__to")).alias("token_delta"),
        )
    )


def curriculum_order(
    documents: DataFrame,
    score_col: str,
    phases: int = 3,
    n_shards: int = 64,
    id_col: str = "doc_id",
    salt: str = "curriculum",
) -> DataFrame:
    """Curriculum-learning materialization: order the corpus
    easy-first.  Phase = the fitted percentile tier of ``score_col``
    (ascending — phase 1 trains first; negate the score upstream for
    hard-first), via :func:`terms.score_cutpoints` +
    :func:`terms.score_buckets_apply`, i.e. ONE tiny percentile
    aggregate and a windowless broadcast projection.  Within a phase,
    documents get a deterministic md5-uniform shuffle ``pos`` inside a
    deterministic md5 ``shard`` — the loader streams shards in any
    interleaving, reading each (phase, shard) in ``pos`` order, and
    the whole ordering is reproducible from (salt, n_shards) alone.

    The only window runs per (phase, shard) — ``corpus/(phases ×
    n_shards)`` rows per partition, so no global sort and no
    single-reducer phase at any corpus size (same bound as
    ``pack_documents``'s sharding).  NULL scores get NULL phase
    (excluded from every curriculum phase — score them or drop them
    upstream).

    Returns ``(<id_col>, <score_col>, phase, shard, pos)``.
    """
    from graphrole_spark.functions.terms import (
        score_buckets_apply,
        score_cutpoints,
    )

    cuts = score_cutpoints(documents, score_col, buckets=phases)
    tiers = (
        score_buckets_apply(documents, cuts, score_col)
        .withColumnRenamed("bucket", "phase")
        .drop("bucket_label")
    )
    u = _md5_uniform(F.col(id_col).cast("string"), salt)
    sharded = tiers.select(
        id_col,
        score_col,
        "phase",
        _md5_bucket(F.col(id_col).cast("string"), n_shards)
        .cast("int")
        .alias("shard"),
        u.alias("__u"),
    )
    w = Window.partitionBy("phase", "shard").orderBy("__u", id_col)
    return sharded.withColumn(
        "pos", (F.row_number().over(w) - 1).cast("int")
    ).drop("__u")
