"""Text analysis + deduplication operators for document tables.

Everything in this module is built from JVM-side expressions (string
functions, higher-order array functions, xxhash64) — no Python UDFs —
so the hot path stays inside whole-stage codegen and the operators
scale to billions of documents:

* exact dedup: md5 content hash → groupBy;
* MinHash + LSH near-dup: shingle → per-seed min-hash signature →
  banded bucket join → Jaccard verification with array set ops;
* SimHash: 64-bit sign-aggregated token hashes + Hamming banding;
* token counting, quality scoring, n-gram Jaccard, language heuristic,
  rolling-hash fingerprinting.
"""

from typing import Optional

import pandas as pd  # module-level: pandas_udf type hints must resolve
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# -- primitives -------------------------------------------------------------

def token_count(text: Column) -> Column:
    """Whitespace token count = number of maximal non-space runs, one
    regex pass, no intermediate string allocation (3.5x the
    trim+collapse+length-arithmetic form at 32M rows). Value-identical
    to the collapsed-space formula the DuckDB oracles still use
    (`length(norm)-length(replace(norm,' ',''))+1` on the trimmed,
    space-collapsed text) — parity checked on 32.6M synthetic
    transcripts with zero differing rows."""
    return F.regexp_count(text, F.lit("[^ ]+"))


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), " +")


# deliberately lookahead-free so Java regex (Spark) and RE2 (DuckDB
# oracle) agree: letter runs | digit runs | single non-alnum glyphs —
# the segmentation a byte-level BPE pre-tokenizer starts from
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish pre-tokenizer segment count (the training-cost proxy a
    data pipeline budgets with, vs the whitespace count of
    :func:`token_count`): counts letter runs, digit runs and individual
    punctuation glyphs via one codegen ``regexp_count`` — no Python."""
    return F.regexp_count(text, F.lit(BPE_SPLIT_PATTERN))


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams as an array column (JVM higher-order fns)."""
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.array_distinct(grams)


def minhash_signature(shingle_col: Column, n_hashes: int = 32, seed: int = 7) -> Column:
    """Array of n_hashes min-hash values over the shingle set.

    The shingle *strings* are hashed exactly once; the hash family is
    derived by re-hashing the resulting 8-byte longs (xxhash64 on a
    long is ~10x cheaper than on a string, so signature cost is
    1 string pass + n cheap long passes instead of n string passes).
    """
    base = F.transform(shingle_col, lambda s: F.xxhash64(s, F.lit(seed)))
    return minhash_signature_from_hashes(base, n_hashes, seed)


def minhash_signature_from_hashes(
    hashed_col: Column, n_hashes: int = 32, seed: int = 7
) -> Column:
    """Signature over pre-hashed shingles (array<long>)."""
    return F.array(
        *[
            F.array_min(
                F.transform(hashed_col, lambda h: F.xxhash64(h, F.lit(seed + 1 + i)))
            )
            for i in range(n_hashes)
        ]
    )


_BIT_MASKS = [1 << b for b in range(63)] + [-(1 << 63)]  # long-typed bit masks


def simhash64(text: Column) -> Column:
    """64-bit SimHash of the whitespace tokens (Charikar 2002) as a pure
    column expression (HOF fold). NOTE: higher-order functions are
    interpreted, not codegen'd — document-scale callers should use
    :func:`simhash_frame`, which computes the identical value with an
    explode + 64 conditional sums (whole-stage codegen end to end)."""
    hashes = F.transform(tokens(text), lambda t: F.xxhash64(t))
    masks = F.array(*[F.lit(m).cast("long") for m in _BIT_MASKS])
    zeros = F.array_repeat(F.lit(0).cast("long"), 64)
    counts = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a
            + F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)).cast("long"),
        ),
    )
    return F.aggregate(
        F.zip_with(
            counts, masks, lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc.bitwiseOR(v),
    )


def simhash_frame(
    documents: DataFrame, text_col: str = "text", out_col: str = "sim",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, simhash64) per document, vectorized for scale.

    Same value as :func:`simhash64`, different physical plan: explode the
    tokens, hash each once, and aggregate 64 conditional ±1 sums per
    document (bit b set iff its sum > 0). Everything stays inside
    whole-stage codegen; the explode preserves input partitioning, so
    map-side partial aggregation collapses each document to one row
    before any shuffle.
    """
    tok_hashes = documents.select(
        id_col, F.explode(tokens(F.col(text_col))).alias("__tok")
    ).select(id_col, F.xxhash64("__tok").alias("__h"))
    count_aggs = [
        F.sum(
            F.when(F.col("__h").bitwiseAND(F.lit(m).cast("long")) != 0, 1).otherwise(-1)
        ).alias(f"__c{b}")
        for b, m in enumerate(_BIT_MASKS)
    ]
    counts = tok_hashes.groupBy(id_col).agg(*count_aggs)
    sim = F.lit(0).cast("long")
    for b, m in enumerate(_BIT_MASKS):
        sim = sim.bitwiseOR(
            F.when(F.col(f"__c{b}") > 0, F.lit(m).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return counts.select(id_col, sim.alias(out_col))


def alpha_ratio(text: Column) -> Column:
    alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    return F.round(alpha / F.greatest(F.length(text), F.lit(1)), 6)


_RK_BASE = 1000003                      # odd → invertible mod 2^64
_RK_BASE_INV = pow(_RK_BASE, -1, 1 << 64)


def _rk_window_hashes(data: "np.ndarray", window: int, pow_inv: "np.ndarray",
                      pow_fwd: "np.ndarray") -> "np.ndarray":
    """All Rabin-Karp window hashes of a byte array, fully vectorized.

    The prefix recurrence P[i+1] = P[i]*B + c[i] is a scan, but with B
    odd it factors as P[i] = (Σ_{j<i} c[j]·B^{-j}) · B^{i-1} mod 2^64 —
    a cumsum times a power table, so the whole document is three numpy
    passes (uint64 wraparound IS the mod-2^64 arithmetic)."""
    import numpy as np

    n = len(data)
    s = np.cumsum(data * pow_inv[:n], dtype=np.uint64)          # Σ c_j B^-j
    p = np.empty(n + 1, dtype=np.uint64)
    p[0] = 0
    p[1:] = s * pow_fwd[:n]                                     # P[1..n]
    w = min(window, n)
    bw = pow_fwd[w] if w < len(pow_fwd) else np.uint64(pow(_RK_BASE, w, 1 << 64))
    # W[i] = P[i+w] − P[i]·B^w  for i = 0..n−w
    return p[w:] - p[: n - w + 1] * bw


def _rk_fmix(h: "np.ndarray") -> "np.ndarray":
    """murmur3 fmix64 finalizer: polynomial hashes of overlapping windows
    are correlated; the mix disperses them before the min."""
    import numpy as np

    h = h.astype(np.uint64).copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def rolling_fingerprint(text: Column, window: int = 8) -> Column:
    """Deterministic document fingerprint: minimum mixed Rabin-Karp hash
    over all ``window``-byte UTF-8 windows (winnowing collapsed to one
    value — equal-content docs collide, shifted near-dups usually share
    the minimizing window).

    One Arrow ``pandas_udf``: per document the rolling hash is three
    vectorized numpy passes (see :func:`_rk_window_hashes`) — the r01/r02
    form evaluated an interpreted higher-order function per character
    window, O(len·window) inside the expression interpreter; this is
    O(len) in C. Value parity with the pure-python recurrence is
    pytest-pinned. Documents shorter than the window hash as one whole-
    text window; empty/null-safe."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def fp(texts: pd.Series) -> pd.Series:
        if texts.empty:
            return pd.Series([], dtype="float64")
        datas = [
            None if t is None else np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            .astype(np.uint64)
            for t in texts
        ]
        max_n = max((len(d) for d in datas if d is not None), default=0)
        size = max(max_n + 1, window + 1)
        pow_inv = np.empty(size, dtype=np.uint64)
        pow_fwd = np.empty(size, dtype=np.uint64)
        pow_inv[0] = pow_fwd[0] = 1
        np.cumprod(np.full(size - 1, _RK_BASE_INV, dtype=np.uint64),
                   out=pow_inv[1:], dtype=np.uint64)
        np.cumprod(np.full(size - 1, _RK_BASE, dtype=np.uint64),
                   out=pow_fwd[1:], dtype=np.uint64)
        out = []
        for d in datas:
            if d is None:
                out.append(None)
            elif len(d) == 0:
                out.append(int(_rk_fmix(np.zeros(1, dtype=np.uint64))[0]
                               .astype(np.int64)))
            else:
                hs = _rk_fmix(_rk_window_hashes(d, window, pow_inv, pow_fwd))
                out.append(int(hs.min().astype(np.int64)))
        return pd.Series(out, dtype="object")

    return fp(text)


# -- document-level operators -------------------------------------------------

def exact_duplicates(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per content hash with the
    canonical (min) doc_id and the duplicate count."""
    return (
        documents.select(F.md5(F.col(text_col)).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc"),
            F.count("*").alias("n_docs"),
        )
    )


def cap_duplicates(
    documents: DataFrame,
    k: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Frequency-capped dedup: keep at most ``k`` copies of each
    exact-content group instead of collapsing to one. Full exact dedup
    throws away the natural upweighting of popular content (a license
    header is junk at 10^6 copies but a famous poem at 50 copies is
    signal); the standard compromise caps the copy count so duplicated
    content keeps bounded influence on the training mix.

    Output: every input row with ``n_copies`` (group size),
    ``dup_rank`` (1-based position inside the group, deterministic
    lowest-``id_col``-first) and ``keep`` (``dup_rank <= k``). NULL
    text hashes like empty text does NOT: NULL-text rows form their
    own group (null-safe md5 via coalesce would conflate them with
    ''), so they rank among themselves.

    One content-hash exchange (window); no joins, no Python. Filtering
    is the caller's ``where(keep = 1)`` — emitting the flag keeps the
    operator audit-friendly and lets the driver oracle check every row.
    """
    if k < 1:
        raise ValueError("k must be >= 1 (k=1 is exact dedup)")
    h = F.when(
        F.col(text_col).isNotNull(), F.md5(F.col(text_col))
    )  # NULL text -> NULL hash; window treats NULL as its own group
    w = Window.partitionBy(h).orderBy(F.col(id_col).asc())
    return documents.select(
        "*",
        F.count("*").over(Window.partitionBy(h)).cast("long").alias("n_copies"),
        F.row_number().over(w).cast("int").alias("dup_rank"),
    ).withColumn("keep", (F.col("dup_rank") <= k).cast("int"))


def dedup_weights(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Soft dedup: collapse each exact-content group to its canonical
    (min-id) survivor carrying ``weight = group size`` — the
    loss-reweighting alternative to dropping duplicates outright.
    Training on the survivor with a per-example weight preserves the
    corpus' empirical distribution (a document seen 50 times still
    contributes 50 examples' worth of gradient) while the dataset
    itself shrinks to distinct content; downstream samplers
    (:func:`~graphrole_spark.functions.corpus.weighted_sample`) and
    loss-weighted trainers consume the weight column directly.

    One hash groupBy (identical shuffle shape to
    :func:`exact_duplicates`); NULL text forms its own group, matching
    :func:`cap_duplicates`. Returns ``(doc_id, content_hash, weight)``
    with one row per distinct content.
    """
    h = F.when(F.col(text_col).isNotNull(), F.md5(F.col(text_col)))
    return (
        documents.select(h.alias("content_hash"), id_col)
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").cast("long").alias("weight"),
        )
        .select(id_col, "content_hash", "weight")
    )


def source_overlap(
    documents: DataFrame,
    key=None,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Cross-source duplication matrix: for every source pair, how many
    distinct content keys appear in BOTH — the audit that catches one
    crawl re-ingesting another (or an eval set leaking into a training
    source) before mixing weights are chosen.

    ``key`` is the content key expression (default: md5 of the raw
    text). Pass a coarser key — a normalized-prefix hash, a minhash
    band, a fingerprint — to measure near-boilerplate overlap instead
    of byte-exact overlap.

    Plan (100 TB lens): dedupe to distinct ``(source, key)`` pairs
    (one hash aggregate), then self-equi-join on the key — the join
    fan-out per key is bounded by the number of sources carrying it
    (never all-pairs over documents), and the pair aggregate is
    partial-aggregated map-side. A second tiny aggregate (per-source
    distinct-key totals, broadcast back) turns shared counts into
    coverage fractions. Returns
    ``(source_a, source_b, n_shared, frac_a, frac_b)`` with
    ``source_a < source_b``, fractions rounded to 6.
    """
    if key is None:
        key = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    if not isinstance(key, Column):
        raise TypeError("key must be a Column expression or None")
    base = documents
    pairs = (
        base.select(F.col(source_col).alias("source"), key.alias("__k"))
        .distinct()
    )
    totals = pairs.groupBy("source").agg(
        F.count("*").cast("long").alias("__total")
    )
    a = pairs.select(F.col("source").alias("source_a"), "__k")
    b = pairs.select(F.col("source").alias("source_b"), "__k")
    shared = (
        a.join(b, "__k")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    ta = F.broadcast(totals.select(F.col("source").alias("source_a"),
                                   F.col("__total").alias("__ta")))
    tb = F.broadcast(totals.select(F.col("source").alias("source_b"),
                                   F.col("__total").alias("__tb")))
    return (
        shared.join(ta, "source_a")
        .join(tb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(F.col("n_shared") / F.col("__ta"), 6).alias("frac_a"),
            F.round(F.col("n_shared") / F.col("__tb"), 6).alias("frac_b"),
        )
    )


def dedup_lines(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document line deduplication (the C4 / RefinedWeb boilerplate
    scrub): drop every occurrence of any whitespace-trimmed line that
    appears in at least ``min_docs`` DISTINCT documents — the "Share on
    Facebook" / cookie-banner lines that survive document-level dedup —
    and rebuild each document from its surviving lines.

    Plan shape (scales to corpus size): posexplode the line split with
    blank lines dropped; ONE corpus-wide partial-aggregated groupBy on
    the line counting distinct documents (the frequent-line set is a
    tiny heavy-hitter list); BROADCAST it back onto the exploded lines
    as a dup flag; ONE groupBy per document rebuilds the text via a
    sort_array over (idx, line) structs. Two shuffles total, no
    all-pairs comparison. A line repeated many times inside a single
    document is NOT boilerplate under this rule (distinct-doc count),
    so it survives — :func:`quality_features`' ``dup_line_frac`` covers
    that case.

    Output is ``(doc_id, text, n_lines_kept, n_lines_dropped)`` — lines
    come back trimmed and blank lines are not preserved; documents whose
    every line was boilerplate (or that had no non-blank lines) return
    empty text so downstream length filters make the drop decision.
    """
    lines = (
        documents.select(
            id_col,
            F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
                "__idx", "__raw"
            ),
        )
        .select(id_col, "__idx", F.trim("__raw").alias("__line"))
        .where(F.length("__line") > 0)
    )
    frequent = (
        lines.groupBy("__line")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__line", F.lit(True).alias("__dup"))
    )
    flagged = lines.join(F.broadcast(frequent), "__line", "left")
    keep = ~F.coalesce(F.col("__dup"), F.lit(False))
    rebuilt = flagged.groupBy(id_col).agg(
        F.sum(F.when(keep, 0).otherwise(1)).cast("long").alias("n_lines_dropped"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_lines_kept"),
        # collect_list skips NULLs, so dup lines fall out of the rebuild
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(
                    F.collect_list(F.when(keep, F.struct("__idx", "__line")))
                ),
                lambda s: s["__line"],
            ),
        ).alias("__text"),
    )
    return (
        documents.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("__text", F.lit("")).alias(text_col),
            F.coalesce("n_lines_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
            F.coalesce("n_lines_dropped", F.lit(0))
            .cast("long")
            .alias("n_lines_dropped"),
        )
    )


def duplicate_ngram_stats(
    documents: DataFrame,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Cross-document repeated-span statistics, the exact-substring
    contamination diagnostic of "Deduplicating Training Data Makes
    Language Models Better" (Lee et al. 2022) at n-gram granularity:
    an n-gram is *duplicated* when it occurs in ≥ 2 distinct documents,
    and per document we report how much of it is built from such spans.

    Returns one row per input document:

    * ``n_grams`` — total n-gram positions (0 if the doc has < n tokens);
    * ``dup_grams`` — positions whose n-gram also appears elsewhere;
    * ``dup_frac`` — ``dup_grams / n_grams`` rounded to 6 decimals
      (0.0 for short docs);
    * ``max_dup_span`` — length **in tokens** of the longest run of
      consecutive duplicated n-grams (a run of r grams covers r + n - 1
      tokens), i.e. the longest verbatim span shared with another
      document; 0 when none.

    Scale notes (100 TB lens): each token string is hashed ONCE, in its
    own projection; a gram's 64-bit key is then ``xxhash64`` of its n
    token hashes — O(1) array reads per position, no per-gram string
    slice/concat (the naive slice+concat_ws form is O(len·n)
    interpreted work per doc, and posexplode behind a size() filter
    additionally trips Catalyst's InferFiltersFromGenerate re-inlining
    — the same trap :func:`minhash_bands` documents; measured 24.3 s →
    1.5 s at sf0.01). 64-bit keys shuffle instead of strings; a
    cross-doc collision needs ~2^32 grams to matter and can only flip
    one gram's dup bit. The duplicated-gram set is one distinct + one
    filtered count over the gram key; marking is a hash equi-join on
    the same key (no broadcast of corpus-sized state); the run
    statistics are gaps-and-islands windows partitioned by doc — all
    shuffles are on the gram hash or doc_id, nothing is collected to
    the driver.
    """
    toks = F.filter(
        tokens(F.coalesce(F.col(text_col), F.lit(""))), lambda t: t != ""
    )
    # token-hash array in its own projection: inlining it into the gram
    # lambda would re-run the tokenizer per position (O(len²) per doc)
    th_frame = documents.select(
        "doc_id", F.transform(toks, lambda t: F.xxhash64(t)).alias("__th")
    )
    th = F.col("__th")

    # chained zip_with over shifted slices — O(n) one-hash interpreted
    # ops per position; the former transform-over-positions with n
    # F.get(th, i+j) reads walked a ~10-node expression per position
    # and measured 7.5× slower on the top_ngrams pass-1 twin (PERF.md
    # 41). Gram key = left-fold xxhash64 of the n token hashes.
    _m = F.size(th) - n + 1
    _acc = F.slice(th, 1, _m)
    for _j in range(1, n):
        _acc = F.zip_with(
            _acc, F.slice(th, 1 + _j, _m), lambda a, b: F.xxhash64(a, b)
        )
    gram_arr = F.when(F.size(th) >= n, _acc).otherwise(
        F.array().cast("array<bigint>")
    )
    # posexplode_OUTER + post-filter on the generated position: plain
    # posexplode lets InferFiltersFromGenerate push a size(...) > 0
    # predicate below the projections, re-inlining the whole nested
    # gram expression into the scan (the minhash_bands dodge above)
    grams = (
        th_frame.select("doc_id", gram_arr.alias("__g"))
        .select("doc_id", F.posexplode_outer("__g").alias("pos", "gram"))
        .where(F.col("pos").isNotNull())
    )
    dup = (
        grams.select("doc_id", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count("*").alias("__nd"))
        .where(F.col("__nd") >= 2)
        .select("gram", F.lit(1).alias("__dup"))
    )
    marked = grams.join(dup, "gram", "left")
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        marked.where(F.col("__dup").isNotNull())
        .withColumn("__isl", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "__isl")
        .agg(F.count("*").alias("__run"))
        .groupBy("doc_id")
        .agg(F.max("__run").alias("__maxrun"))
    )
    totals = marked.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.count("__dup").alias("dup_grams"),
    )
    return (
        documents.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(runs, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("dup_grams", F.lit(0)).cast("bigint").alias("dup_grams"),
            F.round(
                F.when(F.coalesce("n_grams", F.lit(0)) == 0, 0.0).otherwise(
                    F.col("dup_grams") / F.col("n_grams")
                ),
                6,
            ).alias("dup_frac"),
            F.coalesce(F.col("__maxrun") + (n - 1), F.lit(0))
            .cast("bigint")
            .alias("max_dup_span"),
        )
    )


def remove_duplicate_spans(
    documents: DataFrame,
    n: int = 8,
    min_span_tokens: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring deduplication (Lee et al. 2022, ExactSubstr):
    delete verbatim cross-document spans, keeping one copy globally.

    The removal counterpart of :func:`duplicate_ngram_stats`, at the
    same n-gram granularity:

    * a gram (n consecutive tokens) is *duplicated* when it occurs in
      ≥ 2 distinct documents;
    * each duplicated gram has one deterministic **owner** occurrence —
      the globally minimal ``(doc_id, pos)`` — which is kept;
    * every other occurrence is *redundant*; maximal runs of
      consecutive redundant positions cover ``run + n - 1`` tokens, and
      runs covering ≥ ``min_span_tokens`` tokens are deleted from the
      text (Lee et al. delete one of each pair of ≥ 50-token repeats;
      the default here is lower so the operator is exercised by small
      test corpora — pass 50 for the paper's setting).

    Returns one row per input document:
    ``(doc_id, text, n_tokens, removed_tokens)`` where ``text`` is the
    cleaned document (surviving tokens joined by single spaces — the
    same whitespace normalization :func:`clean_corpus` applies),
    ``n_tokens`` the pre-removal token count and ``removed_tokens`` how
    many tokens were deleted. Documents with no qualifying span pass
    through with ``removed_tokens = 0``; documents shorter than ``n``
    tokens are never touched.

    Scale notes (100 TB lens): gram keys are 64-bit xxhash64 of
    once-hashed tokens (the :func:`duplicate_ngram_stats` construction
    — no per-gram string slicing, no re-inlined generators); ownership
    is one ``min(struct(doc_id, pos))`` in the same aggregation that
    counts distinct docs per gram; redundancy marking is a hash
    equi-join on the gram key; runs/intervals are gaps-and-islands
    windows partitioned by doc_id; the rebuild joins the per-doc
    interval list (bounded by the doc's run count, usually a handful)
    back to the documents table and filters the token array with a
    higher-order ``exists`` — O(tokens × intervals) inside the task,
    nothing collected to the driver, shuffles only on the gram hash and
    doc_id.
    """
    toks_expr = F.filter(
        tokens(F.coalesce(F.col(text_col), F.lit(""))), lambda t: t != ""
    )
    th_frame = documents.select(
        "doc_id", F.transform(toks_expr, lambda t: F.xxhash64(t)).alias("__th")
    )
    th = F.col("__th")

    # chained zip_with gram keys (see duplicate_ngram_stats — same
    # left-fold xxhash64 construction, same O(n)-ops-per-position win)
    _m = F.size(th) - n + 1
    _acc = F.slice(th, 1, _m)
    for _j in range(1, n):
        _acc = F.zip_with(
            _acc, F.slice(th, 1 + _j, _m), lambda a, b: F.xxhash64(a, b)
        )
    gram_arr = F.when(F.size(th) >= n, _acc).otherwise(
        F.array().cast("array<bigint>")
    )
    # posexplode_OUTER + post-filter: dodge InferFiltersFromGenerate
    # re-inlining the gram expression below the projection (see
    # duplicate_ngram_stats / minhash_bands)
    grams = (
        th_frame.select("doc_id", gram_arr.alias("__g"))
        .select("doc_id", F.posexplode_outer("__g").alias("pos", "gram"))
        .where(F.col("pos").isNotNull())
    )
    owners = (
        grams.groupBy("gram")
        .agg(
            F.count_distinct("doc_id").alias("__nd"),
            F.min(F.struct("doc_id", "pos")).alias("__own"),
        )
        .where(F.col("__nd") >= 2)
        .select("gram", "__own")
    )
    redundant = (
        grams.join(owners, "gram")
        .where(
            ~(
                (F.col("doc_id") == F.col("__own.doc_id"))
                & (F.col("pos") == F.col("__own.pos"))
            )
        )
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    intervals = (
        redundant.withColumn("__isl", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "__isl")
        .agg(F.min("pos").alias("s"), F.count("*").alias("r"))
        # a run of r grams covers tokens [s, s + r + n - 2]
        .withColumn("e", F.col("s") + F.col("r") + F.lit(n - 2))
        .where(F.col("e") - F.col("s") + 1 >= min_span_tokens)
        .groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("s").cast("long").alias("s"),
                    F.col("e").cast("long").alias("e"),
                )
            ).alias("__iv")
        )
    )
    iv = F.coalesce(F.col("__iv"), F.array().cast("array<struct<s:long,e:long>>"))
    indexed = F.transform(
        toks_expr, lambda t, i: F.struct(t.alias("t"), i.cast("long").alias("i"))
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(iv, lambda v: (s["i"] >= v["s"]) & (s["i"] <= v["e"])),
    )
    return (
        documents.join(intervals, "doc_id", "left")
        .select(
            "doc_id",
            F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias("text"),
            F.size(toks_expr).cast("bigint").alias("n_tokens"),
            (F.size(toks_expr) - F.size(kept)).cast("bigint").alias(
                "removed_tokens"
            ),
        )
    )


# version tag for the shingle-hash construction below. Bump whenever
# the scheme changes (token hash fn, fold order, NULL handling, …):
# persisted dedup stores (streaming/corpus_dedup.py) stamp this into
# _params.json so a store built under an old scheme fails LOUDLY
# instead of silently never matching new-batch hashes. History:
#   v1 — flat xxhash64 over n positional token-hash gets (+ seed)
#   v2 — chained left-fold zip_with xxhash64 over shifted slices
#        (r4 rewrite; same hash SET semantics, different hash VALUES)
SHINGLE_HASH_SCHEME = "chained-xxhash64-v2"


def minhash_shingle_hashes(
    documents: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    seed: int = 7,
) -> DataFrame:
    """(doc_id, shh: array<long>) — one 64-bit hash per distinct word
    n-gram.

    Each token string is hashed ONCE; a shingle's hash is then
    ``xxhash64`` of its n token hashes (three O(1) array reads + one
    hash over longs) — no shingle string is ever built, which removed
    the dominant constant in the minhash plan (slice+concat+string-hash
    per shingle, r02 PERF note). Downstream semantics are unchanged:
    signatures, banding, and Jaccard verification all operate on the
    hash SET, whose cardinalities equal the string-shingle set's
    (64-bit collisions aside), so the emitted pairs and Jaccard values
    still match the string-based DuckDB oracle. ``F.get`` (not
    element_at) keeps short documents ANSI-safe: out-of-range reads are
    null, and xxhash64 skips null args, so a doc with < n tokens yields
    one whole-doc shingle exactly like the string form."""
    # token-hash array materialized in its own projection: inlining it
    # into the shingle lambda would re-run the whole token transform per
    # shingle index (O(len²) per doc); referenced 4x below, Catalyst's
    # CollapseProject leaves the expensive transform un-inlined
    # null text is the only zero-shingle case (split of any non-null
    # text yields >= 1 token); filtering on it BEFORE the transforms
    # keeps the pushed-down predicate trivial — a size(shh) filter would
    # be pushed below the projections and re-inline the whole nested
    # expression into the scan
    th_frame = documents.where(F.col(text_col).isNotNull()).select(
        "doc_id",
        F.transform(
            tokens(F.col(text_col)), lambda t: F.xxhash64(t, F.lit(seed))
        ).alias("__th"),
    )
    th = F.col("__th")
    # chained zip_with shingle keys (see duplicate_ngram_stats): a
    # left-fold xxhash64 over shifted slices — O(shingle_n) one-hash
    # interpreted ops per position instead of a per-position
    # multi-get expression walk. Seed-dependence rides on the token
    # hashes (xxhash64(t, seed) above); short docs (< shingle_n
    # tokens) keep exactly one shingle — the shorter shifted slices
    # zip as NULL, which xxhash64 folds deterministically, mirroring
    # the old form's NULL gets.
    _m = F.greatest(F.size(th) - shingle_n + 1, F.lit(1))
    _acc = F.slice(th, 1, _m)
    for _j in range(1, shingle_n):
        _acc = F.zip_with(
            _acc, F.slice(th, 1 + _j, _m), lambda a, b: F.xxhash64(a, b)
        )
    return th_frame.select(
        "doc_id",
        F.array_distinct(_acc).alias("shh"),
    )


def bands_for_threshold(
    jaccard_threshold: float, n_hashes: int = 32, safety: float = 0.9
) -> int:
    """Band count whose LSH S-curve midpoint (1/b)^(1/r) sits safely
    below the requested Jaccard threshold, so recall at the threshold is
    high by construction instead of by hash-family luck: pick the
    largest rows-per-band r (fewest bands → cheapest join) with
    (r/n)^(1/r) ≤ safety·threshold."""
    best_r = 1
    for r in range(1, n_hashes + 1):
        if n_hashes % r:
            continue
        midpoint = (r / n_hashes) ** (1.0 / r)
        if midpoint <= safety * jaccard_threshold:
            best_r = r
    return n_hashes // best_r


def minhash_bands(
    documents: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    seed: int = 7,
    hashed: Optional[DataFrame] = None,
    sig: Optional[DataFrame] = None,
) -> DataFrame:
    """(doc_id, band, bhash) — the LSH band-bucket relation the
    candidate join runs on. Exposed separately so scale runs can audit
    bucket-size distributions (the quantity that bounds verification
    cost) with the exact production hashing.

    ``hashed`` optionally supplies a precomputed
    :func:`minhash_shingle_hashes` frame (doc_id, shh) — shingle
    hashing is the plan's dominant constant, so callers that need both
    the bands and the shingle sets (streaming ingestion dedup) compute
    it once and pass it in; it MUST cover exactly the documents being
    banded. ``sig`` goes one step further: a precomputed signature
    frame (doc_id, __m0..__m{n_hashes-1}) for callers whose "shingles"
    are not document text at all (conversation-grain near-dup hashes
    its already-exploded turn rows directly and never builds the array
    form) — only the banding select runs here."""
    rows = n_hashes // bands
    if sig is None:
        if hashed is None:
            hashed = minhash_shingle_hashes(documents, text_col, shingle_n, seed)
        # signature via explode + n_hashes fused min-aggregates: same values
        # as the array-fold form, but whole-stage codegen instead of an
        # interpreted higher-order function, and map-side partial aggregation
        # collapses each doc to one row before the shuffle.
        # explode_OUTER, deliberately: plain explode makes Spark's
        # InferFiltersFromGenerate rule add a size(shh) > 0 predicate that
        # re-inlines the whole shingle expression into the scan and
        # re-evaluates it per row (measured 10 s vs 0.4 s at sf0.1); shh is
        # never empty here (null text is filtered before the transform), so
        # outer semantics are identical
        exploded = hashed.select("doc_id", F.explode_outer("shh").alias("__h"))
        sig = exploded.groupBy("doc_id").agg(
            *[
                F.min(F.xxhash64(F.col("__h"), F.lit(seed + 1 + i))).alias(f"__m{i}")
                for i in range(n_hashes)
            ]
        )
    # band join carries ONLY (doc_id, band, bhash) — the shingle sets
    # never cross the candidate shuffle; they are re-attached to the far
    # smaller candidate-pair set for exact Jaccard verification
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"__m{b * rows + r}").cast("string")
                                    for r in range(rows)
                                ],
                            )
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select("doc_id", F.col("bh.band").alias("band"), F.col("bh.bhash").alias("bhash"))


def minhash_near_duplicates(
    documents: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    n_hashes: int = 32,
    bands: int = None,
    jaccard_threshold: float = 0.7,
    seed: int = 7,
    hashed: "Optional[DataFrame]" = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH.

    signature → ``bands`` band hashes → self-join on (band, hash) →
    exact Jaccard verification on distinct shingle sets. The candidate
    join is an equi-join on the band bucket (hash-partitioned, no
    quadratic blowup); verification cost is bounded by bucket sizes.
    ``bands=None`` derives the banding from the threshold
    (:func:`bands_for_threshold`) so the S-curve midpoint sits below it.
    ``hashed`` optionally supplies a precomputed (doc_id, shh) frame
    covering exactly these documents (see :func:`minhash_bands`).
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    if bands is None:
        bands = bands_for_threshold(jaccard_threshold, n_hashes)
    if hashed is None:
        hashed = minhash_shingle_hashes(documents, text_col, shingle_n, seed)
    banded = minhash_bands(
        documents, text_col, shingle_n, n_hashes, bands, seed, hashed=hashed
    )

    # Same-key explicit repartitions keep the quadratic in-bucket
    # fan-out core-parallel: AQE would coalesce the tiny band-relation
    # exchange to ~1 partition and serialize the pair generation +
    # shuffle write (see conversation_near_duplicates).
    par = documents.sparkSession.sparkContext.defaultParallelism
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "bhash")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "bhash")
    cand = (
        a.repartition(par, "band", "bhash")
        .join(b.repartition(par, "band", "bhash"), ["band", "bhash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # verification: shingle-hash sets only for candidate docs (semi-join
    # prunes the corpus), joined to the candidate pairs
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_small = hashed.join(cand_ids, "doc_id", "left_semi").withColumn(
        "__n", F.size("shh")
    )
    # |A∪B| = |A| + |B| − |A∩B| exactly (shingle-hash sets are
    # duplicate-free), so the verify pays ONE array_intersect per pair
    # instead of intersect + a full union allocation
    i = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = i / (F.col("__na") + F.col("__nb") - i)
    return (
        cand.join(sh_small.select(F.col("doc_id").alias("doc_a"), F.col("shh").alias("sh_a"), F.col("__n").alias("__na")), "doc_a")
        .join(sh_small.select(F.col("doc_id").alias("doc_b"), F.col("shh").alias("sh_b"), F.col("__n").alias("__nb")), "doc_b")
        .withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_chunk_pairs(
    sh: DataFrame, max_hamming: int = 3, sim_col: str = "sim"
) -> DataFrame:
    """(doc_id, sim, table, h1, h2) — the generalized Hamming-LSH bucket
    relation: the 64-bit SimHash split into ``max_hamming + 2`` chunks,
    bucketed on every PAIR of chunks (C(c,2) tables).

    ≤ ``max_hamming`` bit errors corrupt at most that many chunks, so
    ≥ 2 chunks stay intact and some intact pair collides — recall 1 by
    pigeonhole, the same guarantee as single-chunk banding but with
    ~2×-wide (≈26-bit) buckets: random-pair collision volume drops by
    ~2^13, which keeps the candidate join sub-quadratic past ~10⁶ docs
    (single 16-bit chunks saturate: 5M docs measured 337 s with a
    210-doc max bucket; see BENCH.md)."""
    import itertools as it

    c = max_hamming + 2
    widths = [64 // c + (1 if i < 64 % c else 0) for i in range(c)]
    offsets = [sum(widths[:i]) for i in range(c)]

    def chunk(i):
        # mask AFTER the shift: shiftright sign-extends the top chunk
        return F.shiftright(sim_col, offsets[i]).bitwiseAND(
            F.lit((1 << widths[i]) - 1).cast("long")
        )

    pair_structs = [
        F.struct(
            F.lit(t).alias("table"), chunk(i).alias("h1"), chunk(j).alias("h2")
        )
        for t, (i, j) in enumerate(it.combinations(range(c), 2))
    ]
    return sh.select(
        "doc_id", sim_col, F.explode(F.array(*pair_structs)).alias("tb")
    ).select(
        "doc_id", sim_col,
        F.col("tb.table").alias("table"),
        F.col("tb.h1").alias("h1"),
        F.col("tb.h2").alias("h2"),
    )


def simhash_near_duplicates(
    documents: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs via SimHash: generalized Hamming banding
    (:func:`simhash_chunk_pairs` — chunk-pair buckets, recall 1 for
    pairs within ``max_hamming`` by pigeonhole), bucket-join, exact
    verification with ``bit_count(xor)``. Emits exactly the pairs with
    Hamming distance ≤ ``max_hamming`` — banding affects only the
    candidate volume, never the result set."""
    sh = simhash_frame(documents, text_col=text_col, out_col="sim")
    chunks = simhash_chunk_pairs(sh, max_hamming=max_hamming)
    a = chunks.select(
        F.col("doc_id").alias("doc_a"), F.col("sim").alias("sim_a"),
        "table", "h1", "h2",
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"), F.col("sim").alias("sim_b"),
        "table", "h1", "h2",
    )
    return (
        a.join(b, ["table", "h1", "h2"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"))
        .dropDuplicates(["doc_a", "doc_b"])
        .where(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for given (doc_a, doc_b) candidate pairs.

    The candidate list bounds the work, so the texts (not shingle
    arrays) ride the pair join and one Arrow ``pandas_udf`` computes
    the Jaccard of the distinct word-n-gram sets per pair — identical
    values to the JVM ``shingles``/``array_intersect`` form (same sets),
    without evaluating an interpreted HOF per shingle."""
    import re as _re

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pair_jaccard(ta: pd.Series, tb: pd.Series) -> pd.Series:
        def grams(text):
            toks = _re.sub(r" +", " ", (text or "").strip()).split(" ")
            upper = max(len(toks) - n, 0)
            return {" ".join(toks[i : i + n]) for i in range(upper + 1)}

        out = []
        for x, y in zip(ta, tb):
            ga, gb = grams(x), grams(y)
            union = len(ga | gb)
            out.append(len(ga & gb) / union if union else None)
        return pd.Series(out, dtype="float64")

    a = documents.select(F.col("doc_id").alias("doc_a"), F.col(text_col).alias("__ta"))
    b = documents.select(F.col("doc_id").alias("doc_b"), F.col(text_col).alias("__tb"))
    return (
        candidate_pairs.join(a, "doc_a").join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(pair_jaccard(F.col("__ta"), F.col("__tb")), 6).alias("jaccard"),
        )
    )


_LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "es": [" el ", " la ", " de "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
}


def language_guess(text: Column) -> Column:
    """Tiny stopword-marker language heuristic (operator demo; identical
    arithmetic is expressible in the SQL oracle)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))

    def score(markers):
        s = F.lit(0)
        for mk in markers:
            s = s + (
                F.length(padded) - F.length(F.replace(padded, F.lit(mk), F.lit("")))
            ) / len(mk)
        return s

    scores = {lang: score(mks) for lang, mks in _LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(list(_LANG_MARKERS)):  # earlier languages win ties
        out = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def language_guess_frame(
    documents: DataFrame, text_col: str = "text", out_col: str = "lang_guess"
) -> DataFrame:
    """``language_guess`` with the per-language scores materialized in
    their own projection before the argmax CASE.

    Same value, different codegen: the single-Column form inlines the
    padded ``replace`` chain into every score reference (the argmax
    re-embeds each score ~6×), which blows the generated method past
    janino's comfort — a ~25 s one-time compile observed at sf0.01.
    Splitting score computation (12 string scans/row total) from the
    comparison keeps both stages small. Same trap class as PERF.md
    log 14(a): factor expensive expressions into their own projection
    when downstream re-references them."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))

    def score(markers):
        s = F.lit(0)
        for mk in markers:
            s = s + (
                F.length(padded) - F.length(F.replace(padded, F.lit(mk), F.lit("")))
            ) / len(mk)
        return s

    scored = documents.select(
        "*",
        *[
            score(mks).alias(f"__s_{lang}")
            for lang, mks in _LANG_MARKERS.items()
        ],
    )
    cols = {lang: F.col(f"__s_{lang}") for lang in _LANG_MARKERS}
    best = F.greatest(*cols.values())
    out = F.lit("und")
    for lang in reversed(list(_LANG_MARKERS)):
        out = F.when((cols[lang] > 0) & (cols[lang] == best), F.lit(lang)).otherwise(out)
    return scored.withColumn(out_col, out).drop(
        *[f"__s_{lang}" for lang in _LANG_MARKERS]
    )


def clean_corpus(
    documents: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    min_alpha: float = 0.3,
) -> DataFrame:
    """End-to-end training-corpus cleaning pass: quality gate + exact
    dedup, the first two stages of every pre-training data pipeline.

    1. quality gate — at least ``min_tokens`` whitespace tokens and
       ``alpha_ratio >= min_alpha`` (both pure codegen expressions);
    2. exact dedup — one surviving row per distinct content hash,
       keeping the smallest ``doc_id`` and counting the copies.

    Scale shape: the gate runs BEFORE the dedup shuffle, so only
    surviving rows (hash + metrics, never the text) cross the wire; the
    dedup itself is a single hash-partitioned groupBy with map-side
    partial aggregation.

    Returns ``(doc_id, n_chars, n_tokens, alpha_ratio, n_copies)``.
    """
    t = F.col(text_col)
    gated = documents.select(
        "doc_id",
        F.md5(t).alias("__h"),
        F.length(t).cast("long").alias("n_chars"),
        token_count(t).cast("long").alias("n_tokens"),
        alpha_ratio(t).alias("alpha_ratio"),
    ).where(
        (F.col("n_tokens") >= min_tokens) & (F.col("alpha_ratio") >= min_alpha)
    )
    return (
        gated.groupBy("__h")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("n_chars").alias("n_chars"),
            F.min("n_tokens").alias("n_tokens"),
            F.min("alpha_ratio").alias("alpha_ratio"),
            F.count("*").alias("n_copies"),
        )
        .drop("__h")
    )


def build_vocabulary(
    documents: DataFrame, text_col: str = "text", vocab_size: int = 1000
) -> DataFrame:
    """Top-``vocab_size`` whitespace tokens by corpus frequency —
    the word-level vocabulary a tokenizer fit starts from.

    Scale shape: explode → one token-key shuffle with map-side partial
    counts (Zipf head tokens pre-aggregate per task, so the hot keys do
    NOT skew the shuffle), then ``orderBy().limit(K)`` which Spark
    executes as a distributed TakeOrderedAndProject — per-partition
    top-K heaps merged on the driver, never a single-partition global
    sort over the full vocabulary (the ``rank`` window below IS
    single-partition, but over the ≤ ``vocab_size`` surviving rows
    only). Ties break on the token string so the vocabulary is
    deterministic.

    Returns ``(token, n_occurrences, rank)``.
    """
    counts = (
        documents.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(vocab_size)
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return counts.select(
        "token", "n_occurrences", F.row_number().over(w).alias("rank")
    )


def vocab_coverage(
    documents: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1000,
    vocabulary: Optional[DataFrame] = None,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a corpus vocabulary
    (built by :func:`build_vocabulary` unless one is passed in) — the
    coverage statistic that decides whether a tokenizer/vocab fits a
    new data source.

    The vocabulary is at most ``vocab_size`` rows, so the membership
    join broadcasts; the only shuffle is the per-document aggregation.
    Documents with no tokens (empty or NULL text) report ``oov_frac``
    0.0 and ``n_tokens`` 0.

    Returns ``(doc_id, n_tokens, oov_frac)``.
    """
    if vocabulary is None:
        vocabulary = build_vocabulary(documents, text_col, vocab_size)
    toks = documents.select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("token")
    ).where(F.col("token") != "")
    vocab = F.broadcast(vocabulary.select("token", F.lit(1).alias("__in_vocab")))
    cov = (
        toks.join(vocab, "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(F.when(F.col("__in_vocab").isNull(), 1.0).otherwise(0.0)), 6
            ).alias("oov_frac"),
        )
    )
    return (
        documents.select("doc_id")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("oov_frac", F.lit(0.0)).alias("oov_frac"),
        )
    )


def quality_features(
    documents: DataFrame,
    text_col: str = "text",
    top_ngram: int | None = None,
    dup_ngram: int | None = None,
    bpe: bool = False,
) -> DataFrame:
    """Per-document quality metrics: length, tokens, alpha ratio, mean
    token length, plus Gopher-style repetition signals —
    ``top_token_frac`` (share of the most frequent token) and
    ``dup_token_frac`` (1 − distinct/total) flag the boilerplate and
    keyword-stuffed documents length filters miss — and C4/RefinedWeb
    line-level signals: ``n_lines`` (non-blank lines),
    ``end_punct_line_frac`` (lines ending in terminal punctuation —
    C4 drops lines that don't), ``ellipsis_line_frac`` (lines ending
    in ``...`` — the truncated-nav-text marker), and Gopher's
    within-document line-repetition pair ``dup_line_frac``
    (1 − distinct/total over trimmed lines) and ``dup_line_char_frac``
    (characters in repeat occurrences / total line characters).

    Length/ratio columns are pure codegen expressions; the line
    signals are array higher-order functions over the per-doc line
    split (interpreted, but array-local — no explode, no shuffle),
    with the trimmed/sorted line arrays factored into their own
    projection so Catalyst can't re-inline the split per consumer.
    ``dup_line_char_frac`` is the sorted-adjacent-equal formulation —
    O(L log L) per doc, equivalent to Σ(count−1)·len over distinct
    lines. The top-token mode is explode → two-level groupBy keyed on
    doc_id — one shuffle, partial-aggregated map-side, no Python.

    ``top_ngram=``/``dup_ngram=`` fold the corresponding
    :func:`ngram_repetition_features` columns into this SAME documents
    scan, and ``bpe=True`` folds in :func:`bpe_token_count` as
    ``n_bpe_tokens`` — pipelines wanting all the signals pay one scan
    plus the single top-token shuffle instead of three scans and two
    extra joins."""
    t = F.col(text_col)
    n_tok = token_count(t)
    nel_t = F.transform(
        F.filter(F.split(t, "\n"), lambda x: F.length(F.trim(x)) > 0),
        lambda x: F.trim(x),
    )
    extra_proj, extra_out = [], []
    if top_ngram:
        extra_proj.append(
            _sorted_grams(F.coalesce(t, F.lit("")), top_ngram).alias("__gt")
        )
        extra_out.append(f"top_{top_ngram}gram_char_frac")
    if dup_ngram:
        extra_proj.append(
            _sorted_grams(F.coalesce(t, F.lit("")), dup_ngram).alias("__gd")
        )
        extra_out.append(f"dup_{dup_ngram}gram_char_frac")
    if bpe:
        extra_proj.append(bpe_token_count(t).alias("n_bpe_tokens"))
        extra_out.append("n_bpe_tokens")
    lines = documents.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        alpha_ratio(t).alias("alpha_ratio"),
        F.round(F.length(t) / F.greatest(n_tok, F.lit(1)), 6).alias("chars_per_token"),
        F.size(F.array_distinct(tokens(t))).alias("__n_distinct"),
        nel_t.alias("__nel"),
        F.sort_array(nel_t).alias("__srt"),
        *extra_proj,
    )
    srt = F.col("__srt")
    nel = F.col("__nel")
    n_lines = F.size(nel)
    end_punct = F.size(
        F.filter(nel, lambda x: F.substring(x, -1, 1).isin(".", "!", "?", '"'))
    )
    ellipsis = F.size(F.filter(nel, lambda x: x.endswith("...")))
    # repeat-occurrence chars: in the sorted array, a line equal to its
    # predecessor is a repeat; F.get(srt, -1) is NULL so i=0 never fires
    dup_chars = F.aggregate(
        F.transform(
            srt,
            lambda x, i: F.when(x == F.get(srt, i - 1), F.length(x)).otherwise(
                F.lit(0)
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    tot_line_chars = F.aggregate(
        nel, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    line_denom = F.greatest(n_lines, F.lit(1))
    char_denom = F.greatest(F.col("n_chars"), F.lit(1))
    extra_base = []
    # gram_n column metadata: the gram order is already encoded in the
    # column NAME, but a downstream rename/alias would detach it —
    # consumers with hard threshold semantics (gopher_filter) verify
    # the metadata when present so a re-labeled frame can't silently
    # shift the verdict
    if top_ngram:
        extra_base.append(
            F.round(_run_max_chars(F.col("__gt")) / char_denom, 6).alias(
                f"top_{top_ngram}gram_char_frac", metadata={"gram_n": top_ngram}
            )
        )
    if dup_ngram:
        extra_base.append(
            F.round(_adjacent_dup_chars(F.col("__gd")) / char_denom, 6).alias(
                f"dup_{dup_ngram}gram_char_frac", metadata={"gram_n": dup_ngram}
            )
        )
    if bpe:
        extra_base.append(F.col("n_bpe_tokens"))
    base = lines.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "alpha_ratio",
        "chars_per_token",
        n_lines.cast("long").alias("n_lines"),
        F.when(n_lines == 0, F.lit(0.0))
        .otherwise(F.round(end_punct / line_denom, 6))
        .alias("end_punct_line_frac"),
        F.when(n_lines == 0, F.lit(0.0))
        .otherwise(F.round(ellipsis / line_denom, 6))
        .alias("ellipsis_line_frac"),
        F.when(n_lines == 0, F.lit(0.0))
        .otherwise(F.round(1 - F.size(F.array_distinct(nel)) / line_denom, 6))
        .alias("dup_line_frac"),
        F.when(tot_line_chars == 0, F.lit(0.0))
        .otherwise(F.round(dup_chars / tot_line_chars, 6))
        .alias("dup_line_char_frac"),
        "__n_distinct",
        *extra_base,
    )
    top = (
        documents.select("doc_id", F.explode(tokens(t)).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("__top"))
    )
    zero_tok = F.col("n_tokens") == 0
    denom = F.greatest(F.col("n_tokens"), F.lit(1))
    return base.join(top, "doc_id", "left").select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "alpha_ratio",
        "chars_per_token",
        "n_lines",
        "end_punct_line_frac",
        "ellipsis_line_frac",
        "dup_line_frac",
        "dup_line_char_frac",
        F.when(zero_tok, F.lit(0.0))
        .otherwise(F.round(F.col("__top") / denom, 6))
        .alias("top_token_frac"),
        F.when(zero_tok, F.lit(0.0))
        .otherwise(F.round(1 - F.col("__n_distinct") / denom, 6))
        .alias("dup_token_frac"),
        *extra_out,
    )


def _sorted_grams(t: Column, n: int) -> Column:
    """Sorted word n-gram array of ``t`` (NON-distinct — repetition
    analysis needs the counts that :func:`shingles` throws away)."""
    toks = F.filter(tokens(t), lambda x: x != F.lit(""))
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return (
        F.when(F.size(toks) >= n, F.sort_array(grams))
        .otherwise(F.array().cast("array<string>"))
    )


def _run_max_chars(srt: Column) -> Column:
    """Max over equal-neighbour runs of run_length × element_length in a
    SORTED string array — one O(T) fold, no explode."""
    zero = F.lit(0).cast("long")
    run = lambda acc, x: (  # noqa: E731 — occurrences of x so far in its run
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
    )
    return F.aggregate(
        srt,
        F.struct(F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run(acc, x).alias("run"),
            F.greatest(acc["best"], run(acc, x) * F.length(x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def _adjacent_dup_chars(srt: Column) -> Column:
    """Characters in repeat occurrences (element equal to its
    predecessor) of a SORTED string array. ``srt`` must be a plain
    column reference — ``F.get`` re-evaluates its operand per element,
    so pass a materialized projection column, not an expression."""
    return F.aggregate(
        F.transform(
            srt,
            lambda x, i: F.when(x == F.get(srt, i - 1), F.length(x)).otherwise(
                F.lit(0)
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def ngram_repetition_features(
    documents: DataFrame,
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Gopher's within-document n-gram repetition filters (the companion
    to :func:`quality_features`' line-level pair):

    * ``top_{top_n}gram_char_frac`` — characters covered by the single
      most-repeated ``top_n``-gram (occurrences × gram length) over the
      document's character count; catches "buy now buy now buy now"
      keyword stuffing.
    * ``dup_{dup_n}gram_char_frac`` — characters in repeat occurrences
      (after the first) of all duplicated ``dup_n``-grams over the
      document's character count; catches looped paragraphs.

    Both are array-local sorted-adjacent formulations — sort the gram
    array once, then one O(T) fold: equal-neighbour runs give per-gram
    occurrence counts without any explode or shuffle, so the operator is
    a pure per-row projection that scales with the corpus scan.
    (:func:`quality_features` can fold these columns into its own scan
    via ``top_ngram=``/``dup_ngram=`` — use that in pipelines that also
    want the base metrics.)"""
    t = F.coalesce(F.col(text_col), F.lit(""))
    base = documents.select(
        "doc_id",
        F.length(t).cast("long").alias("__nc"),
        _sorted_grams(t, top_n).alias("__gt"),
        _sorted_grams(t, dup_n).alias("__gd"),
    )
    denom = F.greatest(F.col("__nc"), F.lit(1))
    return base.select(
        "doc_id",
        F.round(_run_max_chars(F.col("__gt")) / denom, 6).alias(
            f"top_{top_n}gram_char_frac"
        ),
        F.round(_adjacent_dup_chars(F.col("__gd")) / denom, 6).alias(
            f"dup_{dup_n}gram_char_frac"
        ),
    )


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    shingle_n: int = 13,
    seed: int = 7,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    ``shingle_n``-token shingle with an evaluation set (the standard
    13-gram overlap rule used to scrub eval leakage from pre-training
    corpora).

    Both sides reuse the string-free shingle hashing of
    :func:`minhash_shingle_hashes`. With ``broadcast_benchmark=True``
    (default — right for fixed-size eval suites) the membership probe
    is a broadcast semi-join against the exploded corpus shingles: the
    corpus is scanned once, nothing shuffles on the full shingle
    stream, and the only shuffle is the per-doc hit aggregation. The
    broadcast is FORCED, so for a benchmark side too big for executor
    memory (say, checking one huge corpus against another) pass
    ``False`` to fall back to a hash-partitioned semi-join on the
    shingle key — one extra shuffle, no size ceiling. Documents shorter
    than ``shingle_n`` tokens hash as a single whole-doc shingle (only
    an exact short-text match flags).

    Returns ``(doc_id, n_hits, contaminated)`` — ``n_hits`` counts the
    distinct overlapping shingles per document.
    """
    # explode_outer, NOT explode: InferFiltersFromGenerate would bolt a
    # size(shh) > 0 predicate onto a plain explode and re-evaluate the
    # whole shingle expression per row — the exact trap PERF.md log
    # 14(b) documents for the minhash signature (measured here too:
    # 32 s → 1.3 s at sf0.1)
    bench_sh = (
        minhash_shingle_hashes(benchmark, text_col, shingle_n, seed)
        .select(F.explode_outer("shh").alias("sh"))
        .where(F.col("sh").isNotNull())
        .distinct()
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    corp_sh = (
        minhash_shingle_hashes(corpus, text_col, shingle_n, seed)
        .select("doc_id", F.explode_outer("shh").alias("sh"))
        .where(F.col("sh").isNotNull())
    )
    hits = (
        corp_sh.join(bench_sh, "sh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


# -- PII redaction ----------------------------------------------------------

# Deliberately lookahead/backreference-free so Java regex (Spark
# executors) and RE2 (the DuckDB oracle) match byte-for-byte the same
# spans. \b and \d are ASCII in both dialects for these patterns.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}
# Application order matters and is part of the contract: emails first
# (an address like 10.0.0.1@host.com must redact as ONE email, not an
# IP inside an email), then IPs, then phones (dash-separated — disjoint
# from the dotted IP spans by construction).
_PII_ORDER = ("email", "ip", "phone")


def redact_pii(text: Column) -> Column:
    """Mask emails / IPv4s / phone numbers with ``<EMAIL>`` / ``<IP>`` /
    ``<PHONE>`` placeholder tags — the standard pre-training scrub pass.

    A chain of three codegen ``regexp_replace`` expressions (no Python,
    no UDF): the corpus is scanned once per pattern inside one
    whole-stage-codegen projection, so this composes with the quality /
    dedup passes at zero extra shuffles.
    """
    out = text
    for kind in _PII_ORDER:
        out = F.regexp_replace(
            out, PII_PATTERNS[kind], f"<{kind.upper()}>"
        )
    return out


def pii_counts(text: Column) -> list[Column]:
    """Per-kind match counts (pre-redaction), one codegen
    ``regexp_count`` per pattern: ``[n_emails, n_ips, n_phones]``.
    Count emails on the raw text but IPs/phones on the email-redacted
    text so the three counts partition the redacted spans exactly the
    way :func:`redact_pii` consumes them."""
    after_email = F.regexp_replace(
        text, PII_PATTERNS["email"], "<EMAIL>"
    )
    return [
        F.regexp_count(text, F.lit(PII_PATTERNS["email"])).alias("n_emails"),
        F.regexp_count(after_email, F.lit(PII_PATTERNS["ip"])).alias("n_ips"),
        F.regexp_count(after_email, F.lit(PII_PATTERNS["phone"])).alias(
            "n_phones"
        ),
    ]


def redact_pii_frame(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """``(doc_id, redacted, n_emails, n_ips, n_phones)`` — NULL text is
    treated as the empty document (the corpus-wide NULL rule)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    return documents.select(
        "doc_id",
        redact_pii(t).alias("redacted"),
        *pii_counts(t),
    )


def compression_features(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """zlib compression-ratio quality signal (the Dolma / RedPajama-v2
    repetitiveness filter): machine-generated boilerplate, keyword
    stuffing, and template spam compress far better than natural prose,
    so a LOW ``compression_ratio`` (compressed/raw) flags junk that
    token-frequency heuristics miss, and a ratio ≈ 1 flags
    high-entropy noise (base64 blobs, minified code).

    Output: ``(id_col, raw_bytes, zlib_bytes, compression_ratio)`` —
    UTF-8 byte counts; ratio rounded to 6 decimals, NULL for NULL
    text, and NULL for empty text (zlib's 8-byte header would make
    0-byte docs look maximally incompressible).

    One Arrow ``pandas_udf`` — compression itself runs in C (zlib) per
    document; a fixed ``level`` keeps the bytes deterministic, and
    ``raw_bytes`` stays JVM-side (``octet_length``). Pure projection:
    no shuffle, no join — scales as a map over the corpus. No SQL
    engine exposes zlib, so the registry entry is rows-only with the
    exact python-zlib parity pinned in pytest.
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    if not 1 <= level <= 9:
        raise ValueError("zlib level must be in [1, 9]")

    @pandas_udf("long")
    def zlen(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if t is None
                else len(zlib.compress(t.encode("utf-8"), level))
                for t in texts
            ],
            dtype="object",
        )

    t = F.col(text_col)
    # compress ONCE: the ratio derives from the materialized column in a
    # second projection (two zlen(t) call sites would run the UDF twice)
    sized = documents.select(
        id_col,
        F.octet_length(t).cast("long").alias("raw_bytes"),
        zlen(t).alias("zlib_bytes"),
    )
    return sized.select(
        id_col,
        "raw_bytes",
        "zlib_bytes",
        F.when(
            F.col("raw_bytes") > 0,
            F.round(F.col("zlib_bytes") / F.col("raw_bytes"), 6),
        ).alias("compression_ratio"),
    )


def gopher_filter(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_chars_per_token: float = 3.0,
    max_chars_per_token: float = 10.0,
    min_alpha_ratio: float = 0.6,
    max_ellipsis_line_frac: float = 0.3,
    max_dup_line_frac: float = 0.3,
    max_dup_line_char_frac: float = 0.2,
    max_top_2gram_char_frac: float = 0.2,
    max_dup_5gram_char_frac: float = 0.15,
    signals: DataFrame | None = None,
) -> DataFrame:
    """Gopher-rule document filter VERDICT (Rae et al. 2021, App. A):
    the engine emits quality *signals* (:func:`quality_features`); real
    pipelines apply a RULE SET over them and keep/drop. This operator
    closes that gap: one scan computes the signals and projects a
    per-document verdict.

    Output: ``(id_col, passes, reject_reasons)`` — ``passes`` is 1 iff
    no rule fires; ``reject_reasons`` is a comma-joined list of fired
    rule names in the fixed order below ('' when passing), so the
    verdict is auditable and groupable (``groupBy(reject_reasons)`` is
    the rejection histogram).

    Rules (names as emitted): ``too_few_tokens`` / ``too_many_tokens``
    (Gopher: 50..100k words), ``word_length`` (mean 3..10 chars),
    ``low_alpha`` (our char-level ``alpha_ratio`` < 0.6 stands in for
    Gopher's ">=80% of words contain an alphabetic character" — char
    grain, documented approximation), ``ellipsis_lines`` (>30% of
    lines end in ...), ``dup_lines`` / ``dup_line_chars`` (Gopher A1:
    0.30 / 0.20), ``top_2gram`` / ``dup_5gram`` (A1: 0.20 / 0.15).
    NULL/empty text fails ``too_few_tokens``. A threshold set to None
    disables its rule.

    Pure projection over the signals scan plus quality_features' one
    top-token shuffle — no extra exchange, no Python; fully
    SQL-expressible (DuckDB parity pytest-pinned).

    ``signals=`` (r3-verdict demand #4): pass a precomputed
    :func:`quality_features` frame (computed with ``top_ngram=2,
    dup_ngram=5``) and the verdict becomes a pure projection over it —
    composed pipelines (``assemble_corpus``-style quality gate next to
    a signals output) pay the signals scan ONCE instead of twice.
    Default ``None`` computes the signals internally (unchanged
    behavior).
    """
    if signals is None:
        sig = quality_features(
            documents.select(id_col, text_col),
            text_col=text_col,
            top_ngram=2,
            dup_ngram=5,
        )
    else:
        needed = {
            id_col, "n_tokens", "chars_per_token", "alpha_ratio",
            "ellipsis_line_frac", "dup_line_frac", "dup_line_char_frac",
            "top_2gram_char_frac", "dup_5gram_char_frac",
        }
        missing = needed - set(signals.columns)
        if missing:
            raise ValueError(
                "signals frame is missing quality_features columns: "
                f"{sorted(missing)}"
            )
        # gram-order integrity: quality_features stamps gram_n metadata
        # on the two ngram columns; if a caller re-labeled columns from
        # a differently-parameterized frame, the metadata survives the
        # rename and the mismatch is caught here instead of silently
        # shifting the Gopher verdict. Frames without the metadata
        # (pre-stamp or hand-built) pass — the column-name contract
        # already encodes the order for those.
        for col_name, want_n in (
            ("top_2gram_char_frac", 2), ("dup_5gram_char_frac", 5),
        ):
            meta = signals.schema[col_name].metadata or {}
            got_n = meta.get("gram_n")
            if got_n is not None and int(got_n) != want_n:
                raise ValueError(
                    f"signals column {col_name} was computed with "
                    f"gram order n={got_n} (column metadata), but the "
                    f"Gopher thresholds are defined for n={want_n} — "
                    f"recompute quality_features with top_ngram=2, "
                    f"dup_ngram=5"
                )
        sig = signals
    n_tok = F.coalesce(F.col("n_tokens"), F.lit(0))
    rules = [
        ("too_few_tokens",
         None if min_tokens is None else n_tok < min_tokens),
        ("too_many_tokens",
         None if max_tokens is None else n_tok > max_tokens),
        ("word_length",
         None if min_chars_per_token is None else ~F.col(
             "chars_per_token").between(min_chars_per_token,
                                        max_chars_per_token)),
        ("low_alpha",
         None if min_alpha_ratio is None
         else F.col("alpha_ratio") < min_alpha_ratio),
        ("ellipsis_lines",
         None if max_ellipsis_line_frac is None
         else F.col("ellipsis_line_frac") > max_ellipsis_line_frac),
        ("dup_lines",
         None if max_dup_line_frac is None
         else F.col("dup_line_frac") > max_dup_line_frac),
        ("dup_line_chars",
         None if max_dup_line_char_frac is None
         else F.col("dup_line_char_frac") > max_dup_line_char_frac),
        ("top_2gram",
         None if max_top_2gram_char_frac is None
         else F.col("top_2gram_char_frac") > max_top_2gram_char_frac),
        ("dup_5gram",
         None if max_dup_5gram_char_frac is None
         else F.col("dup_5gram_char_frac") > max_dup_5gram_char_frac),
    ]
    # NULL signals (NULL text) must not slip past a rule: only the
    # token rule fires on them (coalesced to 0), the rest no-op on NULL
    reasons = F.concat_ws(
        ",",
        *[
            F.when(cond, F.lit(name))
            for name, cond in rules
            if cond is not None
        ],
    )
    return sig.select(
        id_col,
        (reasons == "").cast("int").alias("passes"),
        reasons.alias("reject_reasons"),
    )


def top_ngrams(
    documents: DataFrame,
    n: int = 3,
    k: int = 50,
    text_col: str = "text",
    min_docs: int = 2,
    min_occurrences: int = 1,
) -> DataFrame:
    """Corpus-level heavy-hitter n-grams — the "what boilerplate should
    I scrub?" forensic that picks ``dedup_lines``' threshold and
    explains a fat ``dup_token_frac`` before any dedup runs: the ``k``
    most frequent word n-grams appearing in ≥ ``min_docs`` distinct
    documents, with occurrence and document counts.

    ONE lazy scan (the r6 rewrite): an Arrow batch kernel splits each
    document on ``\\s+`` (the ASCII class, matching the JVM regex and
    the pytest python oracle's ``str.split()``), counts exact STRING
    grams per batch with a hash map, and emits the per-batch partial
    ``(gram, occurrences, distinct_docs)`` rows — every document lives
    in exactly one batch, so per-batch distinct-doc counts sum exactly.
    One map-side-combined aggregate + ``min_docs``/``min_occurrences``
    filter + top-k (TakeOrderedAndProject — per-partition heaps, no
    global sort) finish the job.

    Versus the previous two-scan hashed design: no 64-bit gram-key
    collisions (counts are exact by construction), no second corpus
    scan for display strings, no eager pass-1 at call time (the
    returned frame is fully lazy again), and the per-position cost is
    a C-speed hash-map update instead of a ~5 µs interpreted
    ``zip_with`` lambda walk (measured 27 s → 2.5 s for the registry
    entry at 10× the bench scale). The shuffle carries the per-batch
    DISTINCT gram strings (boilerplate-heavy corpora collapse
    map-side); document text itself still never rides a shuffle.

    Ties at the ``k`` boundary cut deterministically by the gram string
    ascending — the same ordering the emitted ``rank`` uses, so the
    visible ordering and the cut agree.

    Returns ``k`` rows: ``(rank, gram, n_occurrences, n_docs)``.
    """
    if n < 1 or k < 1 or min_docs < 1 or min_occurrences < 1:
        raise ValueError(
            "n, k, min_docs and min_occurrences must all be >= 1"
        )

    def _count_grams(batches):
        import re as _re
        from collections import Counter

        # Java regex \\s is the ASCII class [ \\t\\n\\x0B\\f\\r] (no
        # UNICODE_CHARACTER_CLASS), and python's \\s is unicode-aware —
        # spell the class out so both engines split identically
        ws = _re.compile("[ \\t\\n\\x0b\\f\\r]+")
        for pdf in batches:
            occ: Counter = Counter()
            dct: Counter = Counter()
            for text in pdf[text_col]:
                toks = [
                    t
                    for t in ws.split(text if isinstance(text, str) else "")
                    if t
                ]
                if len(toks) < n:
                    continue
                grams = [
                    " ".join(toks[i : i + n])
                    for i in range(len(toks) - n + 1)
                ]
                occ.update(grams)
                dct.update(set(grams))
            if occ:
                keys = list(occ.keys())
                yield pd.DataFrame(
                    {
                        "gram": keys,
                        "occ": [occ[g] for g in keys],
                        "docs": [dct[g] for g in keys],
                    }
                )

    partials = documents.select(text_col).mapInPandas(
        _count_grams, "gram string, occ long, docs long"
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
    return (
        partials.groupBy("gram")
        .agg(
            F.sum("occ").cast("long").alias("n_occurrences"),
            F.sum("docs").cast("long").alias("n_docs"),
        )
        .where(
            (F.col("n_docs") >= min_docs)
            & (F.col("n_occurrences") >= min_occurrences)
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
        .limit(k)
        .select(
            F.row_number().over(w).cast("int").alias("rank"),
            "gram",
            "n_occurrences",
            "n_docs",
        )
    )

def encoding_quality(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bad_ratio: float = 0.01,
) -> DataFrame:
    """Per-document text-encoding health signals + verdict.

    Broken decode chains are a top corpus defect class (ftfy's problem
    statement): UTF-8 bytes read as Latin-1 leave Ã/Â/â-led
    artifact sequences, lossy decodes leave U+FFFD replacement chars,
    and binary spills leave C0 control characters. Pure-codegen
    ``regexp_count`` signals per document (no Python, no shuffle):

    * ``n_replacement`` -- U+FFFD count;
    * ``n_control``     -- C0 controls except tab/newline/CR;
    * ``n_mojibake``    -- UTF-8-as-Latin-1 artifact sequences:
      ``Ã`` followed by any Latin-1 continuation glyph
      (U+0080-U+00BF), the ``â€``-family punctuation wrecks,
      and ``Â`` + non-breaking-space-range glyphs;
    * ``bad_ratio``     -- (replacement + control + mojibake) / chars;
    * ``encoding_ok``   -- bad_ratio <= ``max_bad_ratio`` (empty docs
      pass: nothing decoded means nothing mis-decoded).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_repl = F.regexp_count(t, F.lit("�"))
    n_ctrl = F.regexp_count(
        t, F.lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]")
    )
    n_moji = F.regexp_count(
        t,
        F.lit(
            "(Ã[\\x80-\\xBF])|(â€.)|(Â[\\xA0-\\xBF])"
        ),
    )
    n_chars = F.length(t)
    bad = (n_repl + n_ctrl + n_moji).cast("double")
    ratio = F.when(n_chars > 0, F.round(bad / n_chars, 6)).otherwise(F.lit(0.0))
    return documents.select(
        F.col(id_col),
        n_repl.cast("int").alias("n_replacement"),
        n_ctrl.cast("int").alias("n_control"),
        n_moji.cast("int").alias("n_mojibake"),
        ratio.alias("bad_ratio"),
        (ratio <= F.lit(float(max_bad_ratio))).alias("encoding_ok"),
    )
