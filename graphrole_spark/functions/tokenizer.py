"""BPE tokenizer training and encoding over a document corpus.

The engine's ``text.bpe_token_count`` counts pre-tokenizer segments; a
training pipeline also needs the real thing — byte-pair-encoding
merges LEARNED from the corpus (Sennrich et al. 2016) and a
distributed encode pass that applies them. The Spark-first shape
mirrors the engine's vertical-log-binning pattern (distributed
histogram → exact driver loop over the bounded summary → broadcast
apply), because BPE training state IS a histogram:

* **fit** — ONE corpus-scale pass builds the word-frequency table
  (explode + groupBy; text bytes die at the scan), truncated to the
  ``max_vocab_words`` most frequent words (a distributed
  TakeOrderedAndProject — the standard tokenizer-trainer cap: HF
  ``tokenizers`` defaults to a bounded word table the same way). The
  merge loop then runs driver-side over that ≤100k-row summary with a
  pair→word inverted index, touching only words that contain the
  merged pair — data-size-independent, exactly like the binning/MDL
  driver loops. Tie-break: highest pair count, then lexicographically
  smallest pair — deterministic across runs and partitionings.
* **encode** — merges broadcast as a rank table; one Arrow
  ``mapInPandas`` pass applies them greedily (lowest rank first, the
  canonical BPE apply) with a per-batch word→tokens memo (Zipf makes
  the memo hit rate ~99%), partition-preserving, no shuffle.

Word boundary: ASCII-whitespace pre-tokenization — the SAME explicit
character class ``[ \\t\\n\\r\\f\\x0b]+`` on both sides (Java regex in
the fit's JVM split, ``re`` in the encode's Arrow pass), because the
space-only ``tokens`` rule and Python's ``str.split()`` disagree on
newlines/tabs and a fit/encode mismatch would learn merges the encoder
never fires — plus the classic ``</w>`` end-of-word marker, so merges
never cross words and encode(word) is a pure function.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "bpe_fit",
    "bpe_encode",
    "build_token_vocab",
    "encode_ids",
    "encode_to_ids",
    "pack_token_ids",
    "tokenize_pack",
    "END_WORD",
]

END_WORD = "</w>"
# one segmentation rule for fit (Java regex) and encode (python re)
_WS = r"[ \t\n\r\f\x0b]+"
_WS_RE = re.compile(_WS)  # \t \n \r \f \x0b mean the same chars in re and Java regex


def _word_counts(
    documents: DataFrame, text_col: str, min_freq: int, max_vocab_words: int
) -> list[tuple[str, int]]:
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.filter(F.split(t, _WS), lambda x: x != F.lit(""))
    wc = (
        documents.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .count()
        .where(F.col("count") >= min_freq)
        .orderBy(F.desc("count"), F.asc("word"))
        .limit(max_vocab_words)
        .collect()
    )
    return [(r.word, r["count"]) for r in wc]


def _merge_loop(
    words: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Exact driver merge loop over the bounded word table. Keeps a
    pair→word-index inverted index so each merge re-segments only the
    words that contain the winning pair."""
    symbols = [list(w) + [END_WORD] for w, _ in words]
    freqs = [c for _, c in words]
    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(symbols):
        f = freqs[i]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += f
            pair_words[(a, b)].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            if best is None or c > best[1] or (c == best[1] and p < best[0]):
                best = (p, c)
        if best is None or best[1] < 2:
            break  # a merge that fires once carries no compression
        pair = best[0]
        merges.append(pair)
        joined = pair[0] + pair[1]
        # Rebuild every touched word's pair membership wholesale (retire
        # all old pairs, admit all new) — per-occurrence delta bookkeeping
        # goes subtly wrong when a retired pair still occurs elsewhere in
        # the same word (the index would drop the word and later merges
        # would skip it).
        for i in sorted(pair_words[pair]):
            syms = symbols[i]
            f = freqs[i]
            out: list[str] = []
            j = 0
            while j < len(syms):
                if (
                    j + 1 < len(syms)
                    and syms[j] == pair[0]
                    and syms[j + 1] == pair[1]
                ):
                    out.append(joined)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= f
                pair_words[p].discard(i)
            for p in zip(out, out[1:]):
                pair_counts[p] += f
                pair_words[p].add(i)
            symbols[i] = out
        pair_counts[pair] = 0
        pair_words.pop(pair, None)
    return merges


def bpe_fit(
    documents: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    min_freq: int = 2,
    max_vocab_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge list (rank = position). Stops early when no pair
    occurs twice-or-more (a merge that fires once per corpus carries no
    compression). The corpus-size-dependent work is exactly one
    explode + groupBy; everything after runs on the ≤``max_vocab_words``
    summary."""
    words = _word_counts(documents, text_col, min_freq, max_vocab_words)
    return _merge_loop(words, n_merges)


def _apply_merges(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [END_WORD]
    while len(syms) > 1:
        best_rank = None
        best_j = -1
        for j, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        syms[best_j : best_j + 2] = [syms[best_j] + syms[best_j + 1]]
    return syms


def bpe_encode(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with a learned merge list: one
    partition-preserving Arrow pass, per-batch word→tokens memo.
    Returns ``(id_col, n_bpe_tokens, bpe_tokens array<string>)``;
    NULL/empty text encodes to zero tokens."""
    spark = documents.sparkSession
    id_type = documents.schema[id_col].dataType.simpleString()
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    b_ranks = spark.sparkContext.broadcast(ranks)
    schema = f"{id_col} {id_type}, n_bpe_tokens long, bpe_tokens array<string>"

    def encode(batches):
        rk = b_ranks.value
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            out_toks = []
            for text in pdf[text_col]:
                words = [w for w in _WS_RE.split(text or "") if w]
                doc = []
                for w in words:
                    hit = memo.get(w)
                    if hit is None:
                        hit = memo[w] = _apply_merges(w, rk)
                    doc.extend(hit)
                out_toks.append(doc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bpe_tokens": [len(t) for t in out_toks],
                    "bpe_tokens": out_toks,
                }
            )

    return documents.select(id_col, text_col).mapInPandas(encode, schema=schema)


def build_token_vocab(encoded: DataFrame, token_col: str = "bpe_tokens") -> DataFrame:
    """Token → contiguous id table from an encoded corpus: distinct
    exploded tokens (map-side-combinable — only vocab-sized partials
    reach the exchange), ids assigned by ascending token order so the
    mapping is deterministic across runs and partitionings. The final
    ranking window runs on ONE partition but over vocab-sized rows
    (base alphabet + ≤ one symbol per merge), not corpus-sized rows —
    the same bounded-summary shape as the binning driver loop.
    Returns ``(token string, token_id int)``."""
    toks = encoded.select(F.explode(token_col).alias("token")).distinct()
    w = Window.orderBy("token")
    return toks.select(
        "token", (F.row_number().over(w) - 1).cast("int").alias("token_id")
    )


def encode_ids(
    encoded: DataFrame,
    vocab: dict[str, int],
    id_col: str = "doc_id",
    token_col: str = "bpe_tokens",
) -> DataFrame:
    """Map token-string arrays to ``input_ids`` int arrays with a
    broadcast vocab dict: one partition-preserving Arrow pass, no
    shuffle. Tokens absent from the vocab map to -1 (callers building
    the vocab from the same corpus never see one). Returns
    ``(id_col, n_tokens long, input_ids array<int>)``."""
    import numpy as np

    spark = encoded.sparkSession
    id_type = encoded.schema[id_col].dataType.simpleString()
    b_vocab = spark.sparkContext.broadcast(vocab)
    schema = f"{id_col} {id_type}, n_tokens long, input_ids array<int>"

    def to_ids(batches):
        v = b_vocab.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = [
                np.fromiter(
                    (v.get(t, -1) for t in toks), dtype=np.int32, count=len(toks)
                )
                for toks in pdf[token_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": [len(a) for a in ids],
                    "input_ids": ids,
                }
            )

    return encoded.select(id_col, token_col).mapInPandas(to_ids, schema=schema)


def encode_to_ids(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fused BPE-encode + id-map: raw text straight to ``input_ids`` in
    ONE Arrow pass, memoizing word → id *array* (not token strings).
    Composing :func:`bpe_encode` with :func:`encode_ids` ships every
    token as a small string through Arrow twice and materializes it as
    a Python object in between — at 74M tokens that dominated the whole
    pack pipeline (measured 6× the cost of this fused pass). Here
    per-token strings exist only inside the per-word memo; the batch
    output is built by concatenating int32 arrays. Unknown-to-vocab
    tokens map to -1 (impossible when the vocab came from the same
    merge list + corpus). Returns ``(id_col, n_tokens long,
    input_ids array<int>)``."""
    import numpy as np

    spark = documents.sparkSession
    id_type = documents.schema[id_col].dataType.simpleString()
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    b_model = spark.sparkContext.broadcast((ranks, vocab))
    schema = f"{id_col} {id_type}, n_tokens long, input_ids array<int>"

    def run(batches):
        rk, vc = b_model.value
        memo: dict[str, "np.ndarray"] = {}
        empty = np.empty(0, dtype=np.int32)
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for text in pdf[text_col]:
                words = [w for w in _WS_RE.split(text or "") if w]
                if not words:
                    out.append(empty)
                    continue
                arrs = []
                for w in words:
                    hit = memo.get(w)
                    if hit is None:
                        toks = _apply_merges(w, rk)
                        hit = memo[w] = np.fromiter(
                            (vc.get(t, -1) for t in toks),
                            dtype=np.int32,
                            count=len(toks),
                        )
                    arrs.append(hit)
                out.append(np.concatenate(arrs))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": [len(a) for a in out],
                    "input_ids": out,
                }
            )

    return documents.select(id_col, text_col).mapInPandas(run, schema=schema)


def pack_token_ids(
    tokens: DataFrame,
    max_len: int,
    id_col: str = "doc_id",
    ids_col: str = "input_ids",
    shards: int = 64,
    pad_id: int | None = None,
    drop_last: bool = False,
) -> DataFrame:
    """Concat-and-chunk token arrays into fixed-length training
    sequences (the GPT-style pre-training materialization): documents
    are md5-sharded and ``id_col``-ordered (the same deterministic
    layout as :func:`~graphrole_spark.functions.corpus.pack_documents`),
    their token streams concatenated per shard and cut every
    ``max_len`` tokens, documents straddling a cut split across the two
    sequences.

    Scale shape: each document contributes at most
    ``ceil(n/max_len)+1`` *array slices* — the shuffle moves
    document-grain rows carrying bounded arrays, never one row per
    token; assembly is a single ``collect_list`` + ``array_sort`` +
    ``flatten`` of ≤ ``max_len`` tokens per group, all JVM-side (the
    only Python in the pipeline is the Arrow encode pass upstream).
    Two exchanges total: the shard window and the (shard, seq) group.

    Returns ``(shard, seq_id, input_ids array<int>, n_tokens, n_docs,
    doc_spans array<struct<doc_id, start, len>>)`` — ``doc_spans``
    gives each document's slice inside the sequence so trainers can
    build block-diagonal attention masks. Only the tail sequence of a
    shard can be short; ``pad_id`` right-pads it to ``max_len`` (and is
    excluded from ``n_tokens``), ``drop_last=True`` drops it instead.
    """
    from graphrole_spark.functions.corpus import _md5_bucket

    if max_len <= 0:
        raise ValueError("max_len must be positive")
    L = F.lit(max_len)
    n = F.size(ids_col)
    sharded = tokens.select(
        F.col(id_col).alias("doc_id"),
        _md5_bucket(F.col(id_col).cast("string"), shards).alias("shard"),
        F.col(ids_col).alias("__ids"),
        n.cast("long").alias("__n"),
    ).where(F.col("__n") > 0)
    w = Window.partitionBy("shard").orderBy("doc_id")
    off = (F.sum("__n").over(w) - F.col("__n")).alias("__off")
    placed = sharded.select("doc_id", "shard", "__ids", "__n", off)
    # sequences this document touches: floor(off/L) .. floor((off+n-1)/L)
    s0 = F.floor(F.col("__off") / L)
    s1 = F.floor((F.col("__off") + F.col("__n") - 1) / L)
    seq = F.explode(F.sequence(s0, s1)).alias("seq_id")
    sliced = placed.select("doc_id", "shard", "__ids", "__n", "__off", seq)
    seq_start = F.col("seq_id") * L  # global offset where this sequence begins
    cut_lo = F.greatest(seq_start, F.col("__off"))
    cut_hi = F.least(seq_start + L, F.col("__off") + F.col("__n"))
    slice_len = (cut_hi - cut_lo).cast("int")
    slice_from = (cut_lo - F.col("__off")).cast("int")  # 0-based within doc
    pos = (cut_lo - seq_start).cast("int")  # 0-based within sequence
    pieces = sliced.select(
        "shard",
        "seq_id",
        F.struct(
            pos.alias("pos"),
            F.col("doc_id").alias("doc_id"),
            F.slice("__ids", slice_from + 1, slice_len).alias("ids"),
        ).alias("piece"),
    )
    # positions within a sequence are distinct, so the struct sort (by
    # leading field `pos`) is a total order
    assembled = (
        pieces.groupBy("shard", "seq_id")
        .agg(F.array_sort(F.collect_list("piece")).alias("__pieces"))
        .select(
            "shard",
            "seq_id",
            F.flatten(F.transform("__pieces", lambda p: p["ids"])).alias(
                "input_ids"
            ),
            F.transform(
                "__pieces",
                lambda p: F.struct(
                    p["doc_id"].alias("doc_id"),
                    p["pos"].alias("start"),
                    F.size(p["ids"]).alias("len"),
                ),
            ).alias("doc_spans"),
        )
        .select(
            "shard",
            "seq_id",
            "input_ids",
            F.size("input_ids").cast("long").alias("n_tokens"),
            F.size("doc_spans").cast("long").alias("n_docs"),
            "doc_spans",
        )
    )
    if drop_last:
        assembled = assembled.where(F.col("n_tokens") == max_len)
    elif pad_id is not None:
        short = F.col("n_tokens") < max_len
        padded = F.concat(
            "input_ids",
            F.array_repeat(F.lit(pad_id).cast("int"), (L - F.col("n_tokens")).cast("int")),
        )
        assembled = assembled.withColumn(
            "input_ids", F.when(short, padded).otherwise(F.col("input_ids"))
        )
    return assembled


def tokenize_pack(
    documents: DataFrame,
    max_len: int,
    merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 200,
    shards: int = 64,
    pad_id: int | None = None,
    drop_last: bool = False,
) -> DataFrame:
    """End-to-end pre-training materialization: learn (or take) a BPE
    merge list, encode every document, build the deterministic token→id
    vocab, and concat-and-chunk the id streams into ``max_len``-token
    training sequences with per-document span metadata. One corpus pass
    to fit (skipped when ``merges`` is given), one Arrow encode pass,
    one vocab aggregate, two exchanges to pack."""
    if merges is None:
        merges = bpe_fit(documents, n_merges=n_merges, text_col=text_col)
    encoded = bpe_encode(documents, merges, text_col=text_col, id_col=id_col)
    vocab = {
        r["token"]: r["token_id"] for r in build_token_vocab(encoded).collect()
    }
    # fused text->ids pass: the two-step encode -> id-map round-trips
    # every token string through Arrow and Python objects; see
    # encode_to_ids for the measured cost
    with_ids = encode_to_ids(
        documents, merges, vocab, text_col=text_col, id_col=id_col
    )
    return pack_token_ids(
        with_ids,
        max_len,
        id_col=id_col,
        shards=shards,
        pad_id=pad_id,
        drop_last=drop_last,
    )
