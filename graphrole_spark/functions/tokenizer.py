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
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_fit", "bpe_encode", "END_WORD"]

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
