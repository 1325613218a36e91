"""BPE tokenizer (functions/tokenizer.py): merge-list parity against a
naive full-recount reference trainer on randomized corpora, handcrafted
merge/encode goldens, greedy rank-order apply semantics, determinism
across partitionings, and encode edge rules."""

import random
from collections import Counter

import pytest


END = "</w>"


def _naive_fit(word_counts, n_merges):
    """Independent reference trainer: FULL pair recount every merge
    (no inverted index, no incremental bookkeeping), same tie-break
    (max count, then lexicographically smallest pair)."""
    vocab = {w: (list(w) + [END], c) for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, c in vocab.values():
            for p in zip(syms, syms[1:]):
                pc[p] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        joined = pair[0] + pair[1]
        for w, (syms, c) in vocab.items():
            out, j = [], 0
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
            vocab[w] = (out, c)
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_fit_matches_naive_reference_randomized(spark):
    from graphrole_spark.functions.tokenizer import bpe_fit

    rng = random.Random(41)
    alphabet = "abcde"
    texts = []
    for _ in range(120):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(1, 10))
        ]
        texts.append(" ".join(words))
    df = _docs(spark, texts)

    got = bpe_fit(df, n_merges=40, min_freq=1)
    wc = Counter(w for t in texts for w in t.split())
    want = _naive_fit(wc, 40)
    assert got == want
    # determinism across partitionings
    assert bpe_fit(df.repartition(17), n_merges=40, min_freq=1) == got


def test_bpe_fit_handcrafted_and_overlap(spark):
    from graphrole_spark.functions.tokenizer import bpe_fit

    # 'aaaa' x3: overlapping-pair bookkeeping — (a,a) fires 9 times
    # counted left-to-right as 2 per word... classic Sennrich counts 3
    # non-overlap-aware pairs per word = 9; either way (a,a) wins first
    df = _docs(spark, ["aaaa aaaa aaaa", "ab ab"])
    merges = bpe_fit(df, n_merges=3, min_freq=1)
    assert merges[0] == ("a", "a")
    wc = Counter(["aaaa"] * 3 + ["ab"] * 2)
    assert merges == _naive_fit(wc, 3)


def test_bpe_fit_min_freq_and_early_stop(spark):
    from graphrole_spark.functions.tokenizer import bpe_fit

    # every word unique -> min_freq=2 empties the table -> no merges
    df = _docs(spark, ["abc", "def", "ghi"])
    assert bpe_fit(df, n_merges=10, min_freq=2) == []
    # with min_freq=1 each pair occurs once -> early stop (no pair >= 2)
    assert bpe_fit(df, n_merges=10, min_freq=1) == []


def test_bpe_encode_greedy_rank_order(spark):
    from graphrole_spark.functions.tokenizer import bpe_encode

    # rank 0 (b,c) beats the later (a,b) even though (a,b) comes first
    # in the word — the canonical lowest-rank-first apply
    df = _docs(spark, ["abc"])
    merges = [("b", "c"), ("a", "bc")]
    out = bpe_encode(df, merges).collect()[0]
    assert out.bpe_tokens == ["abc", END] or out.bpe_tokens == ["abc" + END]
    # step-by-step: abc -> a,bc -> abc ; </w> never merged (no rule)
    assert out.n_bpe_tokens == 2
    assert out.bpe_tokens == ["abc", END]


def test_bpe_fit_encode_round_trip_compresses(spark):
    from graphrole_spark.functions.tokenizer import bpe_encode, bpe_fit

    texts = ["the cat sat on the mat", "the cat ate the rat"] * 5
    df = _docs(spark, texts)
    merges = bpe_fit(df, n_merges=30, min_freq=1)
    enc = {r.doc_id: r for r in bpe_encode(df, merges).collect()}
    # 'the' repeats 4x/doc-pair: must end fully merged incl. </w>
    assert "the" + END in enc[0].bpe_tokens
    # char-level baseline: 0 merges
    base = {r.doc_id: r.n_bpe_tokens for r in bpe_encode(df, []).collect()}
    assert all(enc[i].n_bpe_tokens < base[i] for i in enc)
    # concatenating tokens reconstructs the words (lossless)
    joined = "".join(enc[0].bpe_tokens).replace(END, " ").strip()
    assert joined == texts[0].replace(" ", " ")


def test_bpe_encode_null_empty_and_unseen(spark):
    from graphrole_spark.functions.tokenizer import bpe_encode

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "zq")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in bpe_encode(df, [("a", "b")]).collect()}
    assert out[0].n_bpe_tokens == 0 and out[0].bpe_tokens == []
    assert out[1].n_bpe_tokens == 0
    # unseen word falls back to chars + </w>
    assert out[2].bpe_tokens == ["z", "q", END]


def test_bpe_fit_and_encode_agree_on_newlines_and_tabs(spark):
    """Fit and encode share one segmentation rule: a corpus whose words
    are separated by \\n and \\t learns the same merges as the
    space-separated twin, and encode fires them."""
    from graphrole_spark.functions.tokenizer import bpe_encode, bpe_fit

    ws = _docs(spark, ["the\ncat\tthe cat", "the\tcat"])
    sp = _docs(spark, ["the cat the cat", "the cat"])
    m_ws = bpe_fit(ws, n_merges=10, min_freq=1)
    m_sp = bpe_fit(sp, n_merges=10, min_freq=1)
    assert m_ws == m_sp and m_ws  # identical, non-empty
    enc = bpe_encode(ws, m_ws).orderBy("doc_id").collect()
    assert "the" + END in enc[0].bpe_tokens  # merges fire across \n/\t words
    assert enc[1].bpe_tokens == ["the" + END, "cat" + END]


# ---------------------------------------------------------------------------
# tokenize-and-pack: concat-and-chunk materialization
# ---------------------------------------------------------------------------


def _md5_shard(doc_id, shards):
    import hashlib

    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % shards


def _pack_oracle(doc_ids_map, shards, max_len):
    """Pure-python concat-and-chunk: md5-shard, order by doc_id, concat
    id streams per shard, cut every max_len. Returns
    {(shard, seq_id): (ids, spans)} with spans=(doc_id, start, len)."""
    by_shard = {}
    for did in sorted(doc_ids_map):
        ids = doc_ids_map[did]
        if not ids:
            continue
        by_shard.setdefault(_md5_shard(did, shards), []).append((did, ids))
    out = {}
    for sh, docs in by_shard.items():
        off = 0
        for did, ids in docs:
            for j, tok in enumerate(ids):
                pos = off + j
                seq, p = divmod(pos, max_len)
                key = (sh, seq)
                if key not in out:
                    out[key] = ([], [])
                out[key][0].append(tok)
                spans = out[key][1]
                if spans and spans[-1][0] == did:
                    spans[-1] = (did, spans[-1][1], spans[-1][2] + 1)
                else:
                    spans.append((did, p, 1))
            off += len(ids)
    return out


def test_pack_token_ids_matches_python_oracle_randomized(spark):
    from graphrole_spark.functions.tokenizer import pack_token_ids

    rng = random.Random(77)
    docs = {i: [rng.randrange(50) for _ in range(rng.randrange(0, 23))] for i in range(60)}
    df = spark.createDataFrame(
        [(i, ids) for i, ids in docs.items()], "doc_id long, input_ids array<int>"
    ).repartition(7)
    for max_len, shards in ((8, 4), (16, 1), (5, 3)):
        got = {
            (r.shard, r.seq_id): r
            for r in pack_token_ids(df, max_len, shards=shards).collect()
        }
        want = _pack_oracle(docs, shards, max_len)
        assert set(got) == set(want)
        for key, (ids, spans) in want.items():
            r = got[key]
            assert list(r.input_ids) == ids, key
            assert r.n_tokens == len(ids) and r.n_docs == len(spans)
            assert [(s.doc_id, s.start, s.len) for s in r.doc_spans] == spans
        # every sequence full except possibly one tail per shard
        for sh in {k[0] for k in want}:
            seqs = sorted(k[1] for k in want if k[0] == sh)
            assert seqs == list(range(len(seqs)))  # dense seq ids
            short = [k for k in want if k[0] == sh and len(want[k][0]) < max_len]
            assert all(k[1] == seqs[-1] for k in short)  # only the tail short


def test_pack_token_ids_pad_and_drop_last(spark):
    from graphrole_spark.functions.tokenizer import pack_token_ids

    df = spark.createDataFrame(
        [(1, list(range(10)))], "doc_id long, input_ids array<int>"
    )
    padded = pack_token_ids(df, 8, shards=1, pad_id=-100).orderBy("seq_id").collect()
    assert [r.n_tokens for r in padded] == [8, 2]  # n_tokens excludes pad
    assert list(padded[1].input_ids) == [8, 9] + [-100] * 6
    dropped = pack_token_ids(df, 8, shards=1, drop_last=True).collect()
    assert len(dropped) == 1 and dropped[0].n_tokens == 8


def test_tokenize_pack_end_to_end_lossless(spark):
    """Decoding every sequence's ids through the vocab and rejoining on
    doc_spans reconstructs each document's exact text — the invariant a
    trainer materialization must satisfy."""
    from graphrole_spark.functions.tokenizer import (
        END_WORD,
        bpe_encode,
        bpe_fit,
        build_token_vocab,
        encode_ids,
        tokenize_pack,
    )

    texts = {
        0: "the cat sat on the mat",
        1: "a rat ate the cat",
        2: "the mat sat",
        3: "",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    merges = bpe_fit(df, n_merges=25, min_freq=1)
    enc = bpe_encode(df, merges)
    vocab = {r.token: r.token_id for r in build_token_vocab(enc).collect()}
    assert sorted(vocab.values()) == list(range(len(vocab)))  # contiguous ids
    inv = {v: k for k, v in vocab.items()}
    packed = tokenize_pack(df, max_len=7, merges=merges, shards=2).collect()
    rebuilt = {}
    for r in packed:
        for s in r.doc_spans:
            piece = [inv[t] for t in r.input_ids[s.start : s.start + s.len]]
            rebuilt.setdefault(s.doc_id, []).extend(
                (r.seq_id, s.start, piece) for _ in (0,)
            )
    for did, text in texts.items():
        if not text:
            assert did not in rebuilt  # empty doc contributes no span
            continue
        toks = []
        for _, _, piece in sorted(rebuilt[did]):
            toks.extend(piece)
        assert "".join(toks).replace(END_WORD, " ").strip() == text
    # ids round-trip through encode_ids match the string tokens 1:1
    with_ids = {r.doc_id: r for r in encode_ids(enc, vocab).collect()}
    strs = {r.doc_id: r.bpe_tokens for r in enc.collect()}
    for did in texts:
        assert [inv[i] for i in with_ids[did].input_ids] == strs[did]


def test_pack_token_ids_plan_shape(spark):
    """Two exchanges total (shard window + (shard,seq) aggregate), no
    Python evaluation anywhere in the pack plan."""
    from graphrole_spark.functions.tokenizer import pack_token_ids

    df = spark.createDataFrame(
        [(1, [1, 2, 3])], "doc_id long, input_ids array<int>"
    )
    plan = pack_token_ids(df, 4)._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange")
    assert n_exchange <= 2, plan
    assert "Python" not in plan and "BatchEval" not in plan, plan


def test_encode_to_ids_matches_two_step_path(spark):
    from graphrole_spark.functions.tokenizer import (
        bpe_encode,
        bpe_fit,
        build_token_vocab,
        encode_ids,
        encode_to_ids,
    )

    texts = ["the cat sat on the mat", "a rat ate the cat", "", None, "zq zq"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(3)
    merges = bpe_fit(df, n_merges=20, min_freq=1)
    enc = bpe_encode(df, merges)
    vocab = {r.token: r.token_id for r in build_token_vocab(enc).collect()}
    two_step = {r.doc_id: list(r.input_ids)
                for r in encode_ids(enc, vocab).collect()}
    fused = {r.doc_id: list(r.input_ids)
             for r in encode_to_ids(df, merges, vocab).collect()}
    assert fused == two_step
    assert fused[2] == [] and fused[3] == []
