"""Unit tests for the round-3 corpus additions: tf-idf keyword
extraction, unigram LM scoring, PII redaction, and SemDeDup-style
semantic deduplication — each against a hand-computed or numpy
brute-force oracle on crafted inputs (the entry-contract test
separately checks each against its DuckDB oracle on the shared
tables)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# -- tf-idf ----------------------------------------------------------------

def test_tfidf_matches_hand_computation(spark):
    from graphrole_spark.functions.terms import tfidf_topk

    docs = _docs(spark, ["a a b", "a c", "c c d"])
    out = {
        (r.doc_id, r.term): (r.tf, r.df, r.tfidf, r.rank)
        for r in tfidf_topk(docs, k=10).collect()
    }
    # N=3 docs; df: a=2, b=1, c=2, d=1
    ln = math.log
    assert out[(0, "a")][:3] == (2, 2, round(2 * ln(3 / 2), 6))
    assert out[(0, "b")][:3] == (1, 1, round(ln(3.0), 6))
    # doc 0 ranking: b (1.0986) above a (0.8109)
    assert out[(0, "b")][3] == 1 and out[(0, "a")][3] == 2
    assert out[(2, "c")][:3] == (2, 2, round(2 * ln(3 / 2), 6))
    assert out[(2, "d")][3] == 1  # ln3 > 2ln(1.5)


def test_tfidf_k_truncates_and_ties_break_on_term(spark):
    from graphrole_spark.functions.terms import tfidf_topk

    # doc 0 has 3 terms each appearing once and only here: equal scores,
    # rank must follow term order alphabetically
    docs = _docs(spark, ["x y z", "w w"])
    rows = tfidf_topk(docs, k=2).where("doc_id = 0").orderBy("rank").collect()
    assert [r.term for r in rows] == ["x", "y"]


def test_tfidf_empty_and_blank_docs_emit_nothing(spark):
    from graphrole_spark.functions.terms import tfidf_topk

    docs = _docs(spark, ["a b", "", "   "])
    out = tfidf_topk(docs, k=3).collect()
    assert {r.doc_id for r in out} == {0}
    # N counts only docs with tokens: idf = ln(1/1) = 0 for both terms
    assert all(r.tfidf == 0.0 for r in out)


# -- unigram LM ------------------------------------------------------------

def test_unigram_lm_matches_hand_computation(spark):
    from graphrole_spark.functions.terms import unigram_lm_scores

    docs = _docs(spark, ["a a b", "b c"])
    out = {r.doc_id: (r.n_tokens, r.nll) for r in unigram_lm_scores(docs).collect()}
    # counts: a=2 b=2 c=1; T=5, V=3 -> p(a)=3/8, p(b)=3/8, p(c)=2/8
    pa = pb = 3 / 8
    pc = 2 / 8
    nll0 = -(2 * math.log(pa) + math.log(pb)) / 3
    nll1 = -(math.log(pb) + math.log(pc)) / 2
    assert out[0] == (3, round(nll0, 6))
    assert out[1] == (2, round(nll1, 6))


def test_unigram_lm_skips_empty_docs(spark):
    from graphrole_spark.functions.terms import unigram_lm_scores

    docs = _docs(spark, ["a", ""])
    assert [r.doc_id for r in unigram_lm_scores(docs).collect()] == [0]


# -- PII redaction ---------------------------------------------------------

CASES = [
    ("mail bob.smith+x@corp.example.org now", "mail <EMAIL> now", 1, 0, 0),
    ("srv at 192.168.0.17 down", "srv at <IP> down", 0, 1, 0),
    ("call 415-555-0134 today", "call <PHONE> today", 0, 0, 1),
    # an address with digits+dots in the local part redacts as ONE email
    ("x 10.0.0.1@host.com y", "x <EMAIL> y", 1, 0, 0),
    ("none here", "none here", 0, 0, 0),
    ("a@b.co 1.2.3.4 555-123-4567", "<EMAIL> <IP> <PHONE>", 1, 1, 1),
]


def test_redact_pii_cases(spark):
    from graphrole_spark.functions.text import redact_pii_frame

    docs = _docs(spark, [c[0] for c in CASES])
    got = {r.doc_id: r for r in redact_pii_frame(docs).collect()}
    for i, (_, want, ne, ni, np_) in enumerate(CASES):
        r = got[i]
        assert r.redacted == want, r.redacted
        assert (r.n_emails, r.n_ips, r.n_phones) == (ne, ni, np_)


def test_redact_pii_null_text_is_empty_doc(spark):
    from graphrole_spark.functions.text import redact_pii_frame

    docs = spark.createDataFrame([(0, None)], "doc_id long, text string")
    r = redact_pii_frame(docs).collect()[0]
    assert r.redacted == "" and r.n_emails == 0


# -- semantic dedup --------------------------------------------------------

def _emb(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )


def test_semantic_dedup_drops_exact_copy_keeps_orthogonal(spark):
    from graphrole_spark.functions.similarity import semantic_dedup

    base = [1.0, 0.5, 0.25, 0.125, 1.0]
    mat = [
        base,
        [x * 2 for x in base],          # same direction -> cosine 1, dropped
        [1.0, 0.5, 0.25, 0.125, -8.0],  # same sign bucket, far -> kept
        [-1.0, -0.5, -0.25, -0.125, 1.0],  # different bucket -> kept
    ]
    out = {r.vec_id: r for r in semantic_dedup(_emb(spark, mat), 0.9).collect()}
    assert not out[1].keep
    assert out[0].keep and out[2].keep and out[3].keep
    assert out[0].bucket == out[1].bucket == out[2].bucket != out[3].bucket


def test_semantic_dedup_matches_numpy_bruteforce(spark):
    from graphrole_spark.functions.similarity import semantic_dedup

    rng = np.random.default_rng(11)
    M = rng.normal(size=(80, 8))
    # plant duplicate directions to exercise the drop path
    M[17] = M[3] * 1.7
    M[55] = M[20] * 0.4 + rng.normal(size=8) * 0.01
    M = M.astype(np.float32)
    tau = 0.8

    got = {r.vec_id: r.keep for r in semantic_dedup(_emb(spark, M), tau).collect()}

    Md = M.astype(np.float64)
    bucket = ((Md[:, :4] >= 0).astype(int) @ (2 ** np.arange(4))).astype(int)
    N = Md / np.linalg.norm(Md, axis=1, keepdims=True)
    cos = N @ N.T
    expect = {}
    for j in range(len(Md)):
        dup = any(
            bucket[i] == bucket[j] and cos[i, j] >= tau for i in range(j)
        )
        expect[j] = not dup
    assert got == expect
    assert not got[17]


def test_semantic_dedup_keep_rule_is_lower_id_not_transitive(spark):
    """5 copies of one direction in one bucket: only the smallest id
    survives (every other has a lower-id duplicate)."""
    from graphrole_spark.functions.similarity import semantic_dedup

    mat = [[1.0, 1.0, 1.0, 1.0, float(k + 1)] for k in range(1)] * 1
    mat = [[c * (k + 1) for c in [1.0, 1.0, 1.0, 1.0, 0.5]] for k in range(5)]
    out = semantic_dedup(_emb(spark, mat), 0.99).orderBy("vec_id").collect()
    assert [r.keep for r in out] == [True, False, False, False, False]
