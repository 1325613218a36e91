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


# -- bigram LM (stupid backoff) --------------------------------------------

def test_bigram_lm_matches_hand_computation(spark):
    from graphrole_spark.functions.terms import bigram_lm_fit, bigram_lm_scores

    train = _docs(spark, ["a b a", "b c"])
    model = bigram_lm_fit(train)
    # model: unigrams a=2 b=2 c=1 (T=5, V=3); bigrams (a,b)=1 (b,a)=1 (b,c)=1
    rows = {(r.prev, r.term): r.c for r in model.collect()}
    assert rows == {
        (None, "a"): 2, (None, "b"): 2, (None, "c"): 1,
        ("a", "b"): 1, ("b", "a"): 1, ("b", "c"): 1,
    }
    out = {
        r.doc_id: (r.n_tokens, r.bi_nll, r.backoff_frac)
        for r in bigram_lm_scores(
            _docs(spark, ["a b x", "", "a"]), model
        ).collect()
    }
    # "a b x": first token a -> (2+1)/8; (a,b) seen -> 1/2;
    # (b,x) unseen -> 0.4 * (0+1)/8
    nll = -(math.log(3 / 8) + math.log(1 / 2) + math.log(0.4 / 8)) / 3
    assert out[0] == (3, round(nll, 6), round(1 / 3, 6))
    # single-token doc: unigram only, never a backoff
    assert out[2] == (1, round(-math.log(3 / 8), 6), 0.0)
    # empty doc emits no row
    assert set(out) == {0, 2}


def test_bigram_lm_self_fit_never_backs_off(spark):
    from graphrole_spark.functions.terms import bigram_lm_fit, bigram_lm_scores

    docs = _docs(spark, ["p q r p q", "q q", "r"])
    model = bigram_lm_fit(docs)
    out = bigram_lm_scores(docs, model).collect()
    assert len(out) == 3
    # every scored bigram occurred in training (same corpus)
    assert all(r.backoff_frac == 0.0 for r in out)


def test_bigram_lm_duckdb_parity(spark):
    """Full-semantics DuckDB twin: fit on even doc_ids, score all —
    the train/score split makes the backoff branch fire for real."""
    import random

    import duckdb
    import pandas as pd

    from graphrole_spark.functions.terms import bigram_lm_fit, bigram_lm_scores

    rng = random.Random(7)
    # vocab wide enough (15 words = 225 bigram types vs ~180 training
    # bigram instances) that the score half contains unseen bigrams
    vocab = [f"w{i}" for i in range(15)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = bigram_lm_fit(df.where("doc_id % 2 = 0"))
    spark_pdf = (
        bigram_lm_scores(df, model, alpha=0.4).orderBy("doc_id").toPandas()
    )

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    oracle = con.execute("""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(coalesce(text, '')), ' +'),
                             x -> x <> '') AS toks
          FROM docs),
        tr AS (SELECT * FROM t WHERE doc_id % 2 = 0),
        tuni AS (
          SELECT tok AS term, count(*) AS c
          FROM tr, unnest(toks) AS u(tok) GROUP BY tok),
        ttot AS (SELECT sum(c) AS T, count(*) AS V FROM tuni),
        tbi AS (
          SELECT toks[i] AS prev, toks[i + 1] AS term, count(*) AS cb
          FROM tr, unnest(generate_series(1, len(toks) - 1)) AS u(i)
          GROUP BY 1, 2),
        inst AS (
          SELECT doc_id,
                 CASE WHEN i = 1 THEN NULL ELSE toks[i - 1] END AS prev,
                 toks[i] AS term
          FROM t, unnest(generate_series(1, len(toks))) AS u(i)),
        s AS (
          SELECT doc_id,
                 CASE WHEN a.prev IS NULL
                        THEN (coalesce(cw.c, 0) + 1) * 1.0 / (T + V)
                      WHEN tb.cb IS NOT NULL THEN tb.cb * 1.0 / cp.c
                      ELSE 0.4 * (coalesce(cw.c, 0) + 1) / (T + V) END AS sc,
                 CASE WHEN a.prev IS NOT NULL AND tb.cb IS NULL
                      THEN 1 ELSE 0 END AS bo
          FROM inst a
          LEFT JOIN tuni cw ON a.term = cw.term
          LEFT JOIN tbi tb ON a.prev = tb.prev AND a.term = tb.term
          LEFT JOIN tuni cp ON a.prev = cp.term
          CROSS JOIN ttot)
        SELECT doc_id, count(*) AS n_tokens,
               round(avg(-ln(sc)), 6) AS bi_nll,
               round(avg(bo), 6) AS backoff_frac
        FROM s GROUP BY doc_id ORDER BY doc_id
    """).df()
    assert len(spark_pdf) == len(oracle) > 0
    assert float(spark_pdf["backoff_frac"].max()) > 0  # backoff fired
    for col in ["doc_id", "n_tokens"]:
        assert spark_pdf[col].astype("int64").tolist() == \
            oracle[col].astype("int64").tolist()
    for col in ["bi_nll", "backoff_frac"]:
        assert np.allclose(spark_pdf[col], oracle[col], atol=1e-9)


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


# -- BM25 retrieval ---------------------------------------------------------

def test_bm25_matches_hand_computation(spark):
    from graphrole_spark.functions.terms import bm25_topk

    docs = _docs(spark, ["a a b", "a c", "c c d"])
    queries = spark.createDataFrame(
        [(0, "a d")], "query_id long, text string"
    )
    out = {
        r.doc_id: (r.n_matched, r.bm25, r.rank)
        for r in bm25_topk(docs, queries, k=10).collect()
    }
    # dl = 3, 2, 3; N = 3; avgdl = 8/3; df: a=2, b=1, c=2, d=1
    k1, b, avgdl = 1.2, 0.75, 8 / 3
    idf = lambda df_: math.log(1 + (3 - df_ + 0.5) / (df_ + 0.5))
    part = lambda tf, dl: tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    s0 = idf(2) * part(2, 3)                   # 'a' in d0 (no 'd')
    s1 = idf(2) * part(1, 2)                   # 'a' in d1
    s2 = idf(1) * part(1, 3)                   # 'd' in d2
    assert out[0] == (1, round(s0, 6), sorted(
        [s0, s1, s2], reverse=True).index(s0) + 1)
    assert out[1][:2] == (1, round(s1, 6))
    assert out[2][:2] == (1, round(s2, 6))
    # idf(d)=ln(8/3) beats idf(a)=ln(1.6) enough that d2 ranks first
    assert out[2][2] == 1


def test_bm25_k_truncates_and_query_tf_ignored(spark):
    from graphrole_spark.functions.terms import bm25_topk

    docs = _docs(spark, ["a", "a a", "a a a", "b"])
    q1 = spark.createDataFrame([(0, "a")], "query_id long, text string")
    q2 = spark.createDataFrame([(0, "a a a")], "query_id long, text string")
    one = bm25_topk(docs, q1, k=2).orderBy("rank").collect()
    rep = bm25_topk(docs, q2, k=2).orderBy("rank").collect()
    assert len(one) == 2  # 3 matching docs, k=2 truncates
    assert [(r.doc_id, r.bm25) for r in one] == [
        (r.doc_id, r.bm25) for r in rep
    ]  # query-side term frequency does not change scores
    # only docs sharing a term are scored
    assert all(r.doc_id != 3 for r in one)


def test_bm25_duckdb_parity(spark):
    """Full-semantics DuckDB twin on randomized docs + queries — the
    tail-entry stand-in for the driver oracle (registry window full)."""
    import random

    import duckdb
    import pandas as pd

    from graphrole_spark.functions.terms import bm25_topk

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(20)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15))))
        for i in range(80)
    ]
    qrows = [
        (q, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 4))))
        for q in range(6)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    queries = spark.createDataFrame(qrows, "query_id long, text string")
    got = (
        bm25_topk(docs, queries, k=5, k1=1.2, b=0.75)
        .orderBy("query_id", "rank")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    con.register("qs", pd.DataFrame(qrows, columns=["query_id", "text"]))
    oracle = con.execute("""
        WITH inst AS (
          SELECT doc_id, tok AS term
          FROM (SELECT doc_id,
                       list_filter(string_split_regex(trim(coalesce(text, '')), ' +'),
                                   x -> x <> '') AS toks
                FROM docs), unnest(toks) AS u(tok)),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM inst GROUP BY doc_id, term),
        dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        qterms AS (
          SELECT DISTINCT query_id, tok AS term
          FROM (SELECT query_id,
                       list_filter(string_split_regex(trim(coalesce(text, '')), ' +'),
                                   x -> x <> '') AS toks
                FROM qs), unnest(toks) AS u(tok)),
        scored AS (
          SELECT query_id, tf.doc_id, count(*) AS n_matched,
                 round(sum(
                   ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))), 6)
                   AS bm25
          FROM tf
          JOIN qterms USING (term)
          JOIN dfreq USING (term)
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN stats
          GROUP BY query_id, tf.doc_id),
        ranked AS (
          SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rank
          FROM scored)
        SELECT query_id, doc_id, n_matched, bm25, rank
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """).df()
    assert len(got) == len(oracle) > 0
    for col in ["query_id", "doc_id", "n_matched", "rank"]:
        assert got[col].astype("int64").tolist() == \
            oracle[col].astype("int64").tolist()
    assert np.allclose(got["bm25"], oracle["bm25"], atol=1e-9)


def test_bm25_empty_query_or_corpus(spark):
    from graphrole_spark.functions.terms import bm25_topk

    docs = _docs(spark, ["a b"])
    no_q = spark.createDataFrame([], "query_id long, text string")
    assert bm25_topk(docs, no_q).count() == 0
    q = spark.createDataFrame([(0, "a")], "query_id long, text string")
    no_docs = _docs(spark, [])
    assert bm25_topk(no_docs, q).count() == 0


# -- CCNet-style score buckets ----------------------------------------------

def test_score_buckets_per_language_thirds(spark):
    from graphrole_spark.functions.terms import score_buckets

    rows = [
        # lang en: 6 docs, scores 1..6 -> thirds of 2
        *[(i, "en", float(i)) for i in range(1, 7)],
        # lang fr: 4 docs -> ntile(3) = sizes 2,1,1
        *[(10 + i, "fr", float(i)) for i in range(1, 5)],
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, nll double")
    out = {
        r.doc_id: (r.bucket, r.bucket_label)
        for r in score_buckets(df, "nll", by="lang").collect()
    }
    assert [out[i][1] for i in range(1, 7)] == [
        "head", "head", "middle", "middle", "tail", "tail"
    ]
    assert [out[10 + i][1] for i in range(1, 5)] == [
        "head", "head", "middle", "tail"
    ]


def test_score_buckets_duckdb_ntile_parity_and_ties(spark):
    import random

    import duckdb
    import pandas as pd

    from graphrole_spark.functions.terms import score_buckets

    rng = random.Random(3)
    rows = [
        (i, rng.choice(["en", "fr", "de"]), float(rng.randint(0, 5)))
        for i in range(50)
    ]  # coarse scores force ties -> id tie-break must match
    df = spark.createDataFrame(rows, "doc_id long, lang string, nll double")
    got = (
        score_buckets(df, "nll", by="lang", buckets=4)
        .orderBy("doc_id")
        .toPandas()
    )
    assert set(got["bucket_label"]) <= {"1", "2", "3", "4"}
    con = duckdb.connect()
    con.register("s", pd.DataFrame(rows, columns=["doc_id", "lang", "nll"]))
    oracle = con.execute("""
        SELECT doc_id, ntile(4) OVER (
            PARTITION BY lang ORDER BY nll, doc_id) AS bucket
        FROM s ORDER BY doc_id
    """).df()
    assert got["bucket"].astype("int64").tolist() == \
        oracle["bucket"].astype("int64").tolist()


# -- fitted cutpoints (CCNet deploy mode) -----------------------------------

def test_score_cutpoints_numpy_duckdb_parity(spark):
    import duckdb
    import numpy as np
    import pandas as pd

    from graphrole_spark.functions.terms import score_cutpoints

    import random
    rng = random.Random(11)
    rows = [
        (i, rng.choice(["en", "fr"]), round(rng.gauss(5.0, 2.0), 6))
        for i in range(137)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, nll double")
    got = {
        r.lang: list(r.cuts)
        for r in score_cutpoints(df, "nll", by="lang", buckets=4).collect()
    }
    # agreement is to ULP jitter (each engine orders the lerp
    # differently); buckets stay portable because scores are rounded
    # to 6 decimals while cuts land strictly between distinct values
    pdf = pd.DataFrame(rows, columns=["doc_id", "lang", "nll"])
    for lang, grp in pdf.groupby("lang"):
        want = np.quantile(grp["nll"].to_numpy(), [0.25, 0.5, 0.75])
        assert np.allclose(got[lang], want, rtol=1e-12), (lang, got[lang], want)
    con = duckdb.connect()
    con.register("s", pdf)
    duck = con.execute(
        "SELECT lang, quantile_cont(nll, [0.25, 0.5, 0.75]) AS cuts"
        " FROM s GROUP BY lang"
    ).fetchall()
    for lang, cuts in duck:
        assert np.allclose([float(c) for c in cuts], got[lang], rtol=1e-12)


def test_score_buckets_apply_semantics(spark):
    from graphrole_spark.functions.terms import (
        score_buckets_apply,
        score_cutpoints,
    )

    # 7 points per group -> tertile indices (n-1)/3 = 2 and 4 are
    # integers, so cuts land EXACTLY on data values (no lerp, no ULP
    # ambiguity): en cuts [3.0, 5.0], fr cuts [30.0, 50.0]; a score
    # equal to a cut goes DOWN.
    fit = spark.createDataFrame(
        [(i, "en", float(i)) for i in range(1, 8)]
        + [(i, "fr", float(10 * i)) for i in range(1, 8)],
        "doc_id long, lang string, nll double",
    )
    cuts = score_cutpoints(fit, "nll", by="lang")
    got = {r.lang: list(r.cuts) for r in cuts.collect()}
    assert got["en"] == [3.0, 5.0]
    probe = spark.createDataFrame(
        [
            (1, "en", 1.0),        # below first cut -> head
            (2, "en", 3.0),        # ON the cut -> ties go low -> head
            (3, "en", 4.0),        # middle
            (4, "en", 99.0),       # above all -> tail
            (5, "fr", 35.0),       # fr cuts are [30, 50] -> middle
            (6, "de", 1.0),        # no fitted group -> NULL bucket
            (7, "en", None),       # NULL score -> NULL bucket
        ],
        "doc_id long, lang string, nll double",
    )
    out = {
        r.doc_id: (r.bucket, r.bucket_label)
        for r in score_buckets_apply(probe, cuts, "nll", by="lang").collect()
    }
    assert out[1] == (1, "head")
    assert out[2] == (1, "head")
    assert out[3] == (2, "middle")
    assert out[4] == (3, "tail")
    assert out[5] == (2, "middle")
    assert out[6] == (None, None)
    assert out[7] == (None, None)


def test_score_cutpoints_global_and_approx(spark):
    from graphrole_spark.functions.terms import (
        score_buckets_apply,
        score_cutpoints,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "doc_id long, s double"
    )
    exact = score_cutpoints(df, "s")  # global: one row, no `by`
    out = score_buckets_apply(df, exact, "s")
    counts = (
        out.groupBy("bucket_label").count().toPandas()
        .set_index("bucket_label")["count"].to_dict()
    )
    # 1..100 tertiles: cuts at 34 and 67 (interpolated); balanced thirds
    assert counts == {"head": 34, "middle": 33, "tail": 33}
    approx = score_cutpoints(df, "s", relative_error=0.001)
    a = list(approx.collect()[0].cuts)
    e = list(exact.collect()[0].cuts)
    assert len(a) == 2 and all(abs(x - y) <= 1.0 for x, y in zip(a, e))
