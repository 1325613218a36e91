"""Naive-Bayes quality classifier (functions/classifier.py): exact
python-oracle parity (same portable md5 buckets, same add-one
smoothing), DuckDB full-pipeline parity (fit + score in SQL), MAP
separability on a planted good/bad vocabulary, and the unknown-gram /
empty-document neutrality rules."""

import hashlib
import math
import random

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, label boolean")


def _md5_bucket(s: str, buckets: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % buckets


def _py_fit_score(train, score_docs, n, buckets):
    """Pure-python replica: hashed-gram NB with add-one smoothing on
    grams AND prior; never-trained buckets take the smoothed default
    ln((N+B)/(P+B))."""
    pc, nc = {}, {}
    n_pos = n_neg = 0
    for _id, text, y in train:
        toks = [t for t in (text or "").split() if t]
        if y:
            n_pos += 1
        else:
            n_neg += 1
        for i in range(max(len(toks) - n + 1, 0)):
            b = _md5_bucket(" ".join(toks[i : i + n]), buckets)
            tgt = pc if y else nc
            tgt[b] = tgt.get(b, 0) + 1
    P, N = sum(pc.values()), sum(nc.values())
    prior = math.log(n_pos + 1.0) - math.log(n_neg + 1.0)
    seen = set(pc) | set(nc)
    w = {
        b: math.log((pc.get(b, 0) + 1.0) / (P + buckets))
        - math.log((nc.get(b, 0) + 1.0) / (N + buckets))
        for b in seen
    }
    default = math.log(1.0 / (P + buckets)) - math.log(1.0 / (N + buckets))
    out = {}
    for _id, text, _y in score_docs:
        toks = [t for t in (text or "").split() if t]
        gs = [
            _md5_bucket(" ".join(toks[i : i + n]), buckets)
            for i in range(max(len(toks) - n + 1, 0))
        ]
        s = prior + sum(w.get(b, default) for b in gs)
        out[_id] = (len(gs), round(s, 6), s > 0)
    return out


def test_nb_matches_python_oracle(spark):
    from graphrole_spark.functions.classifier import (
        nb_quality_fit,
        nb_quality_score,
    )

    rng = random.Random(7)
    good_vocab = ["theorem", "proof", "lemma", "therefore", "analysis"]
    bad_vocab = ["click", "subscribe", "buy", "winner", "free"]
    rows = []
    for i in range(60):
        y = i % 2 == 0
        vocab = good_vocab if y else bad_vocab
        noise = ["the", "a", "of"]
        text = " ".join(
            rng.choice(vocab if rng.random() < 0.7 else noise)
            for _ in range(rng.randint(0, 12))
        )
        rows.append((i, text, y))
    df = _docs(spark, rows)

    model = nb_quality_fit(df, buckets=512)
    got = {
        r.doc_id: (r.n_grams, r.nb_score, r.predicted)
        for r in nb_quality_score(df, model, buckets=512).collect()
    }
    want = _py_fit_score(rows, rows, n=1, buckets=512)
    for i in want:
        assert got[i][0] == want[i][0], i
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-6), i
        assert got[i][2] == want[i][2], i


def test_nb_duckdb_parity(spark):
    """Fit + score replicated end-to-end in DuckDB SQL with the same
    md5-bucket idiom — the tail-entry stand-in for the driver oracle
    (registry window is full)."""
    import duckdb
    import pandas as pd
    from graphrole_spark.functions.classifier import (
        nb_quality_fit,
        nb_quality_score,
    )

    rng = random.Random(13)
    vocab = ["alpha", "beta", "gamma", "spam", "ham", "x1", "y2"]
    rows = [
        (
            i,
            " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8))),
            rng.random() < 0.5,
        )
        for i in range(80)
    ]
    df = _docs(spark, rows)
    B = 256
    model = nb_quality_fit(df, buckets=B, n=1)
    spark_pdf = (
        nb_quality_score(df, model, buckets=B, n=1)
        .orderBy("doc_id")
        .toPandas()
    )

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text", "label"]))
    oracle = con.execute(f"""
        WITH toks AS (
          SELECT doc_id, label, unnest(
            list_filter(string_split(trim(coalesce(text,'')), ' '),
                        t -> t <> '')) AS tok
          FROM docs),
        grams AS (
          SELECT doc_id, label,
                 CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % {B}
                   AS bucket
          FROM toks),
        counts AS (
          SELECT bucket,
                 sum(CASE WHEN label THEN 1 ELSE 0 END) AS pc,
                 sum(CASE WHEN label THEN 0 ELSE 1 END) AS nc
          FROM grams GROUP BY bucket),
        weights AS (
          SELECT bucket,
                 ln((pc + 1.0) / ((SELECT sum(pc) FROM counts) + {B}))
               - ln((nc + 1.0) / ((SELECT sum(nc) FROM counts) + {B}))
                   AS log_ratio
          FROM counts),
        dflt AS (
          SELECT ln(1.0 / ((SELECT sum(pc) FROM counts) + {B}))
               - ln(1.0 / ((SELECT sum(nc) FROM counts) + {B})) AS d),
        prior AS (
          SELECT ln(sum(CASE WHEN label THEN 1 ELSE 0 END) + 1.0)
               - ln(sum(CASE WHEN label THEN 0 ELSE 1 END) + 1.0) AS p
          FROM docs),
        evidence AS (
          SELECT g.doc_id, count(*) AS n_grams,
                 sum(coalesce(w.log_ratio, (SELECT d FROM dflt))) AS e
          FROM grams g LEFT JOIN weights w USING (bucket)
          GROUP BY g.doc_id)
        SELECT d.doc_id,
               CAST(coalesce(ev.n_grams, 0) AS BIGINT) AS n_grams,
               round((SELECT p FROM prior) + coalesce(ev.e, 0.0), 6)
                 AS nb_score,
               (SELECT p FROM prior) + coalesce(ev.e, 0.0) > 0 AS predicted
        FROM docs d LEFT JOIN evidence ev USING (doc_id)
        ORDER BY d.doc_id
    """).df()
    assert spark_pdf["doc_id"].tolist() == oracle["doc_id"].tolist()
    assert spark_pdf["n_grams"].tolist() == oracle["n_grams"].tolist()
    assert spark_pdf["nb_score"].tolist() == pytest.approx(
        oracle["nb_score"].tolist(), abs=1e-6
    )
    assert spark_pdf["predicted"].tolist() == oracle["predicted"].tolist()


def test_nb_separates_planted_classes_and_neutral_rules(spark):
    from graphrole_spark.functions.classifier import (
        nb_quality_fit,
        nb_quality_score,
    )

    train = [(i, "theorem proof lemma analysis", True) for i in range(10)]
    train += [(10 + i, "click subscribe buy free", False) for i in range(10)]
    df = _docs(spark, train)
    model = nb_quality_fit(df, buckets=4096)

    held = spark.createDataFrame(
        [
            (100, "proof of the lemma"),
            (101, "buy now click subscribe"),
            (102, "zzz qqq www"),  # all unseen buckets -> prior only
            (103, ""),  # empty -> prior only
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r for r in nb_quality_score(held, model, buckets=4096).collect()
    }
    assert out[100].predicted and out[100].nb_score > 0
    assert not out[101].predicted and out[101].nb_score < 0
    # balanced training set: prior = ln(11/11) = 0
    assert out[102].nb_score == pytest.approx(0.0, abs=1e-9)
    assert out[103].nb_score == pytest.approx(0.0, abs=1e-9)
    assert out[103].n_grams == 0
    # model artifact stays bounded: <= buckets + 1 rows
    assert model.count() <= 4096 + 2


def test_nb_bigram_mode_and_single_class_guard(spark):
    from graphrole_spark.functions.classifier import (
        nb_quality_fit,
        nb_quality_score,
    )

    rows = [(0, "good good good", True), (1, "bad bad bad", True)]
    df = _docs(spark, rows)
    # single-class training stays finite (add-one prior, no log(0))
    model = nb_quality_fit(df, buckets=64, n=2)
    out = nb_quality_score(df, model, buckets=64, n=2).collect()
    assert all(r.nb_score == r.nb_score for r in out)  # no NaN
    # bigram gram count: 3 tokens -> 2 bigrams
    assert {r.doc_id: r.n_grams for r in out} == {0: 2, 1: 2}


def test_nb_null_labels_are_excluded_not_negative(spark):
    from graphrole_spark.functions.classifier import nb_quality_fit

    base = [(0, "alpha beta", True), (1, "gamma delta", False)]
    with_null = base + [(2, "alpha alpha alpha", None)]
    m1 = nb_quality_fit(_docs(spark, base), buckets=64)
    m2 = nb_quality_fit(
        spark.createDataFrame(
            with_null, "doc_id long, text string, label boolean"
        ),
        buckets=64,
    )
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))
