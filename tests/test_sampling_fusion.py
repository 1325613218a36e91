"""Tests for the weighted-sampling / soft-dedup / cross-source-overlap /
retrieval-fusion layer (functions/corpus.py::weighted_sample,
functions/text.py::{dedup_weights,source_overlap},
functions/terms.py::{tfidf_search_topk,rrf_fuse,hybrid_topk}).

Each SQL-expressible operator gets a full-semantics DuckDB value twin
(the tail-entry stand-in for the driver oracle — registry window full),
plus the invariants a user would rely on.
"""

import random

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

# DuckDB twin of corpus._md5_uniform: first 8 md5 hex chars as long / 16^8
MD5_U = (
    "CAST(concat('0x', substr(md5(concat(CAST({id} AS VARCHAR), '{salt}')), 1, 8)) "
    "AS BIGINT) / 4294967296.0"
)


def _docs_pdf(n=200, seed=3):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        w = rng.choice([0.5, 1.0, 2.0, 5.0, 10.0])
        rows.append((i, f"s{rng.randint(0, 3)}", w))
    return pd.DataFrame(rows, columns=["doc_id", "source", "w"])


def test_weighted_sample_global_duckdb_parity(spark):
    from graphrole_spark.functions.corpus import weighted_sample

    pdf = _docs_pdf()
    docs = spark.createDataFrame(pdf)
    got = (
        weighted_sample(docs, n=25, weight_col="w", salt="t1")
        .orderBy("rank")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    u = MD5_U.format(id="doc_id", salt="t1")
    oracle = con.execute(f"""
        WITH keyed AS (
          SELECT doc_id, CAST(w AS DOUBLE) AS weight,
                 round(pow({u}, 1.0 / w), 12) AS samp_key
          FROM docs WHERE w IS NOT NULL AND w > 0),
        r AS (
          SELECT *, row_number() OVER (ORDER BY samp_key DESC, doc_id) AS rank
          FROM keyed)
        SELECT doc_id, weight, samp_key, rank FROM r
        WHERE rank <= 25 ORDER BY rank
    """).df()
    assert len(got) == 25
    assert got["doc_id"].tolist() == oracle["doc_id"].tolist()
    assert got["rank"].tolist() == oracle["rank"].tolist()
    pd.testing.assert_series_equal(
        got["samp_key"], oracle["samp_key"], check_exact=False, rtol=1e-12
    )


def test_weighted_sample_stratified_duckdb_parity(spark):
    from graphrole_spark.functions.corpus import weighted_sample

    pdf = _docs_pdf()
    docs = spark.createDataFrame(pdf)
    got = (
        weighted_sample(
            docs, n=5, weight_col="w", strata_col="source", salt="t2"
        )
        .orderBy("stratum", "rank")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    u = MD5_U.format(id="doc_id", salt="t2")
    oracle = con.execute(f"""
        WITH keyed AS (
          SELECT doc_id, source AS stratum, CAST(w AS DOUBLE) AS weight,
                 round(pow({u}, 1.0 / w), 12) AS samp_key
          FROM docs WHERE w IS NOT NULL AND w > 0),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY stratum
                     ORDER BY samp_key DESC, doc_id) AS rank
          FROM keyed)
        SELECT doc_id, stratum, weight, samp_key, rank FROM r
        WHERE rank <= 5 ORDER BY stratum, rank
    """).df()
    assert got["doc_id"].tolist() == oracle["doc_id"].tolist()
    assert got["stratum"].tolist() == oracle["stratum"].tolist()
    # every stratum contributes exactly 5 (200 docs over 4 sources)
    assert got.groupby("stratum")["rank"].max().tolist() == [5, 5, 5, 5]


def test_weighted_sample_filters_and_determinism(spark):
    from graphrole_spark.functions.corpus import weighted_sample

    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4, 5], "w": [1.0, 0.0, -2.0, None, 3.0]}
    )
    docs = spark.createDataFrame(pdf)
    got = weighted_sample(docs, n=10, weight_col="w").toPandas()
    # non-positive / NULL weights can never be sampled
    assert sorted(got["doc_id"].tolist()) == [1, 5]
    # stable across partitionings
    again = weighted_sample(
        spark.createDataFrame(pdf).repartition(7), n=10, weight_col="w"
    ).toPandas()
    assert got.sort_values("rank")["doc_id"].tolist() == again.sort_values(
        "rank"
    )["doc_id"].tolist()
    with pytest.raises(ValueError):
        weighted_sample(docs, n=0, weight_col="w")


def test_weighted_sample_is_weight_proportional(spark):
    """A-ES soundness: heavy rows dominate the selected sample."""
    from graphrole_spark.functions.corpus import weighted_sample

    rows = [(i, 1000.0 if i < 50 else 0.01) for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(docs, n=50, weight_col="w").toPandas()
    heavy = (got["doc_id"] < 50).sum()
    assert heavy >= 45  # overwhelming weight ratio -> near-total capture


def test_dedup_weights_duckdb_parity(spark):
    from graphrole_spark.functions.text import dedup_weights

    rows = [
        (1, "alpha"), (2, "beta"), (3, "alpha"), (4, None),
        (5, "alpha"), (6, None), (7, "gamma"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs = spark.createDataFrame(pdf)
    got = dedup_weights(docs).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    oracle = con.execute("""
        SELECT min(doc_id) AS doc_id,
               CASE WHEN text IS NOT NULL THEN md5(text) END AS content_hash,
               CAST(count(*) AS BIGINT) AS weight
        FROM docs GROUP BY text ORDER BY doc_id
    """).df()
    assert got["doc_id"].tolist() == oracle["doc_id"].tolist()
    assert got["weight"].tolist() == oracle["weight"].tolist()
    assert got["content_hash"].tolist() == oracle["content_hash"].tolist()
    # weights conserve the corpus: sum(weight) == n input docs
    assert got["weight"].sum() == len(rows)


def test_source_overlap_duckdb_parity(spark):
    from graphrole_spark.functions.text import source_overlap

    rng = random.Random(9)
    rows = [
        (i, f"s{rng.randint(0, 2)}", f"doc {rng.randint(0, 30)}")
        for i in range(150)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    docs = spark.createDataFrame(pdf)
    got = source_overlap(docs).orderBy("source_a", "source_b").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    oracle = con.execute("""
        WITH p AS (
          SELECT DISTINCT source, md5(coalesce(text, '')) AS k FROM docs),
        t AS (SELECT source, CAST(count(*) AS BIGINT) AS total
              FROM p GROUP BY source),
        sh AS (
          SELECT a.source AS source_a, b.source AS source_b,
                 CAST(count(*) AS BIGINT) AS n_shared
          FROM p a JOIN p b ON a.k = b.k AND a.source < b.source
          GROUP BY 1, 2)
        SELECT source_a, source_b, n_shared,
               round(n_shared / ta.total, 6) AS frac_a,
               round(n_shared / tb.total, 6) AS frac_b
        FROM sh
        JOIN t ta ON ta.source = sh.source_a
        JOIN t tb ON tb.source = sh.source_b
        ORDER BY source_a, source_b
    """).df()
    for c in ["source_a", "source_b", "n_shared", "frac_a", "frac_b"]:
        assert got[c].tolist() == oracle[c].tolist(), c


def test_source_overlap_rejects_non_column_key(spark):
    from graphrole_spark.functions.text import source_overlap

    docs = spark.createDataFrame([(1, "a", "x")], "doc_id long, source string, text string")
    with pytest.raises(TypeError):
        source_overlap(docs, key="md5(text)")


def _retrieval_fixture(spark, seed=11):
    rng = random.Random(seed)
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
    return rows, qrows, docs, queries


def test_tfidf_search_duckdb_parity(spark):
    """Full-semantics DuckDB twin on randomized docs + queries (lnc
    tf-idf: (1+ln tf)·ln(N/df)/sqrt(dl), query tf ignored)."""
    from graphrole_spark.functions.terms import tfidf_search_topk

    rows, qrows, docs, queries = _retrieval_fixture(spark)
    got = (
        tfidf_search_topk(docs, queries, k=5)
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
        stats AS (SELECT count(*) AS n_docs FROM dl),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        qterms AS (
          SELECT DISTINCT query_id, tok AS term
          FROM (SELECT query_id,
                       list_filter(string_split_regex(trim(coalesce(text, '')), ' +'),
                                   x -> x <> '') AS toks
                FROM qs), unnest(toks) AS u(tok)),
        scored AS (
          SELECT query_id, tf.doc_id, count(*) AS n_matched,
                 round(sum((1 + ln(tf)) * ln(n_docs / df) / sqrt(dl.dl)), 6)
                   AS tfidf
          FROM tf
          JOIN qterms USING (term)
          JOIN dfreq USING (term)
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN stats
          GROUP BY query_id, tf.doc_id),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY tfidf DESC, doc_id) AS rank
          FROM scored)
        SELECT query_id, doc_id, n_matched, tfidf, rank FROM ranked
        WHERE rank <= 5 ORDER BY query_id, rank
    """).df()
    assert got["query_id"].tolist() == oracle["query_id"].tolist()
    assert got["doc_id"].tolist() == oracle["doc_id"].tolist()
    assert got["n_matched"].tolist() == oracle["n_matched"].tolist()
    pd.testing.assert_series_equal(
        got["tfidf"].astype(float), oracle["tfidf"].astype(float),
        check_exact=False, rtol=1e-9,
    )


def test_rrf_fuse_duckdb_parity(spark):
    from graphrole_spark.functions.terms import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 10, 1), (2, 13, 2)],
        "query_id long, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 14, 2), (2, 13, 1), (2, 10, 2), (2, 15, 3)],
        "query_id long, doc_id long, rank int",
    )
    got = rrf_fuse([a, b], k=60).orderBy("query_id", "rank").toPandas()
    con = duckdb.connect()
    con.register("a", a.toPandas())
    con.register("b", b.toPandas())
    oracle = con.execute("""
        WITH u AS (SELECT * FROM a UNION ALL SELECT * FROM b),
        f AS (
          SELECT query_id, doc_id, CAST(count(*) AS INT) AS n_lists,
                 round(sum(1.0 / (60 + rank)), 9) AS rrf
          FROM u GROUP BY query_id, doc_id)
        SELECT query_id, doc_id, n_lists, rrf,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY rrf DESC, doc_id) AS rank
        FROM f ORDER BY query_id, rank
    """).df()
    for c in ["query_id", "doc_id", "n_lists", "rank"]:
        assert got[c].tolist() == oracle[c].tolist(), c
    pd.testing.assert_series_equal(
        got["rrf"].astype(float), oracle["rrf"].astype(float),
        check_exact=False, rtol=1e-12,
    )
    # docs in both lists outrank single-list docs at comparable ranks
    q1 = got[got["query_id"] == 1]
    assert q1.iloc[0]["doc_id"] == 11 and q1.iloc[0]["n_lists"] == 2


def test_rrf_fuse_validation(spark):
    from graphrole_spark.functions.terms import rrf_fuse

    a = spark.createDataFrame([(1, 10, 1)], "query_id long, doc_id long, rank int")
    with pytest.raises(ValueError):
        rrf_fuse([a])
    with pytest.raises(ValueError):
        rrf_fuse([a, a], k=0)


def test_hybrid_topk_matches_manual_fusion(spark):
    from graphrole_spark.functions.terms import (
        bm25_topk,
        hybrid_topk,
        rrf_fuse,
        tfidf_search_topk,
    )

    _, _, docs, queries = _retrieval_fixture(spark, seed=23)
    got = hybrid_topk(docs, queries, k=5).orderBy("query_id", "rank").toPandas()
    manual = (
        rrf_fuse(
            [bm25_topk(docs, queries, k=5), tfidf_search_topk(docs, queries, k=5)],
            k=60,
            topn=5,
        )
        .orderBy("query_id", "rank")
        .toPandas()
    )
    assert got["doc_id"].tolist() == manual["doc_id"].tolist()
    assert got["rrf"].tolist() == manual["rrf"].tolist()
    assert (got["rank"] <= 5).all()
    assert (got["n_lists"] <= 2).all() and (got["n_lists"] >= 1).all()
