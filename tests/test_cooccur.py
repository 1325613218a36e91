"""Tests for functions/cooccur.py — DuckDB parity for edges and PMI,
cap/guard semantics."""

import math
import random

import duckdb
import pandas as pd
import pytest


def _baskets(seed=5, n_ctx=120):
    rng = random.Random(seed)
    items = [f"i{k}" for k in range(15)]
    rows = []
    for c in range(n_ctx):
        for it in rng.sample(items, rng.randint(1, 6)):
            # duplicates within a context must not double-count
            for _ in range(rng.randint(1, 2)):
                rows.append((c, it))
    return pd.DataFrame(rows, columns=["ctx", "item"])


def test_cooccurrence_edges_duckdb_parity(spark):
    from graphrole_spark.functions.cooccur import cooccurrence_edges

    pdf = _baskets()
    df = spark.createDataFrame(pdf)
    got = (
        cooccurrence_edges(df, ["ctx"], "item", min_count=2)
        .orderBy("src", "dst")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    oracle = con.execute("""
        WITH d AS (SELECT DISTINCT ctx, item FROM t),
        p AS (
          SELECT a.item AS src, b.item AS dst,
                 CAST(count(*) AS BIGINT) AS weight
          FROM d a JOIN d b ON a.ctx = b.ctx AND a.item < b.item
          GROUP BY 1, 2)
        SELECT * FROM p WHERE weight >= 2 ORDER BY src, dst
    """).df()
    for c in ["src", "dst", "weight"]:
        assert got[c].tolist() == oracle[c].tolist(), c
    assert len(got) > 5


def test_pmi_duckdb_parity_and_ppmi(spark):
    from graphrole_spark.functions.cooccur import pmi_scores

    pdf = _baskets(seed=11)
    df = spark.createDataFrame(pdf)
    got = (
        pmi_scores(df, ["ctx"], "item", positive=False)
        .orderBy("src", "dst")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    oracle = con.execute("""
        WITH d AS (SELECT DISTINCT ctx, item FROM t),
        n AS (SELECT CAST(count(DISTINCT ctx) AS DOUBLE) AS n_ctx FROM d),
        ic AS (SELECT item, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1),
        p AS (
          SELECT a.item AS src, b.item AS dst,
                 CAST(count(*) AS BIGINT) AS weight
          FROM d a JOIN d b ON a.ctx = b.ctx AND a.item < b.item
          GROUP BY 1, 2)
        SELECT p.src, p.dst, p.weight,
               round(ln(p.weight * n.n_ctx / (ca.c * cb.c)), 9) AS pmi
        FROM p
        JOIN ic ca ON ca.item = p.src
        JOIN ic cb ON cb.item = p.dst
        CROSS JOIN n
        ORDER BY p.src, p.dst
    """).df()
    for c in ["src", "dst", "weight"]:
        assert got[c].tolist() == oracle[c].tolist(), c
    assert got["pmi"].tolist() == pytest.approx(
        oracle["pmi"].tolist(), abs=1e-8
    )
    # PPMI clips at zero and changes nothing else
    pp = (
        pmi_scores(df, ["ctx"], "item", positive=True)
        .orderBy("src", "dst")
        .toPandas()
    )
    assert pp["pmi"].tolist() == pytest.approx(
        [max(x, 0.0) for x in got["pmi"]], abs=1e-9
    )
    assert (got["pmi"] < 0).any()  # the clip is real on this fixture


def test_cooccur_cap_and_validation(spark):
    from graphrole_spark.functions.cooccur import cooccurrence_edges

    rows = [(1, f"i{k}") for k in range(10)] + [(2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "ctx long, item string")
    # cap 5 drops context 1 entirely; only (a, b) from context 2 remains
    got = cooccurrence_edges(
        df, ["ctx"], "item", max_items_per_context=5
    ).toPandas()
    assert got[["src", "dst"]].values.tolist() == [["a", "b"]]
    for bad in (dict(min_count=0), dict(max_items_per_context=1)):
        with pytest.raises(ValueError):
            cooccurrence_edges(df, ["ctx"], "item", **bad)
