"""Tests for functions/linkage.py::fuzzy_match — DuckDB levenshtein
parity, blocking semantics, best-match determinism."""

import duckdb
import pandas as pd
import pytest


LEFT = [
    (1, "Acme Corp."),
    (2, "  globex   CORPORATION "),
    (3, "Initech"),
    (4, "Umbrella-Corp"),
    (5, "zzq unique name"),
]
RIGHT = [
    (10, "ACME Corp"),
    (11, "Acme Co"),
    (12, "Globex Corporation"),
    (13, "Initech LLC"),
    (14, "Umbrella Corp"),
]


def test_fuzzy_match_duckdb_parity(spark):
    from graphrole_spark.functions.linkage import fuzzy_match

    l = spark.createDataFrame(LEFT, "lid long, name string")
    r = spark.createDataFrame(RIGHT, "rid long, name string")
    got = (
        fuzzy_match(l, r, "lid", "rid", "name", "name",
                    min_similarity=0.6, block_chars=3)
        .orderBy("left_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("l", pd.DataFrame(LEFT, columns=["lid", "name"]))
    con.register("r", pd.DataFrame(RIGHT, columns=["rid", "name"]))
    # same normalization: lower, strip non-alnum-space, collapse ws
    norm = ("trim(regexp_replace(regexp_replace(lower({c}), "
            "'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))")
    oracle = con.execute(f"""
        WITH ln AS (SELECT lid, {norm.format(c='name')} AS t FROM l
                    WHERE length({norm.format(c='name')}) > 0),
        rn AS (SELECT rid, {norm.format(c='name')} AS t FROM r
               WHERE length({norm.format(c='name')}) > 0),
        cand AS (
          SELECT lid, rid,
                 round(1.0 - CAST(levenshtein(ln.t, rn.t) AS DOUBLE)
                       / greatest(length(ln.t), length(rn.t)), 9) AS s
          FROM ln JOIN rn ON substr(ln.t, 1, 3) = substr(rn.t, 1, 3)),
        best AS (
          SELECT *, row_number() OVER (PARTITION BY lid
                     ORDER BY s DESC, rid) AS rk
          FROM cand WHERE s >= 0.6)
        SELECT lid, rid, s FROM best WHERE rk = 1 ORDER BY lid
    """).df()
    assert got["left_id"].tolist() == oracle["lid"].tolist()
    assert got["right_id"].tolist() == oracle["rid"].tolist()
    assert got["similarity"].tolist() == pytest.approx(
        oracle["s"].tolist(), abs=1e-9
    )
    by = dict(zip(got["left_id"], got["right_id"]))
    # punctuation/case/whitespace noise all absorbed
    assert by[1] == 10   # Acme Corp. -> ACME Corp (exact after norm)
    assert by[2] == 12   # globex CORPORATION
    assert by[4] == 14   # Umbrella-Corp -> Umbrella Corp
    assert 5 not in by   # nothing shares its block
    row1 = got[got["left_id"] == 1].iloc[0]
    assert row1["similarity"] == 1.0


def test_fuzzy_match_blocking_and_caps(spark):
    from graphrole_spark.functions.linkage import fuzzy_match

    # identical names in different blocks never meet
    l = spark.createDataFrame([(1, "alpha beta")], "lid long, name string")
    r = spark.createDataFrame([(9, "zlpha beta")], "rid long, name string")
    assert fuzzy_match(l, r, "lid", "rid", "name", "name",
                       min_similarity=0.5).count() == 0
    # degenerate block dropped by max_block_size
    big_r = spark.createDataFrame(
        [(i, f"aaa common {i}") for i in range(20)], "rid long, name string"
    )
    big_l = spark.createDataFrame([(1, "aaa common 3")], "lid long, name string")
    assert fuzzy_match(
        big_l, big_r, "lid", "rid", "name", "name",
        min_similarity=0.9, max_block_size=10,
    ).count() == 0
    for bad in (dict(min_similarity=0.0), dict(block_chars=0),
                dict(max_block_size=0)):
        with pytest.raises(ValueError):
            fuzzy_match(big_l, big_r, "lid", "rid", "name", "name", **bad)
