"""Tests for functions/expectations.py::expect — declarative data-
quality checks (full DuckDB value parity + plan-shape guarantees)."""

import duckdb
import pandas as pd
import pytest


def _table(spark):
    rows = [
        (1, "en", 10, "hello world", 1),
        (2, "de", -5, "guten tag", 2),
        (3, None, 250, "bonjour", 2),
        (4, "xx", 30, None, 9),
        (4, "en", 40, "dup id", 1),
        (5, "fr", None, "12345", 3),
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "lang", "n_chars", "text", "src_id"]
    )
    return pdf, spark.createDataFrame(pdf)


def _dims(spark):
    pdf = pd.DataFrame({"source_id": [1, 2, 3]})
    return pdf, spark.createDataFrame(pdf)


def test_expect_duckdb_parity(spark):
    from graphrole_spark.functions.expectations import expect

    pdf, t = _table(spark)
    refpdf, ref = _dims(spark)
    checks = [
        {"check": "not_null", "column": "lang"},
        {"check": "in_set", "column": "lang", "values": ["en", "de", "fr"]},
        {"check": "in_range", "column": "n_chars", "min": 0, "max": 200},
        {"check": "matches", "column": "text", "pattern": "^[a-z ]+$"},
        {"check": "unique", "columns": ["doc_id"]},
        {"check": "row_count", "min": 2, "max": 100},
        {"check": "fk", "column": "src_id", "ref": ref,
         "ref_column": "source_id"},
    ]
    got = expect(t, checks).toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    con.register("ref", refpdf)
    oracle = con.execute("""
        WITH n AS (SELECT count(*) AS n_rows FROM t)
        SELECT 0 AS check_id, sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS v FROM t
        UNION ALL
        SELECT 1, sum(CASE WHEN lang IS NOT NULL AND lang NOT IN ('en','de','fr') THEN 1 ELSE 0 END) FROM t
        UNION ALL
        SELECT 2, sum(CASE WHEN n_chars IS NOT NULL AND (n_chars < 0 OR n_chars > 200) THEN 1 ELSE 0 END) FROM t
        UNION ALL
        SELECT 3, sum(CASE WHEN text IS NOT NULL AND NOT regexp_matches(text, '^[a-z ]+$') THEN 1 ELSE 0 END) FROM t
        UNION ALL
        SELECT 4, (SELECT n_rows FROM n) - count(DISTINCT doc_id) FROM t
        UNION ALL
        SELECT 5, greatest(2 - (SELECT n_rows FROM n), 0)
                  + greatest((SELECT n_rows FROM n) - 100, 0)
        UNION ALL
        SELECT 6, (SELECT count(*) FROM t
                   WHERE src_id IS NOT NULL
                     AND src_id NOT IN (SELECT source_id FROM ref))
        ORDER BY check_id
    """).df()
    assert got["check_id"].tolist() == oracle["check_id"].tolist()
    assert got["n_violations"].tolist() == [
        int(x) for x in oracle["v"].tolist()
    ]
    assert got["n_rows"].tolist() == [6] * 7
    assert got["passed"].tolist() == [
        1 if v == 0 else 0 for v in got["n_violations"]
    ]
    # spot-check the known counts
    by = dict(zip(got["check_id"], got["n_violations"]))
    assert by[0] == 1          # one NULL lang
    assert by[1] == 1          # 'xx'
    assert by[2] == 2          # -5 and 250
    assert by[3] == 1          # '12345' (non-letters); 'dup id' matches
    assert by[4] == 1          # doc_id 4 twice
    assert by[5] == 0
    assert by[6] == 1          # src_id 9


def test_expect_unique_null_safe_keys(spark):
    """Rows whose uniqueness key contains NULL components are compared
    null-safely (SELECT DISTINCT semantics): 3 distinct (id, lang)
    tuples with 2 NULL langs -> 0 violations, while two identical
    NULL-bearing tuples DO collide."""
    import duckdb

    from graphrole_spark.functions.expectations import expect

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 3],
            "lang": [None, None, "en", None],
        }
    )
    t = spark.createDataFrame(pdf)
    got = expect(
        t, [{"check": "unique", "columns": ["doc_id", "lang"]}]
    ).toPandas()
    # 4 rows, 4 distinct null-safe tuples: (1,N) (2,N) (3,en) (3,N)
    assert got["n_violations"].tolist() == [0]
    assert got["passed"].tolist() == [1]

    # two identical NULL-bearing tuples collide
    pdf2 = pd.DataFrame({"doc_id": [1, 1, 2], "lang": [None, None, "en"]})
    got2 = expect(
        spark.createDataFrame(pdf2),
        [{"check": "unique", "columns": ["doc_id", "lang"]}],
    ).toPandas()
    assert got2["n_violations"].tolist() == [1]

    # DuckDB twin: n_rows - count of SELECT DISTINCT rows
    con = duckdb.connect()
    con.register("t", pdf)
    con.register("t2", pdf2)
    for name, frame in (("t", got), ("t2", got2)):
        v = con.execute(
            f"SELECT (SELECT count(*) FROM {name}) - "
            f"(SELECT count(*) FROM (SELECT DISTINCT doc_id, lang FROM {name}))"
        ).fetchone()[0]
        assert frame["n_violations"].tolist() == [int(v)]


def test_expect_single_scan_for_row_checks(spark):
    """All row-level + unique checks compile into ONE aggregate over
    one scan of the table — adding checks must not add passes."""
    from graphrole_spark.functions.expectations import expect

    _, t = _table(spark)
    checks = [
        {"check": "not_null", "column": "lang"},
        {"check": "in_range", "column": "n_chars", "min": 0},
        {"check": "unique", "columns": ["doc_id", "lang"]},
        {"check": "row_count", "min": 1},
    ]
    plan = expect(t, checks)._jdf.queryExecution().optimizedPlan().toString()
    # one aggregate over one scan of the audited table feeds every
    # non-fk check (inline explode, not a union of per-check selects)
    assert plan.count("Aggregate") == 1
    assert plan.count("LocalRelation") == 1


def test_expect_validation_and_empty_table(spark):
    from graphrole_spark.functions.expectations import expect

    _, t = _table(spark)
    with pytest.raises(ValueError):
        expect(t, [])
    with pytest.raises(ValueError):
        expect(t, [{"check": "nope", "column": "lang"}])
    with pytest.raises(ValueError):
        expect(t, [{"check": "in_set", "column": "lang", "values": []}])
    with pytest.raises(ValueError):
        expect(t, [{"check": "in_range", "column": "n_chars"}])

    empty = t.where("doc_id < 0")
    got = expect(
        empty,
        [
            {"check": "not_null", "column": "lang"},
            {"check": "unique", "columns": ["doc_id"]},
            {"check": "row_count", "min": 1},
        ],
    ).toPandas()
    assert got["n_rows"].tolist() == [0, 0, 0]
    # empty table: no row violations, but row_count min=1 fails by 1
    assert got["n_violations"].tolist() == [0, 0, 1]
    assert got["passed"].tolist() == [1, 1, 0]


def test_k_anonymity_duckdb_parity(spark):
    from graphrole_spark.functions.expectations import k_anonymity

    rows = [
        ("us", "1980", "m"), ("us", "1980", "m"), ("us", "1980", "m"),
        ("us", "1985", "f"), ("us", "1985", "f"),
        ("de", "1990", None), ("de", None, None),
    ]
    pdf = pd.DataFrame(rows, columns=["country", "yob", "gender"])
    df = spark.createDataFrame(pdf)
    got = k_anonymity(df, ["country", "yob", "gender"], k=3).toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    oracle = con.execute("""
        SELECT country, yob, gender,
               CAST(count(*) AS BIGINT) AS class_size,
               CAST(count(*) < 3 AS INT) AS violates
        FROM t GROUP BY 1, 2, 3
        ORDER BY class_size, country, yob, gender
    """).df()
    for c in ["class_size", "violates"]:
        assert got[c].tolist() == oracle[c].tolist(), c
    # the two singletons + the pair violate at k=3; the triple passes
    assert got["violates"].tolist() == [1, 1, 1, 0]
    for bad in (([], 3), (["country"], 1)):
        with pytest.raises(ValueError):
            k_anonymity(df, bad[0], k=bad[1])


def test_expect_finite_check(spark):
    from graphrole_spark.functions.expectations import expect

    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (float("inf",),), (float("-inf"),),
         (None,), (2.5,)],
        "x double",
    )
    got = expect(df, [{"check": "finite", "column": "x"}]).toPandas()
    assert got["n_violations"].tolist() == [3]  # nan, inf, -inf
    assert got["passed"].tolist() == [0]
    # still rides the single-aggregate plan
    plan = expect(
        df,
        [{"check": "finite", "column": "x"},
         {"check": "not_null", "column": "x"}],
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1
