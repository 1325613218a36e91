"""Tests for functions/jsonprof.py — DuckDB json_each parity (on a
quote-unambiguous fixture), malformed/missing accounting, the
documented string-number coercion limit, and typed flattening."""

import duckdb
import pandas as pd
import pytest


ROWS = [
    '{"tool": "search", "latency_ms": 12.5, "retries": 0, "ok": true}',
    '{"tool": "code", "latency_ms": 3, "args": {"q": "x"}, "tags": [1, 2]}',
    '{"tool": "search", "latency_ms": null, "retries": 2}',
    "not json at all",
    None,
    '{"tool": "fetch", "ok": false, "retries": 1}',
]


def test_json_profile_duckdb_parity(spark):
    from graphrole_spark.functions.jsonprof import json_profile

    df = spark.createDataFrame([(r,) for r in ROWS], "payload string")
    got = json_profile(df, "payload").toPandas()
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"payload": ROWS}))
    oracle = con.execute("""
        WITH ok AS (
          SELECT payload FROM t
          WHERE payload IS NOT NULL AND json_valid(payload)
            AND json_type(payload) = 'OBJECT'),
        kv AS (
          SELECT k.key,
                 CASE coalesce(json_type(ok.payload, '$.' || k.key), 'NULL')
                   WHEN 'OBJECT' THEN 'object'
                   WHEN 'ARRAY' THEN 'array'
                   WHEN 'BOOLEAN' THEN 'boolean'
                   WHEN 'UBIGINT' THEN 'bigint'
                   WHEN 'BIGINT' THEN 'bigint'
                   WHEN 'DOUBLE' THEN 'double'
                   WHEN 'NULL' THEN 'null'
                   ELSE 'string'
                 END AS value_type
          FROM ok, unnest(json_keys(ok.payload)) AS k(key)),
        agg AS (
          SELECT key, value_type, CAST(count(*) AS BIGINT) AS n
          FROM kv GROUP BY 1, 2),
        tot AS (SELECT key, sum(n) AS kt FROM agg GROUP BY key)
        SELECT agg.key, value_type, n,
               round(kt / 6.0, 6) AS key_rate,
               round(n / kt, 6) AS type_rate
        FROM agg JOIN tot ON agg.key = tot.key
        ORDER BY agg.key, n DESC, value_type
    """).df()
    good = got[~got["key"].isin(["(missing)", "(malformed)"])].reset_index(
        drop=True
    )
    for c in ["key", "value_type", "n"]:
        assert good[c].tolist() == oracle[c].tolist(), c
    assert good["key_rate"].tolist() == pytest.approx(
        oracle["key_rate"].tolist(), abs=1e-9
    )
    assert good["type_rate"].tolist() == pytest.approx(
        oracle["type_rate"].tolist(), abs=1e-9
    )
    # every row accounted for: 1 malformed, 1 missing
    acc = got.set_index("key")
    assert acc.loc["(malformed)", "n"] == 1
    assert acc.loc["(missing)", "n"] == 1
    # spot semantics: latency_ms is double twice, bigint once, null once
    lat = got[got["key"] == "latency_ms"].set_index("value_type")
    assert lat.loc["double", "n"] == 1  # 12.5
    assert lat.loc["bigint", "n"] == 1  # 3
    assert lat.loc["null", "n"] == 1


def test_json_profile_coercion_limit_documented(spark):
    """The documented from_json map limit: a STRING "1" classifies as
    bigint (quote info lost in the map coercion)."""
    from graphrole_spark.functions.jsonprof import json_profile

    df = spark.createDataFrame(
        [('{"v": "1"}',), ('{"v": 1}',)], "payload string"
    )
    got = json_profile(df, "payload").set_index("key") if False else (
        json_profile(df, "payload").toPandas()
    )
    v = got[got["key"] == "v"]
    assert v["value_type"].tolist() == ["bigint"]
    assert v["n"].tolist() == [2]
    with pytest.raises(ValueError):
        json_profile(df.where("payload is null"), "payload")


def test_json_flatten_typed(spark):
    from graphrole_spark.functions.jsonprof import json_flatten

    df = spark.createDataFrame(
        [(1, ROWS[0]), (2, ROWS[1]), (3, "broken"), (4, None)],
        "id long, payload string",
    )
    out = (
        json_flatten(
            df,
            "payload",
            {"tool": "string", "latency_ms": "double",
             "retries": "int", "args.q": "string"},
        )
        .orderBy("id")
        .toPandas()
    )
    assert out["tool"].tolist() == ["search", "code", None, None]
    assert out["latency_ms"].tolist()[:2] == [12.5, 3.0]
    assert out["args_q"].tolist() == [None, "x", None, None]
    assert out["retries"][0] == 0 and pd.isna(out["retries"][2])
    with pytest.raises(ValueError):
        json_flatten(df, "payload", {})
