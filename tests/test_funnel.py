"""Tests for temporal/funnel.py — ordered-step funnel conversion
(DuckDB chained-running-min parity, semantics goldens, plan shape)."""

import datetime as dt
import random

import duckdb
import pandas as pd
import pytest


def _events_pdf(seed=13, n_users=40):
    rng = random.Random(seed)
    base = dt.datetime(2024, 3, 1)
    rows = []
    for u in range(n_users):
        t = 0
        for _ in range(rng.randint(1, 12)):
            t += rng.randint(10, 3600)
            rows.append(
                (u, base + dt.timedelta(seconds=t),
                 rng.choice(["view", "cart", "buy", "other"]))
            )
    return pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])


ORACLE = """
    WITH s1 AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN epoch(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS m1
      FROM t),
    s2 AS (
      SELECT *, min(CASE WHEN event_type = 'cart' AND m1 IS NOT NULL
                         THEN epoch(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS m2
      FROM s1),
    s3 AS (
      SELECT *, min(CASE WHEN event_type = 'buy' AND m2 IS NOT NULL
                         THEN epoch(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS m3
      FROM s2)
    SELECT user_id, min(m1) AS t1, min(m2) AS t2, min(m3) AS t3,
           CAST(CASE WHEN min(m1) IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN min(m2) IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN min(m3) IS NOT NULL THEN 1 ELSE 0 END AS INT)
             AS steps_completed
    FROM s3 GROUP BY user_id
    HAVING min(m1) IS NOT NULL
    ORDER BY user_id
"""


def test_funnel_duckdb_parity(spark):
    from graphrole_spark.temporal.funnel import funnel

    pdf = _events_pdf()
    df = spark.createDataFrame(pdf)
    got = (
        funnel(df, ["user_id"], "ts", "event_type", ["view", "cart", "buy"])
        .orderBy("user_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    oracle = con.execute(ORACLE).df()
    assert got["user_id"].tolist() == oracle["user_id"].tolist()
    assert got["steps_completed"].tolist() == oracle["steps_completed"].tolist()
    for i in (1, 2, 3):
        g = [None if pd.isna(x) else x.timestamp() for x in got[f"t_{i}"]]
        o = [None if pd.isna(x) else float(x) for x in oracle[f"t{i}"]]
        assert g == o, f"step {i}"


def test_funnel_semantics_golden(spark):
    from graphrole_spark.temporal.funnel import funnel

    b = dt.datetime(2024, 1, 1)
    sec = lambda s: b + dt.timedelta(seconds=s)
    rows = [
        # u1 completes in order
        (1, sec(0), "view"), (1, sec(10), "cart"), (1, sec(20), "buy"),
        # u2: cart BEFORE view never counts; later cart does
        (2, sec(0), "cart"), (2, sec(5), "view"), (2, sec(9), "cart"),
        # u3: buy before cart -> only 2 steps
        (3, sec(0), "view"), (3, sec(1), "buy"), (3, sec(2), "cart"),
        # u4 never views -> excluded entirely
        (4, sec(0), "cart"), (4, sec(1), "buy"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = (
        funnel(df, ["user_id"], "ts", "event_type", ["view", "cart", "buy"])
        .orderBy("user_id")
        .toPandas()
    )
    assert got["user_id"].tolist() == [1, 2, 3]
    assert got["steps_completed"].tolist() == [3, 2, 2]
    assert got.loc[1, "t_2"].timestamp() == sec(9).timestamp()
    assert pd.isna(got.loc[2, "t_3"])  # u3's buy precedes its cart


def test_funnel_within_window(spark):
    from graphrole_spark.temporal.funnel import funnel

    b = dt.datetime(2024, 1, 1)
    sec = lambda s: b + dt.timedelta(seconds=s)
    rows = [
        (1, sec(0), "view"), (1, sec(100), "cart"),
        (2, sec(0), "view"), (2, sec(5000), "cart"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = (
        funnel(df, ["user_id"], "ts", "event_type", ["view", "cart"],
               within_seconds=600)
        .orderBy("user_id")
        .toPandas()
    )
    assert got["steps_completed"].tolist() == [2, 1]  # u2's cart too late
    with pytest.raises(ValueError):
        funnel(df, ["user_id"], "ts", "event_type", ["view"])
    with pytest.raises(ValueError):
        funnel(df, ["user_id"], "ts", "event_type", ["view", "view"])
    with pytest.raises(ValueError):
        funnel(df, ["user_id"], "ts", "event_type", ["view", "cart"],
               within_seconds=0)


def test_funnel_summary_matches_per_key_frame(spark):
    from graphrole_spark.temporal.funnel import funnel, funnel_summary

    pdf = _events_pdf(seed=29)
    df = spark.createDataFrame(pdf)
    steps = ["view", "cart", "buy"]
    per_key = funnel(df, ["user_id"], "ts", "event_type", steps).toPandas()
    summ = (
        funnel_summary(df, ["user_id"], "ts", "event_type", steps)
        .orderBy("step_idx")
        .toPandas()
    )
    n1 = per_key["t_1"].notna().sum()
    n2 = per_key["t_2"].notna().sum()
    n3 = per_key["t_3"].notna().sum()
    assert summ["n_keys"].tolist() == [n1, n2, n3]
    assert summ["frac_of_step1"].tolist() == pytest.approx(
        [1.0, n2 / n1, n3 / n1], abs=1e-6
    )
    assert pd.isna(summ.loc[0, "frac_of_prev"])
    assert summ.loc[1, "frac_of_prev"] == pytest.approx(n2 / n1, abs=1e-6)
    # median seconds from step1: recompute in pandas
    d2 = (per_key["t_2"] - per_key["t_1"]).dt.total_seconds().dropna()
    assert summ.loc[1, "median_seconds_from_step1"] == pytest.approx(
        d2.median(), abs=1e-3
    )
    assert summ.loc[0, "median_seconds_from_step1"] == 0.0


def test_funnel_one_exchange(spark):
    """k chained running-min windows + the final groupBy all reuse one
    hash partitioning on the key: exactly one exchange, no joins."""
    from graphrole_spark.temporal.funnel import funnel

    df = spark.createDataFrame(_events_pdf())
    plan = (
        funnel(df, ["user_id"], "ts", "event_type", ["view", "cart", "buy"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "Join" not in plan
