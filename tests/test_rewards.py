"""GRPO-style group-relative advantage normalization
(graphrole_spark/functions/rewards.py)."""

import math
import random

import numpy as np
import pytest

from graphrole_spark.functions.rewards import group_advantages


def _samples(spark, rows):
    return spark.createDataFrame(
        rows, "group_id string, sample_id int, score double"
    )


def test_group_advantages_handcrafted(spark):
    rows = [
        ("p1", 0, 1.0),
        ("p1", 1, 3.0),
        ("p1", 2, 2.0),
        ("p2", 0, 5.0),   # singleton: std 0 -> advantage 0
        ("p3", 0, 4.0),
        ("p3", 1, 4.0),   # zero-variance pair -> advantage 0 for both
        ("p4", 0, None),  # unscored: NULL advantage/rank, is_best 0
        ("p4", 1, 7.0),
    ]
    out = {
        (r["group_id"], r["sample_id"]): r
        for r in group_advantages(
            _samples(spark, rows), "group_id", "score", order_col="sample_id"
        ).collect()
    }
    g1 = [1.0, 3.0, 2.0]
    mean, std = np.mean(g1), np.std(g1)  # population std
    for sid, sc in [(0, 1.0), (1, 3.0), (2, 2.0)]:
        r = out[("p1", sid)]
        assert r["group_n"] == 3
        assert r["group_mean"] == pytest.approx(mean, abs=1e-6)
        assert r["group_std"] == pytest.approx(std, abs=1e-6)
        assert r["advantage"] == pytest.approx(
            (sc - mean) / (std + 1e-4), abs=1e-6
        )
    assert [out[("p1", s)]["rank_in_group"] for s in (0, 1, 2)] == [3, 1, 2]
    assert [out[("p1", s)]["is_best"] for s in (0, 1, 2)] == [0, 1, 0]
    # singleton and zero-variance groups: advantage exactly 0, not NULL
    assert out[("p2", 0)]["advantage"] == 0.0
    assert out[("p2", 0)]["is_best"] == 1
    assert out[("p3", 0)]["advantage"] == 0.0
    assert out[("p3", 1)]["advantage"] == 0.0
    assert out[("p3", 0)]["rank_in_group"] == 1  # tie broken by sample_id
    assert out[("p3", 1)]["rank_in_group"] == 2
    # NULL score: excluded from moments, NULL advantage/rank, never best
    r = out[("p4", 0)]
    assert r["group_n"] == 1 and r["advantage"] is None
    assert r["rank_in_group"] is None and r["is_best"] == 0
    assert out[("p4", 1)]["is_best"] == 1


def test_group_advantages_rejects_bad_eps(spark):
    with pytest.raises(ValueError, match="eps"):
        group_advantages(_samples(spark, [("g", 0, 1.0)]), eps=0.0)


def test_group_advantages_duckdb_parity(spark):
    """Full value parity vs the same window SQL in DuckDB — the
    tail-entry stand-in for the driver oracle (registry window full)."""
    import duckdb
    import pandas as pd

    rng = random.Random(13)
    rows = []
    for g in range(60):
        for i in range(rng.randint(1, 8)):
            rows.append((
                f"g{g}", i,
                None if rng.random() < 0.1
                else round(rng.uniform(-2, 8), 3),
            ))
    spark_pdf = (
        group_advantages(
            _samples(spark, rows), "group_id", "score", order_col="sample_id"
        )
        .orderBy("group_id", "sample_id")
        .toPandas()
    )
    pdf = pd.DataFrame(rows, columns=["group_id", "sample_id", "score"])
    con = duckdb.connect()
    con.register("samples", pdf)
    oracle = con.execute("""
        WITH ranked AS (
          SELECT group_id, sample_id, score,
            count(score) OVER w AS group_n,
            avg(score) OVER w AS mean,
            coalesce(stddev_pop(score) OVER w, 0) AS std,
            CASE WHEN score IS NOT NULL THEN
              CAST(row_number() OVER (PARTITION BY group_id
                ORDER BY score DESC NULLS LAST, sample_id) AS INT)
            END AS rank_in_group
          FROM samples
          WINDOW w AS (PARTITION BY group_id))
        SELECT group_id, sample_id, score, group_n,
          round(mean, 6) AS group_mean,
          CASE WHEN group_n > 0 THEN round(std, 6) END AS group_std,
          CASE WHEN score IS NOT NULL
               THEN round((score - mean) / (std + 1e-4), 6) END AS advantage,
          rank_in_group,
          CASE WHEN rank_in_group = 1 THEN 1 ELSE 0 END AS is_best
        FROM ranked ORDER BY group_id, sample_id
    """).df()
    assert spark_pdf.columns.tolist() == oracle.columns.tolist()
    for col in spark_pdf.columns:
        a, b = spark_pdf[col], oracle[col]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert np.allclose(
                a.astype(float).fillna(math.nan),
                b.astype(float).fillna(math.nan),
                atol=1e-9, equal_nan=True,
            ), col
        elif a.dtype.kind == "O":
            assert a.tolist() == b.tolist(), col
        else:
            assert a.fillna(-1).astype(int).tolist() == \
                b.fillna(-1).astype(int).tolist(), col


def test_group_advantages_plan_shape(spark):
    df = _samples(spark, [("g", 0, 1.0)])
    plan = (
        group_advantages(df, "group_id", "score", order_col="sample_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan[:4000]
    assert "Join" not in plan and "Python" not in plan


# --------------------------------------------------------------------------
# bt_leaderboard (Bradley-Terry MM fit)
# --------------------------------------------------------------------------

def _bt_oracle(battles, n_iter=30, reg=0.1):
    """Independent MM implementation (plain dicts, same sweep order)."""
    items = sorted({w for w, _ in battles} | {l for _, l in battles})
    n_ij = {}
    wins = {i: 0 for i in items}
    for w, l in battles:
        wins[w] += 1
        n_ij[(w, l)] = n_ij.get((w, l), 0) + 1
        n_ij[(l, w)] = n_ij.get((l, w), 0) + 1
    pi = {i: 1.0 for i in items}
    for _ in range(n_iter):
        pi = {
            i: (wins[i] + reg)
            / (
                sum(
                    n / (pi[i] + pi[j])
                    for (a, j), n in n_ij.items()
                    if a == i
                )
                + 2 * reg / (pi[i] + 1)
            )
            for i in items
        }
    return pi, wins


def _battles_df(spark, battles):
    return spark.createDataFrame(battles, schema="winner string, loser string")


def test_bt_leaderboard_python_mm_parity(spark):
    from graphrole_spark.functions.rewards import bt_leaderboard

    rng = random.Random(13)
    items = [f"m{i}" for i in range(8)]
    true = {m: 1.5 ** i for i, m in enumerate(items)}
    battles = []
    for _ in range(600):
        a, b = rng.sample(items, 2)
        p_a = true[a] / (true[a] + true[b])
        battles.append((a, b) if rng.random() < p_a else (b, a))
    got = {
        r["item"]: (r["strength"], r["n_wins"], r["n_losses"])
        for r in bt_leaderboard(
            _battles_df(spark, battles), n_iter=20, reg=0.1
        ).collect()
    }
    pi, wins = _bt_oracle(battles, n_iter=20, reg=0.1)
    assert set(got) == set(pi)
    for i in pi:
        assert got[i][0] == pytest.approx(pi[i], rel=1e-9), i
        assert got[i][1] == wins[i]
    # strong items rank above weak ones (true strengths are geometric)
    order = [
        r["item"]
        for r in bt_leaderboard(
            _battles_df(spark, battles), n_iter=20, reg=0.1
        ).collect()
    ]
    assert order.index("m7") < order.index("m2") < order.index("m0")


def test_bt_leaderboard_undefeated_and_winless_stay_finite(spark):
    from graphrole_spark.functions.rewards import bt_leaderboard

    battles = [("champ", "mid", )] * 10 + [("mid", "basement")] * 10
    out = {
        r["item"]: r
        for r in bt_leaderboard(_battles_df(spark, battles), n_iter=40).collect()
    }
    assert math.isfinite(out["champ"]["rating"])
    assert math.isfinite(out["basement"]["rating"])
    assert (
        out["champ"]["rating"] > out["mid"]["rating"] > out["basement"]["rating"]
    )
    assert out["champ"]["n_battles"] == 10
    assert out["mid"]["n_wins"] == 10 and out["mid"]["n_losses"] == 10


def test_bt_leaderboard_symmetric_battles_tie(spark):
    from graphrole_spark.functions.rewards import bt_leaderboard

    battles = [("a", "b")] * 5 + [("b", "a")] * 5
    out = {r["item"]: r for r in
           bt_leaderboard(_battles_df(spark, battles)).collect()}
    assert out["a"]["strength"] == pytest.approx(out["b"]["strength"])
    assert out["a"]["rating"] == pytest.approx(1000.0)


def test_bt_leaderboard_drops_null_and_self_battles(spark):
    from graphrole_spark.functions.rewards import bt_leaderboard

    battles = [("a", "b"), ("a", None), (None, "b"), ("a", "a"), ("a", "b")]
    out = {r["item"]: r for r in
           bt_leaderboard(_battles_df(spark, battles)).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["n_wins"] == 2 and out["b"]["n_losses"] == 2


def test_bt_leaderboard_rejects_bad_reg(spark):
    from graphrole_spark.functions.rewards import bt_leaderboard

    with pytest.raises(ValueError):
        bt_leaderboard(_battles_df(spark, [("a", "b")]), reg=0.0)
    with pytest.raises(ValueError):
        bt_leaderboard(_battles_df(spark, [("a", "b")]), mode="nope")


def test_bt_leaderboard_driver_vs_distributed_parity(spark):
    """The two physical paths run the same Jacobi sweep — identical
    strengths to float tolerance on the same battles."""
    from graphrole_spark.functions.rewards import bt_leaderboard

    rng = random.Random(29)
    items = [f"m{i}" for i in range(6)]
    battles = []
    for _ in range(200):
        a, b = rng.sample(items, 2)
        battles.append((a, b) if rng.random() < 0.6 else (b, a))
    df = _battles_df(spark, battles)
    drv = {
        r["item"]: r["strength"]
        for r in bt_leaderboard(df, n_iter=6, mode="driver").collect()
    }
    dist = {
        r["item"]: r["strength"]
        for r in bt_leaderboard(df, n_iter=6, mode="distributed").collect()
    }
    assert set(drv) == set(dist)
    for i in drv:
        assert drv[i] == pytest.approx(dist[i], rel=1e-12), i
