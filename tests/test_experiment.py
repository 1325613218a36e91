"""Tests for functions/experiment.py — A/B z-test + CUPED, and
Kaplan-Meier survival (DuckDB / python-oracle parity + properties)."""

import math
import random

import duckdb
import pandas as pd
import pytest


def _ab_pdf(seed=31, n=600):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        v = rng.choice(["control", "treat_a", "treat_b"])
        x = rng.gauss(50, 10)  # pre-period metric
        lift = {"control": 0.0, "treat_a": 2.5, "treat_b": 0.3}[v]
        y = 0.8 * x + rng.gauss(0, 4) + lift
        rows.append((i, v, round(y, 6), round(x, 6)))
    return pd.DataFrame(rows, columns=["uid", "variant", "metric", "pre"])


def test_ab_test_duckdb_parity_plain(spark):
    from graphrole_spark.functions.experiment import ab_test

    pdf = _ab_pdf()
    df = spark.createDataFrame(pdf)
    got = ab_test(df, "variant", "metric", control="control").toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    oracle = con.execute("""
        WITH s AS (
          SELECT variant, CAST(count(*) AS BIGINT) AS n,
                 avg(metric) AS m, var_samp(metric) AS v
          FROM t WHERE metric IS NOT NULL GROUP BY variant),
        c AS (SELECT n AS nc, m AS mc, v AS vc FROM s
              WHERE variant = 'control')
        SELECT variant, n, round(m, 9) AS mean, nc AS n_control,
               round(mc, 9) AS mean_control,
               round(m - mc, 9) AS effect,
               round((m - mc) / abs(mc), 9) AS rel_effect,
               round(sqrt(v / n + vc / nc), 9) AS se,
               round((m - mc) / sqrt(v / n + vc / nc), 6) AS z
        FROM s CROSS JOIN c WHERE variant <> 'control'
        ORDER BY variant
    """).df()
    for c in ["variant", "n", "n_control"]:
        assert got[c].tolist() == oracle[c].tolist(), c
    for c in ["mean", "mean_control", "effect", "rel_effect", "se", "z"]:
        assert got[c].tolist() == pytest.approx(
            oracle[c].tolist(), abs=1e-6
        ), c
    assert got["significant"].tolist() == [
        int(abs(z) > 1.96) for z in got["z"]
    ]
    # treat_a carries a real lift; treat_b's 0.3 is noise at n=600
    ga = got.set_index("variant")
    assert ga.loc["treat_a", "significant"] == 1


def test_ab_test_cuped_reduces_se_and_matches_python(spark):
    from graphrole_spark.functions.experiment import ab_test

    pdf = _ab_pdf(seed=43)
    df = spark.createDataFrame(pdf)
    plain = ab_test(df, "variant", "metric", control="control").toPandas()
    cuped = ab_test(
        df, "variant", "metric", control="control", pre_metric_col="pre"
    ).toPandas()
    # the pre-period explains ~0.8x of the metric: CUPED must shrink
    # every SE substantially
    for v in ["treat_a", "treat_b"]:
        se_p = plain.set_index("variant").loc[v, "se"]
        se_c = cuped.set_index("variant").loc[v, "se"]
        assert se_c < 0.7 * se_p, (v, se_p, se_c)
    # python oracle for the adjusted means (pooled theta)
    x, y = pdf["pre"], pdf["metric"]
    theta = x.cov(y) / x.var()
    adj = y - theta * (x - x.mean())
    for v in ["treat_a", "treat_b"]:
        want = adj[pdf["variant"] == v].mean()
        assert cuped.set_index("variant").loc[v, "mean"] == pytest.approx(
            want, abs=1e-6
        )


def _km_python(rows):
    """Hand-rolled product-limit estimator over (duration, event)."""
    from collections import defaultdict

    d = defaultdict(lambda: [0, 0])
    for t, e in rows:
        d[t][0 if e else 1] += 1
    out, s, at_risk = [], 1.0, len(rows)
    for t in sorted(d):
        ev, ce = d[t]
        if ev > 0:
            s *= 1.0 - ev / at_risk
        out.append((t, at_risk, ev, ce, s))
        at_risk -= ev + ce
    return out


def test_ab_test_missing_control_raises(spark):
    """A typo'd/absent control must be a loud ValueError, not a
    silently empty result."""
    from graphrole_spark.functions.experiment import ab_test

    df = spark.createDataFrame(_ab_pdf())
    with pytest.raises(ValueError, match="controll"):
        ab_test(df, "variant", "metric", control="controll")
    # a control present in the data but with only NULL metrics is
    # equally absent from the stats frame
    df2 = spark.createDataFrame(
        pd.DataFrame(
            {
                "variant": ["control", "treat_a", "treat_a"],
                "metric": [None, 1.0, 2.0],
            }
        )
    )
    with pytest.raises(ValueError, match="control"):
        ab_test(df2, "variant", "metric", control="control")


def test_kaplan_meier_python_parity(spark):
    from graphrole_spark.functions.experiment import kaplan_meier

    rng = random.Random(11)
    rows = [
        (round(rng.expovariate(0.1), 2), rng.random() < 0.7)
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(t, int(e)) for t, e in rows], "duration double, event int"
    )
    got = kaplan_meier(df, "duration", "event").orderBy("duration").toPandas()
    want = _km_python(rows)
    assert got["duration"].tolist() == pytest.approx([w[0] for w in want])
    assert got["n_risk"].tolist() == [w[1] for w in want]
    assert got["n_events"].tolist() == [w[2] for w in want]
    assert got["n_censored"].tolist() == [w[3] for w in want]
    assert got["survival"].tolist() == pytest.approx(
        [w[4] for w in want], abs=1e-8
    )
    # survival is monotone non-increasing
    assert (got["survival"].diff().dropna() <= 1e-12).all()


def test_kaplan_meier_grouped_zero_and_censoring(spark):
    from graphrole_spark.functions.experiment import kaplan_meier

    rows = [
        # group g1: everyone dies -> survival reaches exact 0.0
        ("g1", 1.0, 1), ("g1", 2.0, 1), ("g1", 2.0, 1),
        # group g2: censored-only time at t=1.5 leaves S unchanged
        ("g2", 1.0, 1), ("g2", 1.5, 0), ("g2", 3.0, 1), ("g2", 4.0, 0),
    ]
    df = spark.createDataFrame(rows, "grp string, duration double, event int")
    got = (
        kaplan_meier(df, "duration", "event", group_cols=["grp"])
        .orderBy("grp", "duration")
        .toPandas()
    )
    g1 = got[got["grp"] == "g1"]
    assert g1["survival"].tolist() == pytest.approx([2 / 3, 0.0], abs=1e-9)
    g2 = got[got["grp"] == "g2"].reset_index(drop=True)
    # t=1.0: S=3/4; t=1.5 censored-only: unchanged; t=3.0: 3/4 * 1/2
    assert g2["survival"].tolist() == pytest.approx(
        [0.75, 0.75, 0.375, 0.375], abs=1e-9
    )
    assert g2["n_risk"].tolist() == [4, 3, 2, 1]
