"""Tests for functions/calibration.py — Platt Newton fit vs a python
replica, PAV isotonic vs a hand-rolled oracle, apply-path exactness,
and the improves-ECE property."""

import math
import random

import pandas as pd
import pytest


def _miscalibrated(seed=7, n=3000):
    """Scores rank well but probabilities are squashed: p_true follows
    sigmoid(4s-2) while the score itself is in [0,1]."""
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        s = round(rng.random(), 2)  # 2-dp: bounded distinct scores
        p = 1.0 / (1.0 + math.exp(-(4.0 * s - 2.0)))
        rows.append((s, int(rng.random() < p)))
    return rows


def _platt_python(rows, n_iter=25, smooth=True):
    n_pos = sum(y for _, y in rows)
    n_neg = len(rows) - n_pos
    tp = (n_pos + 1.0) / (n_pos + 2.0) if smooth else 1.0
    tn = 1.0 / (n_neg + 2.0) if smooth else 0.0
    a, b = 0.0, math.log((n_neg + 1.0) / (n_pos + 1.0))
    for _ in range(n_iter):
        ga = gb = haa = hab = hbb = 0.0
        for s, y in rows:
            z = a * s + b
            p = 1.0 / (1.0 + math.exp(-z))
            t = tp if y else tn
            w = p * (1 - p) + 1e-12
            ga += (p - t) * s
            gb += p - t
            haa += w * s * s
            hab += w * s
            hbb += w
        det = haa * hbb - hab * hab
        if abs(det) < 1e-18:
            break
        da = (hbb * ga - hab * gb) / det
        db = (haa * gb - hab * ga) / det
        a, b = a - da, b - db
        if abs(da) < 1e-12 and abs(db) < 1e-12:
            break
    return a, b


def _pav_python(rows):
    from collections import defaultdict

    agg = defaultdict(lambda: [0.0, 0.0])
    for s, y in rows:
        agg[s][0] += 1
        agg[s][1] += y
    blocks = []
    for s in sorted(agg):
        blocks.append([s, agg[s][0], agg[s][1]])
        while len(blocks) >= 2 and (
            blocks[-2][2] / blocks[-2][1] >= blocks[-1][2] / blocks[-1][1]
        ):
            top = blocks.pop()
            blocks[-1][1] += top[1]
            blocks[-1][2] += top[2]
    return [(b[0], b[2] / b[1]) for b in blocks]


def _ece(pairs, bins=10):
    tot = len(pairs)
    err = 0.0
    for i in range(bins):
        lo, hi = i / bins, (i + 1) / bins
        sel = [(p, y) for p, y in pairs
               if (p >= lo and (p < hi or (i == bins - 1 and p <= hi)))]
        if sel:
            conf = sum(p for p, _ in sel) / len(sel)
            acc = sum(y for _, y in sel) / len(sel)
            err += len(sel) / tot * abs(conf - acc)
    return err


def test_platt_matches_python_newton(spark):
    from graphrole_spark.functions.calibration import platt_apply, platt_fit

    rows = _miscalibrated()
    df = spark.createDataFrame(rows, "score double, label int")
    a, b = platt_fit(df)
    aw, bw = _platt_python(rows)
    assert a == pytest.approx(aw, rel=1e-6)
    assert b == pytest.approx(bw, rel=1e-6)
    # recover roughly the generating sigmoid (4, -2); smoothing and
    # sampling noise allow slack
    assert a == pytest.approx(4.0, abs=0.8)
    assert b == pytest.approx(-2.0, abs=0.5)
    out = platt_apply(df, a, b).toPandas()
    want = 1.0 / (1.0 + math.exp(-(a * rows[0][0] + b)))
    assert out["calibrated"][0] == pytest.approx(want, abs=1e-8)


def test_isotonic_matches_python_pav_and_is_monotone(spark):
    from graphrole_spark.functions.calibration import (
        isotonic_apply,
        isotonic_fit,
    )

    rows = _miscalibrated(seed=13)
    df = spark.createDataFrame(rows, "score double, label int")
    mapping = isotonic_fit(df).orderBy("score_from").toPandas()
    want = _pav_python(rows)
    assert mapping["score_from"].tolist() == pytest.approx(
        [s for s, _ in want]
    )
    assert mapping["calibrated"].tolist() == pytest.approx(
        [round(v, 9) for _, v in want], abs=1e-9
    )
    # strictly increasing calibrated values (PAV invariant)
    assert (mapping["calibrated"].diff().dropna() > 0).all()
    applied = isotonic_apply(
        df, spark.createDataFrame(mapping), out_col="cal"
    ).toPandas()
    # exactness of the binary-search lookup vs a python step lookup
    import bisect

    ts = [s for s, _ in want]
    vs = [v for _, v in want]
    for s, c in zip(applied["score"], applied["cal"]):
        i = bisect.bisect_right(ts, s) - 1
        assert c == pytest.approx(round(vs[max(i, 0)], 9), abs=1e-9), s
    # out-of-range + NULL behavior
    extra = spark.createDataFrame(
        [(-5.0,), (99.0,), (None,)], "score double"
    )
    got = isotonic_apply(
        extra, spark.createDataFrame(mapping), out_col="cal"
    ).toPandas()
    assert got["cal"][0] == pytest.approx(round(vs[0], 9))
    assert got["cal"][1] == pytest.approx(round(vs[-1], 9))
    assert pd.isna(got["cal"][2])


def test_calibration_improves_ece(spark):
    from graphrole_spark.functions.calibration import (
        isotonic_apply,
        isotonic_fit,
        platt_apply,
        platt_fit,
    )

    rows = _miscalibrated(seed=29)
    df = spark.createDataFrame(rows, "score double, label int")
    raw = _ece([(s, y) for s, y in rows])
    a, b = platt_fit(df)
    pl = platt_apply(df, a, b).toPandas()
    ece_platt = _ece(list(zip(pl["calibrated"], pl["label"])))
    iso = isotonic_apply(df, isotonic_fit(df)).toPandas()
    ece_iso = _ece(list(zip(iso["calibrated"], iso["label"])))
    assert ece_platt < 0.5 * raw
    assert ece_iso < 0.5 * raw


def test_calibration_validation(spark):
    from graphrole_spark.functions.calibration import (
        isotonic_apply,
        isotonic_fit,
        platt_fit,
    )

    empty = spark.createDataFrame([], "score double, label int")
    with pytest.raises(ValueError):
        platt_fit(empty)
    with pytest.raises(ValueError):
        isotonic_fit(empty)
    many = spark.range(300).select(
        (pytest.importorskip("pyspark.sql.functions").rand(5)).alias("score"),
        (pytest.importorskip("pyspark.sql.functions").lit(1)).alias("label"),
    )
    with pytest.raises(ValueError):
        isotonic_fit(many, max_distinct=100)
    mapping = spark.createDataFrame([], "score_from double, calibrated double")
    with pytest.raises(ValueError):
        isotonic_apply(empty, mapping)


def test_conformal_interval_python_parity_and_coverage(spark):
    """Split-conformal: exact k-th-order-statistic parity vs python,
    empirical coverage >= 1 - alpha on an exchangeable holdout, and
    unknown-group NULL contract."""
    import math as _math

    from graphrole_spark.functions.calibration import conformal_interval

    rng = random.Random(47)
    def mk(n, grp):
        rows = []
        for i in range(n):
            pred = rng.uniform(0, 10)
            noise = rng.gauss(0, 1.0 if grp == "a" else 3.0)
            rows.append((grp, round(pred, 4), round(pred + noise, 4)))
        return rows

    cal = mk(400, "a") + mk(400, "b")
    test = mk(600, "a") + mk(600, "b")
    cal_df = spark.createDataFrame(cal, "g string, prediction double, label double")
    test_df = spark.createDataFrame(test, "g string, prediction double, label double")
    out = conformal_interval(
        cal_df, test_df, alpha=0.1, group_cols=["g"]
    ).toPandas()
    # python oracle: k-th order statistic per group
    for grp in ("a", "b"):
        res = sorted(abs(l - p) for g, p, l in cal if g == grp)
        n = len(res)
        k = min(_math.ceil((n + 1) * 0.9), n)
        want_q = res[k - 1]
        got_q = out[out["g"] == grp]["conf_q"].iloc[0]
        assert got_q == pytest.approx(want_q, abs=1e-9), grp
    # marginal coverage per group >= ~0.9 (finite-sample guarantee)
    for grp in ("a", "b"):
        sub = out[out["g"] == grp]
        cov = ((sub["label"] >= sub["conf_lo"])
               & (sub["label"] <= sub["conf_hi"])).mean()
        # the 1-alpha guarantee is in expectation over BOTH samples;
        # one 600-draw split can dip a few points below 0.9
        assert cov >= 0.85, (grp, cov)
    # group b (noisier) gets the wider interval
    qa = out[out["g"] == "a"]["conf_q"].iloc[0]
    qb = out[out["g"] == "b"]["conf_q"].iloc[0]
    assert qb > qa
    # unknown group: NULL bounds, surfaced not faked
    unk = spark.createDataFrame(
        [("zz", 5.0, 5.0)], "g string, prediction double, label double"
    )
    got = conformal_interval(cal_df, unk, group_cols=["g"]).toPandas()
    assert pd.isna(got["conf_q"][0]) and pd.isna(got["conf_lo"][0])
    with pytest.raises(ValueError):
        conformal_interval(cal_df, test_df, alpha=0.0)
