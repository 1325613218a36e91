"""feature_relevance (operators/relevance.py): numpy contingency
oracle for MI/chi2, moment-exact Pearson, signal-vs-noise ordering."""

import math
import random

import pytest

from graphrole_spark.operators.relevance import feature_relevance


def _mk(seed=7, n=400):
    """signal: monotone in label; vshape: |x| of a signed driver —
    non-monotone (Pearson ~0, MI high); noise: independent;
    const: constant; sparse: mostly NULL."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        y = rng.randint(0, 1)
        signal = y * 2.0 + rng.random()
        # symmetric around 0 for BOTH classes, class-dependent spread:
        # linear correlation ~0, but the binned distribution differs
        vshape = (rng.random() - 0.5) * (1 if y else 3)
        noise = rng.random()
        sparse = rng.random() if i % 7 == 0 else None
        rows.append((float(y), signal, vshape, noise, 1.5, sparse))
    return rows


SCHEMA = (
    "label double, signal double, vshape double, noise double,"
    " const double, sparse double"
)
FEATS = ["signal", "vshape", "noise", "const", "sparse"]


def _oracle(rows, col_idx, bins=10):
    pairs = [
        (r[col_idx], str(r[0])) for r in rows if r[col_idx] is not None
    ]
    if not pairs:
        return dict(mi=None, chi2=None, n=0)
    vs = [v for v, _ in pairs]
    lo, hi = min(vs), max(vs)
    cont = {}
    for v, y in pairs:
        b = (
            0
            if hi == lo
            else min(bins - 1, int(math.floor((v - lo) / (hi - lo) * bins)))
        )
        cont[(b, y)] = cont.get((b, y), 0) + 1
    n = len(pairs)
    nx = {}
    ny = {}
    for (b, y), c in cont.items():
        nx[b] = nx.get(b, 0) + c
        ny[y] = ny.get(y, 0) + c
    mi = sum(
        (c / n) * math.log(c * n / (nx[b] * ny[y]))
        for (b, y), c in cont.items()
    )
    chi2 = sum(
        (cont.get((b, y), 0) - nx[b] * ny[y] / n) ** 2 / (nx[b] * ny[y] / n)
        for b in nx
        for y in ny
    )
    return dict(mi=max(mi, 0.0), chi2=chi2, n=n)


def test_relevance_python_oracle_parity(spark):
    import numpy as np

    rows = _mk()
    df = spark.createDataFrame(rows, schema=SCHEMA)
    got = {
        r["feature"]: r
        for r in feature_relevance(df, FEATS, "label", bins=10).collect()
    }
    for i, c in enumerate(FEATS, start=1):
        want = _oracle(rows, i)
        assert got[c]["n"] == want["n"], c
        assert got[c]["mi"] == pytest.approx(want["mi"]), c
        assert got[c]["chi2"] == pytest.approx(want["chi2"]), c
        # Pearson vs numpy over the non-null pairs
        pairs = [(r[i], r[0]) for r in rows if r[i] is not None]
        xs = np.array([p[0] for p in pairs])
        ys = np.array([p[1] for p in pairs])
        if xs.std() > 0 and ys.std() > 0:
            assert got[c]["pearson"] == pytest.approx(
                float(np.corrcoef(xs, ys)[0, 1]), abs=1e-9
            ), c
        else:
            assert got[c]["pearson"] is None, c


def test_relevance_signal_ordering_and_degenerates(spark):
    rows = _mk(seed=11)
    df = spark.createDataFrame(rows, schema=SCHEMA)
    got = {
        r["feature"]: r for r in feature_relevance(df, FEATS, "label").collect()
    }
    # informative features dominate noise; constant carries nothing
    assert got["signal"]["mi"] > got["noise"]["mi"]
    assert got["vshape"]["mi"] > got["noise"]["mi"]
    assert got["const"]["mi"] == pytest.approx(0.0)
    assert got["const"]["chi2"] == pytest.approx(0.0)
    assert got["const"]["pearson"] is None
    # vshape is non-monotone: MI sees it, Pearson barely does
    assert abs(got["vshape"]["pearson"]) < 0.45
    assert got["signal"]["pearson"] > 0.8
    # the perfectly separable feature saturates toward label entropy
    ys = [r[0] for r in rows]
    p1 = sum(ys) / len(ys)
    h = -(p1 * math.log(p1) + (1 - p1) * math.log(1 - p1))
    assert got["signal"]["mi"] <= h + 1e-9
    assert got["signal"]["mi"] > 0.5 * h


def test_relevance_all_null_feature_row_survives(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0, None), (0.0, 2.0, None)],
        schema="label double, x double, dead double",
    )
    got = {
        r["feature"]: r
        for r in feature_relevance(df, ["x", "dead"], "label").collect()
    }
    assert got["dead"]["n"] == 0
    assert got["dead"]["mi"] is None and got["dead"]["pearson"] is None


def test_relevance_rejects_bad_args(spark):
    df = spark.createDataFrame([(1.0, 1.0)], schema="label double, x double")
    with pytest.raises(ValueError):
        feature_relevance(df, [], "label")
    with pytest.raises(ValueError):
        feature_relevance(df, ["x"], "label", bins=1)
