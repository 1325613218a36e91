"""Tests for operators/normalize.py::{rank_normalize,inv_normal_cdf} —
python-oracle parity on the interpolation math, stdlib inverse-normal
parity, and distribution-shape properties."""

import random
import statistics

import pandas as pd
import pytest

from pyspark.sql import functions as F


def test_inv_normal_cdf_matches_stdlib(spark):
    from graphrole_spark.operators.normalize import inv_normal_cdf

    ps = [0.0005, 0.001, 0.01, 0.02425, 0.05, 0.2, 0.5, 0.77, 0.97575,
          0.999, 0.9999]
    df = spark.createDataFrame([(p,) for p in ps], "p double")
    got = [
        r[0]
        for r in df.select(inv_normal_cdf(F.col("p"))).collect()
    ]
    nd = statistics.NormalDist()
    for p, g in zip(ps, got):
        assert g == pytest.approx(nd.inv_cdf(p), abs=5e-8), p


def _python_rank(cuts, bins, v):
    """Reference for the shipped semantics: the SAME slog-warped
    uniform CDF grid the operator broadcasts, interpolated in python."""
    from graphrole_spark.operators.normalize import (
        _slog,
        _uniform_cdf_grid,
    )

    eps = 1.0 / (2 * bins)
    gp = max(1024, 4 * bins)
    ucuts = [_slog(c) for c in cuts]
    grid = _uniform_cdf_grid(ucuts, gp)
    lo, hi = ucuts[0], ucuts[-1]
    step = (hi - lo) / gp
    pos = min(max((_slog(v) - lo) / step, 0.0), gp - 1e-9)
    j = int(pos)
    frac = pos - j
    cdf = grid[j] + frac * (grid[j + 1] - grid[j])
    return min(max(cdf, eps), 1 - eps)


def test_rank_normalize_python_parity(spark):
    from graphrole_spark.operators.normalize import rank_normalize

    rng = random.Random(7)
    vals = [round(rng.lognormvariate(0, 1.2), 6) for _ in range(500)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i long, x double")
    bins = 64
    out = rank_normalize(df, ["x"], bins=bins).orderBy("i").toPandas()
    # re-derive the fitted cutpoints exactly as the operator does
    cuts = df.agg(
        F.percentile_approx(
            F.col("x").cast("double"),
            F.lit([i / bins for i in range(bins + 1)]),
            F.lit(10000),
        )
    ).collect()[0][0]
    cuts = [float(c) for c in cuts]
    want = [_python_rank(cuts, bins, v) for v in vals]
    assert out["x_rank"].tolist() == pytest.approx(want, abs=1e-8)
    # monotone: sorting by value sorts by rank
    s = out.sort_values("x")
    assert (s["x_rank"].diff().dropna() >= -1e-12).all()


def test_rank_normalize_distribution_properties(spark):
    from graphrole_spark.operators.normalize import rank_normalize

    rng = random.Random(19)
    # heavy-tailed input: lognormal with outliers
    vals = [rng.lognormvariate(0, 2.0) for _ in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    cdf = rank_normalize(df, ["x"], bins=128, method="cdf").toPandas()
    # near-uniform: mean ~0.5, quartiles near 0.25/0.75
    assert cdf["x_rank"].mean() == pytest.approx(0.5, abs=0.03)
    assert cdf["x_rank"].quantile(0.25) == pytest.approx(0.25, abs=0.05)
    gauss = rank_normalize(df, ["x"], bins=128, method="gauss").toPandas()
    assert gauss["x_rank"].mean() == pytest.approx(0.0, abs=0.08)
    assert gauss["x_rank"].std() == pytest.approx(1.0, abs=0.1)
    # tails stay finite
    assert gauss["x_rank"].abs().max() < 4.0


def test_rank_normalize_nulls_constants_validation(spark):
    from graphrole_spark.operators.normalize import rank_normalize

    df = spark.createDataFrame(
        [(1, 5.0, None), (2, 5.0, 2.0), (3, 5.0, 3.0)],
        "i long, const double, x double",
    )
    out = rank_normalize(df, ["const", "x"], bins=8).orderBy("i").toPandas()
    assert out["const_rank"].tolist() == [0.5, 0.5, 0.5]
    assert pd.isna(out["x_rank"][0])
    g = rank_normalize(df, ["const"], bins=8, method="gauss").toPandas()
    assert g["const_rank"].tolist() == [0.0, 0.0, 0.0]
    for bad in (dict(method="zscore"), dict(bins=1)):
        with pytest.raises(ValueError):
            rank_normalize(df, ["x"], **bad)
