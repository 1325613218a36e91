"""Spark RoleExtractor: driver path parity with oracle, distributed NMF."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphrole_spark.roles.extract import RoleExtractor
from graphrole_spark.roles.nmf_dist import nmf_distributed


@pytest.fixture(scope="module")
def feature_df(spark):
    rng = np.random.RandomState(0)
    pdf = pd.DataFrame(rng.rand(20, 30), columns=[f"feature{i+1}" for i in range(30)])
    pdf.insert(0, "node", [str(i) for i in range(20)])
    return spark.createDataFrame(pdf)


def test_driver_path_roles(spark, feature_df):
    ext = RoleExtractor(n_roles=3)
    ext.extract_role_factors(feature_df)
    g = ext.node_role_factor.toPandas().set_index("node")
    assert g.shape == (20, 3)
    assert (g.values >= 0).all()

    roles = ext.roles.toPandas()
    assert set(roles["role"]).issubset({"role_0", "role_1", "role_2"})
    pct = ext.role_percentage.toPandas().set_index("node")
    np.testing.assert_allclose(pct.sum(axis=1).values, 1.0)

    expl = ext.explain(top_k=4)
    assert set(expl) == {"role_0", "role_1", "role_2"}
    for feats in expl.values():
        assert 1 <= len(feats) <= 4
        names = [f for f, _ in feats]
        assert set(names) <= {f"feature{i+1}" for i in range(30)}
        weights = [w for _, w in feats]
        assert weights == sorted(weights, reverse=True)
        assert all(0 <= w <= 1 for w in weights)


def test_mdl_selection_driver(spark, feature_df):
    ext = RoleExtractor(n_role_range=(2, 5), n_bit_range=(2, 5))
    ext.extract_role_factors(feature_df)
    # same data/grid as the reference golden: MDL selects 2 roles
    assert len(ext._role_cols) == 2


def test_roles_none_before_extraction():
    ext = RoleExtractor()
    assert ext.roles is None
    assert ext.role_percentage is None
    # explain is implemented here (the reference stubs it) but needs a fit
    with pytest.raises(ValueError):
        ext.explain()


def test_distributed_nmf_reconstructs(spark):
    rng = np.random.RandomState(3)
    n, m, k = 300, 8, 3
    W = rng.rand(n, k)
    H = rng.rand(k, m)
    V = W @ H
    pdf = pd.DataFrame(V, columns=[f"f{i}" for i in range(m)])
    pdf.insert(0, "node", [f"e{i}" for i in range(n)])
    df = spark.createDataFrame(pdf)

    G_df, F_mat = nmf_distributed(df, [f"f{i}" for i in range(m)], k, max_iter=20)
    g = G_df.toPandas().set_index("node").loc[[f"e{i}" for i in range(n)]]
    approx = g.to_numpy() @ F_mat
    rel = np.linalg.norm(V - approx) / np.linalg.norm(V)
    assert (g.to_numpy() >= 0).all()
    assert rel < 0.05


def test_distributed_quantized_roles(spark, feature_df):
    ext = RoleExtractor(n_roles=3, driver_max_rows=5)  # force distributed path
    ext.extract_role_factors(feature_df)
    g = ext.node_role_factor.toPandas().set_index("node")
    assert g.shape == (20, 3)
    # quantized: limited distinct values across the factor
    distinct = len(np.unique(np.round(g.values, 9)))
    assert distinct <= 2 ** 6  # n_bins cap from the bit heuristic
    roles = ext.roles.toPandas()
    assert set(roles["role"]).issubset({"role_0", "role_1", "role_2"})
