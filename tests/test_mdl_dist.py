"""Distributed MDL costs must equal the numpy oracle on the same model."""

import numpy as np
import pandas as pd

from graphrole_spark.oracle.mdl import encoding_cost, error_cost
from graphrole_spark.roles.mdl_dist import description_length_distributed


def test_distributed_costs_match_oracle(spark):
    rng = np.random.RandomState(7)
    n, m, k = 200, 6, 3
    V = rng.rand(n, m)
    V[rng.rand(n, m) < 0.1] = 0.0  # exercise the zero-cell rule
    G_enc = np.round(rng.rand(n, k), 1)  # quantized-looking factors
    F_enc = np.round(rng.rand(k, m), 1)

    value_cols = [f"f{i}" for i in range(m)]
    role_cols = [f"role_{i}" for i in range(k)]
    vp = pd.DataFrame(V, columns=value_cols)
    vp.insert(0, "node", [f"e{i}" for i in range(n)])
    gp = pd.DataFrame(G_enc, columns=role_cols)
    gp.insert(0, "node", [f"e{i}" for i in range(n)])

    feats = spark.createDataFrame(vp)
    g_df = spark.createDataFrame(gp)

    enc, err = description_length_distributed(
        feats, value_cols, g_df, role_cols, F_enc
    )
    assert enc == encoding_cost(G_enc, F_enc)
    np.testing.assert_allclose(err, error_cost(V, G_enc @ F_enc), rtol=1e-9)


def test_role_extractor_description_length(spark):
    from graphrole_spark.roles.extract import RoleExtractor

    rng = np.random.RandomState(0)
    pdf = pd.DataFrame(rng.rand(30, 8), columns=[f"f{i}" for i in range(8)])
    pdf.insert(0, "node", [str(i) for i in range(30)])
    feats = spark.createDataFrame(pdf)
    ext = RoleExtractor(n_roles=2)
    ext.extract_role_factors(feats)
    enc, err = ext.description_length(feats)
    assert enc > 0 and np.isfinite(err)
