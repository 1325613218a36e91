"""Golden + invariant tests for NMF, quantization, MDL and RolX.

Ported from reference: tests/test_roles/{test_factor,test_description_length,
test_extract}.py. sklearn/scipy are absent in this environment, so the
invariants (shapes, non-negativity, unique-value caps, MDL picking 2
roles on the seeded 20x30 matrix) are the parity contract.
"""

import numpy as np
import pandas as pd
import pytest

from graphrole_spark.oracle.mdl import encoding_cost, error_cost
from graphrole_spark.oracle.nmf import nmf
from graphrole_spark.oracle.quantize import encode, kmeans_1d_histogram
from graphrole_spark.oracle.rolx import RolxOracle


@pytest.fixture(scope="module")
def rand20x30():
    rng = np.random.RandomState(0)
    return rng.rand(20, 30)


@pytest.fixture(scope="module")
def features(rand20x30):
    return pd.DataFrame(
        rand20x30,
        columns=[f"feature{i+1}" for i in range(30)],
        index=range(20),
    )


def test_nmf_shapes_nonneg(rand20x30):
    for k in range(2, 8):
        G, F = nmf(rand20x30, k)
        assert G.shape == (20, k)
        assert F.shape == (k, 30)
        assert (G >= 0).all() and (F >= 0).all()


def test_nmf_reconstruction_quality(rand20x30):
    # sanity: rank-8 factorization explains most of the variance
    G, F = nmf(rand20x30, 8)
    rel = np.linalg.norm(rand20x30 - G @ F) / np.linalg.norm(rand20x30)
    assert rel < 0.35


def test_encode_unique_cap(rand20x30):
    for n_bins in range(1, 8):
        enc = encode(rand20x30, n_bins)
        assert len(np.unique(enc)) <= n_bins
        assert enc.shape == rand20x30.shape


def test_encode_raises_when_overbinned():
    X = np.arange(6, dtype=float).reshape(2, 3)
    with pytest.raises(ValueError):
        encode(X, 7)


def test_kmeans_1d_optimality_small():
    # three obvious clusters
    uniq = np.array([0.0, 0.1, 5.0, 5.1, 10.0])
    counts = np.array([1, 1, 1, 1, 1])
    centroids, labels = kmeans_1d_histogram(uniq, counts, 3)
    assert labels.tolist() == [0, 0, 1, 1, 2]
    np.testing.assert_allclose(centroids[:2], 0.05)
    np.testing.assert_allclose(centroids[2:4], 5.05)
    np.testing.assert_allclose(centroids[4], 10.0)


def test_encoding_cost_golden():
    # reference: tests/test_roles/test_description_length.py:17-24
    G = np.array([[1, 2, 3], [1, 2, 4]])
    F = np.array([[1, 2, 3], [4, 5, 5]])
    assert encoding_cost(G, F) == 3 * (G.size + F.size)


def test_error_cost_properties(rand20x30):
    rng = np.random.RandomState(1)
    approx = np.abs(rand20x30 - rng.randn(*rand20x30.shape))
    assert error_cost(rand20x30, approx) > 0
    assert error_cost(rand20x30, rand20x30) == 0


def test_extract_role_factors_fixed_roles(features):
    for n_roles in range(2, 6):
        ext = RolxOracle(n_roles=n_roles)
        ext.extract_role_factors(features)
        assert ext.node_role_factor.shape == (20, n_roles)
        assert ext.role_feature_factor.shape == (n_roles, 30)
        assert set(ext.node_role_factor.columns) == {
            f"role_{i}" for i in range(n_roles)
        }
        assert set(ext.role_feature_factor.columns) == set(features.columns)


def test_roles_and_percentage(features):
    ext = RolxOracle()
    assert ext.roles is None and ext.role_percentage is None
    ext = RolxOracle(n_roles=3)
    ext.extract_role_factors(features)
    roles = ext.roles
    assert set(roles.keys()) == set(features.index)
    assert set(roles.values()).issubset({"role_0", "role_1", "role_2"})
    pct = ext.role_percentage
    np.testing.assert_allclose(pct.sum(axis=1).values, 1.0)


def test_model_selection_picks_two_roles(features):
    # reference: tests/test_roles/test_extract.py:81-88
    ext = RolxOracle(n_role_range=(2, 5), n_bit_range=(2, 5))
    G, F = ext.select_model(features)
    assert G.shape[1] == F.shape[0]
    assert G.shape[1] == 2


def test_encoded_factors_grid(features):
    min_shape = min(features.shape)
    for n_roles in range(2, 4):
        total = n_roles * min_shape
        for n_bits in range(1, 6):
            if 2**n_bits <= total:
                G, F = RolxOracle.encoded_factors(features.values, n_roles, n_bits)
                assert G.shape == (20, n_roles)
                assert F.shape == (n_roles, 30)
                assert len(np.unique(G)) <= 2**n_bits
                assert len(np.unique(F)) <= 2**n_bits
            else:
                with pytest.raises(ValueError):
                    RolxOracle.encoded_factors(features.values, n_roles, n_bits)


def test_rescale_costs():
    rng = np.random.RandomState(0)
    costs = np.full((3, 3), np.nan)
    costs[1, 1] = rng.rand()
    costs[2, :] = rng.rand(3)
    rescaled = RolxOracle.rescale_costs(costs)
    assert np.isnan(rescaled[0, :]).all()
    assert np.isnan(rescaled[1, 0]) and np.isnan(rescaled[1, 2])
    assert rescaled[1, 1] == pytest.approx(1.0)
    assert np.linalg.norm(rescaled[2, :]) == pytest.approx(1.0)


def test_explain_not_implemented():
    with pytest.raises(NotImplementedError):
        RolxOracle().explain()
