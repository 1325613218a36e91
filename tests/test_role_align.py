"""Tests for roles/align.py — permutation recovery, unmatched-role
handling, and the relabel projection."""

import numpy as np
import pandas as pd
import pytest


def _factor(rows, feats, seed=3):
    rng = np.random.default_rng(seed)
    M = rng.uniform(0.1, 2.0, size=(rows, len(feats)))
    return pd.DataFrame(
        M, index=[f"role_{i}" for i in range(rows)], columns=feats
    )


def test_align_recovers_permutation_under_scaling_and_noise():
    from graphrole_spark.roles.align import align_roles

    feats = [f"f{i}" for i in range(12)]
    A = _factor(4, feats)
    perm = [2, 0, 3, 1]
    rng = np.random.default_rng(9)
    B = A.iloc[perm].copy()
    # NMF scale ambiguity + mild noise must not break the match
    B = B.mul([0.5, 3.0, 1.7, 0.2], axis=0)
    B += rng.normal(0, 0.01, B.shape)
    B.index = [f"role_{i}" for i in range(4)]
    m = align_roles(A, B).set_index("role_b")
    for bi, aj in enumerate(perm):
        assert m.loc[f"role_{bi}", "role_a"] == f"role_{aj}"
        assert m.loc[f"role_{bi}", "similarity"] > 0.99
    assert (m["matched"] == 1).all()


def test_align_unmatched_and_threshold():
    from graphrole_spark.roles.align import align_roles

    feats = [f"f{i}" for i in range(10)]
    A = _factor(2, feats, seed=1)
    B = _factor(3, feats, seed=2)
    B.iloc[0] = A.iloc[1] * 2.0  # strong partner for B0
    m = align_roles(A, B).set_index("role_b")
    assert m.loc["role_0", "role_a"] == "role_1"
    # only 2 A-roles exist: exactly one B role stays unmatched
    assert (m["matched"] == 0).sum() == 1
    un = m[m["matched"] == 0].iloc[0]
    assert un["role_a"] is None
    # a high threshold rejects weak matches
    strict = align_roles(A, B, min_similarity=0.999).set_index("role_b")
    assert strict.loc["role_0", "matched"] == 1
    assert strict["matched"].sum() <= 2
    with pytest.raises(ValueError):
        align_roles(A, B[[]])


def test_relabel_assignments(spark):
    from graphrole_spark.roles.align import align_roles, relabel_assignments

    feats = [f"f{i}" for i in range(8)]
    A = _factor(2, feats, seed=5)
    B = pd.DataFrame(
        np.vstack([A.iloc[1].to_numpy(), A.iloc[0].to_numpy(),
                   np.ones(len(feats))]),
        index=["role_0", "role_1", "role_2"],
        columns=feats,
    )
    mapping = align_roles(A, B, min_similarity=0.95)
    roles = spark.createDataFrame(
        [("n1", "role_0"), ("n2", "role_1"), ("n3", "role_2")],
        "node string, role string",
    )
    got = dict(
        (r["node"], r["role"])
        for r in relabel_assignments(roles, mapping).collect()
    )
    assert got["n1"] == "role_1"  # B0 == A1
    assert got["n2"] == "role_0"  # B1 == A0
    assert got["n3"].startswith("new:")  # the ones-vector stranger
