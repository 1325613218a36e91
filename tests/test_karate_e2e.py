"""End-to-end smoke on the Zachary karate-club graph.

Mirrors the reference's example workflow (reference: examples/example.py:30-46):
extraction terminates, all nodes get features, roles are assigned.
Edge list: Zachary (1977), standard 34-node unweighted rendering.
"""

import numpy as np

from graphrole_spark.operators.recursion import RecursiveFeatureExtractor
from graphrole_spark.roles.extract import RoleExtractor

KARATE_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
    (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31),
    (1, 2), (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30),
    (2, 3), (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32),
    (3, 7), (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16),
    (6, 16), (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
    (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
    (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
    (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
    (31, 33), (32, 33),
]


def test_karate_end_to_end(spark):
    edges = spark.createDataFrame(
        [(str(u), str(v), 1.0) for u, v in KARATE_EDGES],
        "src string, dst string, weight double",
    )
    rfe = RecursiveFeatureExtractor(edges)
    feats = rfe.extract_features()
    pdf = feats.toPandas().set_index("node")
    assert len(pdf) == 34
    assert pdf.notna().all().all()
    assert rfe.generation_count >= 1  # recursion actually recursed

    ext = RoleExtractor(n_role_range=(2, 4), n_bit_range=(1, 4))
    ext.extract_role_factors(feats)
    roles = ext.roles.toPandas()
    assert len(roles) == 34
    assert roles["role"].nunique() >= 2
    # the two hubs (0 and 33) play the same structural role
    r = roles.set_index("node")["role"]
    assert r["0"] == r["33"]
    pct = ext.role_percentage.toPandas().set_index("node")
    np.testing.assert_allclose(pct.sum(axis=1), 1.0)
